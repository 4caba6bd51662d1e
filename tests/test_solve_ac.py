"""Unified solver surface (eval/solve.py): auto warm-start policy."""

import numpy as np
import pytest

from gns_tpu.eval.solve import solve_ac
from gns_tpu.utils.augment import generate_cases


def _cases(n=6, case=14, seed=5):
    return list(generate_cases(case, n - 1, seed=seed))


def test_auto_resolves_flat_without_params_or_prev():
    out = solve_ac(_cases())
    assert out["warm_start"] == "flat"
    assert out["converged"].all()
    assert isinstance(out["compact_after"], int)
    assert out["fallback_grids"] == 0


def test_auto_resolves_prev_and_matches_flat_fixed_point():
    cases = _cases()
    base = solve_ac(cases)
    # auto: prev wins when the caller supplies one (result dict accepted
    # directly); same fixed point, fewer or equal iterations
    warm = solve_ac(cases, prev=base)
    assert warm["warm_start"] == "prev"
    assert warm["converged"].all()
    np.testing.assert_allclose(warm["v"], base["v"], atol=5e-5)
    assert (
        warm["iterations_per_grid"] <= base["iterations_per_grid"]
    ).all()


def test_auto_resolves_gns_with_params():
    from gns_tpu.models.pretrained import available_cases, load_pretrained

    if "14-sup" not in available_cases():
        pytest.skip("14-sup checkpoint not shipped")
    params, cfg = load_pretrained("14-sup")
    cases = _cases()
    flat = solve_ac(cases)
    # under the default method (auto -> fdpf) the gns arm never pays on
    # cold starts (measured, docs/FDPF_BENCH.json) — auto resolves flat
    auto = solve_ac(cases, params=params, cfg=cfg)
    assert auto["warm_start"] == "flat" and auto["method"] == "fdpf"
    # with the Newton method the round-3 break-even policy still applies
    auto_nr = solve_ac(cases, params=params, cfg=cfg, method="nr")
    assert auto_nr["warm_start"] == "gns"
    assert auto_nr["converged"].all()
    np.testing.assert_allclose(auto_nr["v"], flat["v"], atol=5e-4)
    # the fused gns+fdpf arm remains available as an explicit override
    forced = solve_ac(cases, params=params, cfg=cfg, warm_start="gns")
    assert forced["warm_start"] == "gns" and forced["method"] == "fdpf"
    np.testing.assert_allclose(forced["v"], flat["v"], atol=5e-4)
    # prev STILL wins over gns when both are available
    both = solve_ac(cases, params=params, cfg=cfg, prev=flat)
    assert both["warm_start"] == "prev"


def test_prev_fallback_rescues_divergent_warm_start():
    """A garbage previous solution leaves Newton's basin; the flat
    fallback re-solves those grids so the warm arm is never less robust
    than plain NR."""
    cases = _cases()
    n = np.asarray(cases[0]["bus"]).shape[0]
    # near-collapsed voltage start: Newton heads for the degenerate
    # low-voltage region and never recovers (measured: 0/6 converge)
    bad_prev = (
        np.full((len(cases), n), 0.05, np.float32),
        np.zeros((len(cases), n), np.float32),
    )
    out = solve_ac(cases, prev=bad_prev, warm_start="prev")
    assert out["converged"].all()
    assert out["fallback_grids"] > 0
    flat = solve_ac(cases)
    np.testing.assert_allclose(out["v"], flat["v"], atol=5e-5)
    # fallback grids carry warm-attempt + fallback iteration counts
    assert out["iterations_per_grid"].max() > flat["iterations_per_grid"].max()


def test_validation_errors():
    cases = _cases(3)
    with pytest.raises(ValueError):
        solve_ac(cases, warm_start="gns")  # no params
    with pytest.raises(ValueError):
        solve_ac(cases, warm_start="prev")  # no prev
    with pytest.raises(ValueError):
        solve_ac(cases, warm_start="nope")
    with pytest.raises(ValueError):
        # prev shape mismatch (covers 2 grids, 3 cases)
        solve_ac(
            cases, warm_start="prev",
            prev=(np.ones((2, 14), np.float32), np.zeros((2, 14), np.float32)),
        )


def test_gns_warm_policy_is_rtt_and_size_aware(monkeypatch):
    """auto's gns arm follows the measured break-even: on a high-RTT
    relay only cases >= 100 buses pay for the fused forward
    (best-vs-best case30 0.95x vs case300 1.09x); on low-RTT hardware
    it pays from case14 up (device-time 1.047x)."""
    import gns_tpu.eval.nr_batched as nrb
    from gns_tpu.eval import solve as solve_mod

    c14 = _cases(2)
    c118 = list(generate_cases(118, 1, seed=0))
    monkeypatch.setattr(nrb, "measured_dispatch_rtt", lambda: 0.033)
    assert not solve_mod._gns_warm_pays(c14)
    assert solve_mod._gns_warm_pays(c118)
    monkeypatch.setattr(nrb, "measured_dispatch_rtt", lambda: 1e-4)
    assert solve_mod._gns_warm_pays(c14)


def test_resolve_compact_after_measures_rtt():
    from gns_tpu.eval.nr_batched import (
        measured_dispatch_rtt,
        resolve_compact_after,
    )

    rtt = measured_dispatch_rtt()
    assert rtt > 0
    assert resolve_compact_after(5) == 5
    assert resolve_compact_after(0) == 0
    # forced break-evens pin both sides of the auto rule
    assert resolve_compact_after("auto", rtt_breakeven=rtt * 2) == 3
    assert resolve_compact_after("auto", rtt_breakeven=rtt / 2) == 0


def test_method_auto_resolves_fdpf_same_fixed_point():
    """Round-4 solver policy: method="auto" resolves to the
    fast-decoupled solver (measured >= parity everywhere, up to 3.2x —
    docs/FDPF_BENCH.json), with the same fixed point as forced Newton."""
    cases = _cases()
    auto = solve_ac(cases)
    assert auto["method"] == "fdpf"
    nr = solve_ac(cases, method="nr")
    assert nr["method"] == "nr"
    assert auto["converged"].all() and nr["converged"].all()
    np.testing.assert_allclose(auto["v"], nr["v"], atol=1e-4)
    with pytest.raises(ValueError):
        solve_ac(cases, method="qr")


def test_method_fdpf_gns_arm_uses_fused_fdpf_tail():
    """The gns arm honors the method: hybrid_solve(solver='fdpf') fuses
    the fast-decoupled loop into the same program as the forward."""
    from gns_tpu.models.pretrained import available_cases, load_pretrained

    if "14-sup" not in available_cases():
        pytest.skip("14-sup checkpoint not shipped")
    params, cfg = load_pretrained("14-sup")
    cases = _cases()
    out = solve_ac(cases, params=params, cfg=cfg, warm_start="gns",
                   method="fdpf")
    assert out["method"] == "fdpf"
    assert out["converged"].all()
    nr = solve_ac(cases, method="nr")
    np.testing.assert_allclose(out["v"], nr["v"], atol=1e-4)
