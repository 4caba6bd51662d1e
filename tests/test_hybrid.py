"""Hybrid GNS->NR solver (eval/hybrid.py, nr_batched warm_start)."""

import numpy as np
import pytest

from gns_tpu.eval.nr_batched import solve_batched
from gns_tpu.utils.augment import generate_cases


def _feasible_cases(case_nr, n, seed=31415):
    return list(generate_cases(case_nr, n, seed=seed, feasible_only=True))[1:]


def test_warm_start_from_solution_converges_immediately():
    """Seeding the solve with its own fixed point must converge in ~0
    iterations and return the same solution — the warm-start plumbing
    (PQ-magnitude / PV+PQ-angle overrides) changes the start, never the
    root."""
    cases = _feasible_cases(14, 8)
    flat = solve_batched(cases, tol=3e-5)
    assert flat["converged"].all()
    warm = solve_batched(
        cases, tol=3e-5,
        warm_start=(flat["v"], np.deg2rad(flat["theta_deg"])),
    )
    assert warm["converged"].all()
    assert warm["iterations"] <= 1
    np.testing.assert_allclose(warm["v"], flat["v"], atol=2e-5)
    np.testing.assert_allclose(
        warm["theta_deg"], flat["theta_deg"], atol=2e-3
    )
    # pinned quantities: the slack angle stays at the case's (input) Va
    for i, c in enumerate(cases):
        slack = int(np.flatnonzero(c["bus"][:, 1] == 3)[0])
        assert abs(warm["theta_deg"][i, slack] - c["bus"][slack, 8]) < 1e-6


def test_warm_start_near_solution_converges_no_slower():
    """A perturbed-solution start must converge to the same fixed point in
    no more iterations than the flat start."""
    cases = _feasible_cases(30, 4)
    flat = solve_batched(cases, tol=3e-5)
    assert flat["converged"].all()
    rng = np.random.default_rng(0)
    near_v = flat["v"] + 0.01 * rng.standard_normal(flat["v"].shape).astype(
        np.float32
    )
    near_th = np.deg2rad(flat["theta_deg"]) + 0.01 * rng.standard_normal(
        flat["v"].shape
    ).astype(np.float32)
    warm = solve_batched(cases, tol=3e-5, warm_start=(near_v, near_th))
    assert warm["converged"].all()
    assert warm["iterations"] <= flat["iterations"]
    np.testing.assert_allclose(warm["v"], flat["v"], atol=5e-4)


def test_bad_warm_start_falls_back_to_flat():
    """Newton is only locally convergent: a junk warm start can diverge on
    grids the flat start solves (measured on perturbed case30).
    hybrid_solve's fallback_flat re-solves those grids so the hybrid is
    never less robust than plain NR. Exercised here via solve_batched
    directly: junk warm fails, flat succeeds on the same grids."""
    cases = _feasible_cases(30, 4)
    rng = np.random.default_rng(0)
    n = cases[0]["bus"].shape[0]
    junk_v = 1.0 + 0.02 * rng.standard_normal((len(cases), n)).astype(np.float32)
    junk_th = 0.1 * rng.standard_normal((len(cases), n)).astype(np.float32)
    warm = solve_batched(cases, tol=3e-5, warm_start=(junk_v, junk_th))
    flat = solve_batched(cases, tol=3e-5)
    assert flat["converged"].all()
    if warm["converged"].all():
        # acceptable on other platforms/precisions; nothing to fall back
        return
    # splice logic mirror: flat rescues every warm failure
    bad = np.flatnonzero(~warm["converged"])
    assert flat["converged"][bad].all()


def test_solve_mixed_groups_heterogeneous_topologies():
    """solve_mixed: a shuffled mix of case9/case14/case30 grids solves in
    per-topology groups and reassembles in request order, equal to the
    homogeneous per-case solves."""
    from gns_tpu.eval.nr_batched import solve_mixed

    c9 = _feasible_cases(9, 3, seed=1)
    c14 = _feasible_cases(14, 3, seed=2)
    c30 = _feasible_cases(30, 3, seed=3)
    mixed = [c9[0], c30[0], c14[0], c14[1], c9[1], c30[1], c14[2],
             c9[2], c30[2]]
    out = solve_mixed(mixed)
    assert out["n_groups"] == 3
    assert out["converged"].all()
    assert out["v"].shape == (9, 30)
    ref9 = solve_batched(c9)
    ref30 = solve_batched(c30)
    np.testing.assert_allclose(out["v"][0, :9], ref9["v"][0], atol=1e-6)
    np.testing.assert_allclose(out["v"][5, :30], ref30["v"][1], atol=1e-6)
    assert np.isnan(out["v"][0, 9:]).all()  # padding beyond case9's buses
    assert out["n_bus"].tolist() == [9, 30, 14, 14, 9, 30, 14, 9, 30]
    # method="fdpf" (round 4b, routed through solve_ac per group with
    # the Newton fallback): same fixed points, same group structure
    fd = solve_mixed(mixed, method="fdpf")
    assert fd["converged"].all() and fd["n_groups"] == 3
    np.testing.assert_allclose(fd["v"][0, :9], ref9["v"][0], atol=5e-5)


def test_device_assembly_matches_host_complex_path():
    """_assemble_gb (real-arithmetic, on-device, scatter via static
    endpoint indices) must reproduce the host complex128 Ybus of
    build_nr_batch_stacked to f32 rounding — across taps, phase shifts,
    line charging, shunts and out-of-service branches."""
    import jax.numpy as jnp

    from gns_tpu.eval.nr_batched import (
        _assemble_gb,
        build_nr_batch_stacked,
        stack_cases,
    )
    from gns_tpu.utils.augment import generate_cases

    cases = list(generate_cases(30, 5, seed=77))[1:]
    # exercise a phase shift and an out-of-service branch explicitly
    for c in cases:
        c["branch"] = np.asarray(c["branch"], float).copy()
    cases[0]["branch"][3, 9] = 7.5   # shift degrees
    cases[1]["branch"][5, 10] = 0.0  # status off
    bus, branch, gen, base = stack_cases(cases)
    nb = build_nr_batch_stacked(bus, branch, gen, base)
    f = branch[0, :, 0].astype(np.int32) - 1
    t = branch[0, :, 1].astype(np.int32) - 1
    g, b = _assemble_gb(
        jnp.asarray(bus, jnp.float32), jnp.asarray(branch, jnp.float32),
        jnp.asarray(base, jnp.float32), jnp.asarray(f), jnp.asarray(t),
        has_status=True,
    )
    np.testing.assert_allclose(np.asarray(g), nb.gmat, rtol=2e-5, atol=2e-4)
    np.testing.assert_allclose(np.asarray(b), nb.bmat, rtol=2e-5, atol=2e-4)


def test_stall_gate_converges_stiff_case118():
    """The authentic IEEE case118's stiff 345 kV branches (|y| ~ 250
    p.u.) put the float32 mismatch floor near/above tol=3e-5 for some
    draws; the stalled-at-floor gate must accept those grids at their
    attainable iterate instead of spinning the whole batch to max_iter —
    and the accepted iterate must still match the float64 oracle."""
    from gns_tpu.eval.newton_raphson import newton_raphson_pf

    cases = _feasible_cases(118, 32)
    out = solve_batched(cases, tol=3e-5)
    assert out["converged"].all()
    assert out["iterations"] < 10  # was 20 (max_iter) before the gate
    r = newton_raphson_pf(cases[0])
    np.testing.assert_allclose(out["v"][0], r.vm, atol=2e-5)


def test_compaction_matches_lockstep():
    """compact_after (per-grid convergence exit) must reach the same
    fixed points and convergence flags as the pure lock-step solve — the
    stragglers continue from their current iterates, so the root is
    unchanged; only the batch shape of the tail iterations differs."""
    cases = _feasible_cases(30, 12)
    lock = solve_batched(cases, tol=3e-5)
    comp = solve_batched(cases, tol=3e-5, compact_after=3)
    assert lock["converged"].all() and comp["converged"].all()
    np.testing.assert_allclose(comp["v"], lock["v"], atol=2e-5)
    np.testing.assert_allclose(comp["theta_deg"], lock["theta_deg"],
                               atol=2e-3)
    # per-grid counts: early finishers recorded below the lock-step gate
    assert comp["iterations_per_grid"].min() <= lock["iterations"]
    assert (comp["iterations_per_grid"] <= comp["iterations"]).all()


def test_hybrid_solve_end_to_end():
    from gns_tpu.eval.hybrid import hybrid_solve
    from gns_tpu.models.pretrained import available_cases, load_pretrained

    if "14-sup" not in available_cases():
        pytest.skip("14-sup checkpoint not shipped")
    params, cfg = load_pretrained("14-sup")
    cases = _feasible_cases(14, 8)
    out = hybrid_solve(params, cfg, cases, return_prediction=True)
    flat = solve_batched(cases, tol=3e-5)
    assert out["converged"].all()
    assert out["iterations"] <= flat["iterations"]
    np.testing.assert_allclose(out["v"], flat["v"], atol=5e-4)
    assert out["gns_v"].shape == out["v"].shape


def test_fused_hybrid_matches_two_dispatch_pipeline():
    """The fused single-program hybrid (in-device grid prep + forward +
    gauge decode + seeding + Newton) must produce the same prediction and
    the same solved fixed point as the round-2 two-dispatch pipeline
    (GNSPredictor -> host decode -> solve_batched warm_start)."""
    from gns_tpu.eval.hybrid import hybrid_solve
    from gns_tpu.models.pretrained import available_cases, load_pretrained

    if "14-sup" not in available_cases():
        pytest.skip("14-sup checkpoint not shipped")
    params, cfg = load_pretrained("14-sup")
    cases = _feasible_cases(14, 6)
    fused = hybrid_solve(params, cfg, cases, return_prediction=True)
    legacy = hybrid_solve(
        params, cfg, cases, return_prediction=True, fused=False
    )
    assert fused["converged"].all() and legacy["converged"].all()
    # identical network inputs -> identical prediction (the in-device
    # prepare must reproduce utils.prepare.prepare_case bit-for-bit up to
    # f32 rounding)
    np.testing.assert_allclose(
        fused["gns_v"], legacy["gns_v"], rtol=1e-5, atol=1e-6
    )
    np.testing.assert_allclose(
        fused["gns_theta_deg"], legacy["gns_theta_deg"], atol=1e-4
    )
    np.testing.assert_allclose(fused["v"], legacy["v"], atol=2e-5)
    assert fused["iterations"] == legacy["iterations"]


def test_fused_hybrid_chunking_pads_last_chunk():
    """A case count that does not divide chunk_size must still solve every
    grid (the padded last chunk reuses the same compiled program)."""
    from gns_tpu.eval.hybrid import hybrid_solve
    from gns_tpu.models.pretrained import available_cases, load_pretrained

    if "14-sup" not in available_cases():
        pytest.skip("14-sup checkpoint not shipped")
    params, cfg = load_pretrained("14-sup")
    cases = _feasible_cases(14, 7)
    out = hybrid_solve(params, cfg, cases, chunk_size=3)
    flat = solve_batched(cases, tol=3e-5)
    assert out["v"].shape == (7, 14)
    assert len(out["iterations_per_chunk"]) == 3
    np.testing.assert_allclose(out["v"], flat["v"], atol=5e-4)
