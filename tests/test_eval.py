"""Eval-layer tests: NR oracle correctness, physics/oracle consistency,
and the evaluation harness metrics."""

import numpy as np
import pytest

import jax

from gns_tpu.eval.harness import compute_metrics, evaluate, run_nr_oracle
from gns_tpu.eval.newton_raphson import newton_raphson_pf
from gns_tpu.models.gns import init_gns_params
from gns_tpu.physics import local_power_imbalance
from gns_tpu.utils.augment import generate_cases
from gns_tpu.utils.cases import CASE_SIZES, load_case
from gns_tpu.utils.config import GNSConfig
from gns_tpu.utils.prepare import prepare_case
from gns_tpu.utils.schema import GEN


@pytest.mark.parametrize("case_nr", sorted(CASE_SIZES))
def test_nr_converges_base_cases(case_nr):
    res = newton_raphson_pf(load_case(case_nr))
    assert res.success
    # power balance: total injections equal zero mismatch at tolerance
    assert res.iterations <= 8


def test_nr_matches_canonical_case14():
    """IEEE 14-bus canonical solution (slack 1.06/0deg, bus2 -4.98deg...)."""
    res = newton_raphson_pf(load_case(14))
    np.testing.assert_allclose(res.vm[:3], [1.06, 1.045, 1.01], atol=1e-4)
    np.testing.assert_allclose(
        res.va_deg[:5], [0.0, -4.983, -12.725, -10.313, -8.774], atol=5e-3
    )


@pytest.mark.parametrize("case_nr", [14, 30])
def test_paper_physics_zero_residual_at_nr_solution(case_nr):
    """Feeding the NR solution into the paper-correct residual gives ~0.

    This pins the paper-mode (reference_parity=False) branch-flow equations
    to ground truth independently of the reference code: at the true power
    flow solution, every bus's active mismatch vanishes, and the reactive
    mismatch vanishes at PQ buses (PV/slack buses absorb Q into their
    generators).
    """
    case = load_case(case_nr)
    res = newton_raphson_pf(case)
    assert res.success
    # true shunts, no paper override
    buses, lines, gens = prepare_case(
        {**case, "bus": res.bus, "gen": res.gen}, paper_shunts=False
    )
    v = res.vm.astype(np.float32)
    theta = np.deg2rad(res.va_deg).astype(np.float32)
    base = case["baseMVA"]
    pg = (res.gen[:, 1] / base).astype(np.float32)
    # per-bus reactive generation from the solved gens
    n = buses.shape[0]
    qg_bus = np.zeros(n, np.float32)
    np.add.at(qg_bus, gens[:, GEN["bus_i"]].astype(int) - 1,
              (res.gen[:, 2] / base).astype(np.float32))

    dp, dq = local_power_imbalance(
        v, theta, buses, lines, gens, pg, qg_bus, reference_parity=False,
        method="scatter",
    )
    np.testing.assert_allclose(np.asarray(dp), 0.0, atol=2e-4)
    np.testing.assert_allclose(np.asarray(dq), 0.0, atol=2e-4)


def test_evaluate_harness_smoke(tmp_path):
    """End-to-end harness on a few augmented grids with a fresh model."""
    cfg = GNSConfig(K=2, latent_dim=8, hidden_dim=8)
    params = init_gns_params(jax.random.key(0), cfg)
    cases = list(generate_cases(14, 4, seed=11))
    m = evaluate(
        params, cfg, cases, method="scatter",
        plot_path=str(tmp_path / "per_bus.png"), verbose=False,
    )
    assert m["nr_converged_frac"] == 1.0
    assert np.isfinite(m["v_mse"]) and np.isfinite(m["theta_mse"])
    assert m["alf_pct_p20"] <= m["alf_pct_median"] <= m["alf_pct_p80"]
    import os

    assert os.path.exists(m["plot"])


def test_compute_metrics_identical_inputs():
    """If GNS output equals the oracle, all error metrics are ~0."""
    cases = list(generate_cases(14, 3, seed=13))
    nr = run_nr_oracle(cases)
    gns = {
        "time": nr["time"].copy(),
        "v": nr["v"].copy(),
        "theta": np.deg2rad(nr["theta_deg"]),
        "last_loss": np.zeros(len(cases), np.float32),
        "line_flow": nr["line_flow"].copy(),
    }
    m = compute_metrics(nr, gns)
    assert m["v_mse"] == 0 and m["theta_mse"] == 0
    assert m["alf_pct_median"] == 0


def test_align_slack_angle_properties():
    """Slack alignment pins the slack-bus angle to the case's known Va and
    preserves every angle difference (so flows/residuals are untouched)."""
    from gns_tpu.eval.harness import align_slack_angle
    from gns_tpu.utils.cases import load_case

    case = load_case(14)
    rng = np.random.default_rng(0)
    theta = rng.normal(size=14).astype(np.float32) + 3.0  # big offset
    out = align_slack_angle(theta, case)
    bus = np.asarray(case["bus"])
    slack = int(np.flatnonzero(bus[:, 1] == 3)[0])
    np.testing.assert_allclose(out[slack], np.deg2rad(bus[slack, 8]), atol=1e-7)
    np.testing.assert_allclose(
        out[:, None] - out[None, :], theta[:, None] - theta[None, :], atol=1e-5
    )


def test_run_gns_alignment_closes_raw_theta_metric():
    """With slack alignment the RAW reference-convention theta metric
    (GNS/evaluate.py:98-104) equals the offset-invariant centered one up to
    per-grid asymmetry — the round-1 gap (raw 1.0 vs centered 0.0015) was
    pure gauge offset."""
    from gns_tpu.eval.harness import run_gns

    params, cfg = _paper_model()
    cases = list(generate_cases(14, 4, seed=21))
    nr = run_nr_oracle(cases)
    aligned = compute_metrics(nr, run_gns(params, cfg, cases, method="scatter"))
    raw = compute_metrics(
        nr, run_gns(params, cfg, cases, method="scatter", align_slack=False)
    )
    # same model, same grids: centered metric identical, raw metric now in
    # the oracle's gauge — within 3x of centered instead of ~600x off.
    np.testing.assert_allclose(
        aligned["theta_centered_mse"], raw["theta_centered_mse"], rtol=1e-5
    )
    assert aligned["theta_mse"] <= raw["theta_mse"]
    # the headline claim: raw theta MSE in the oracle's gauge is small
    # (reference scores 0.0987 on the ACCURACY.md protocol)
    assert aligned["theta_mse"] < 0.02, aligned["theta_mse"]


def _paper_model():
    from gns_tpu.models.pretrained import load_pretrained

    params, cfg = load_pretrained("14-paper")
    return params, cfg


def test_slack_anchor_pins_gauge():
    """slack_anchor adds a theta_slack^2 term to the loss (paper mode) and
    is rejected in parity mode."""
    from gns_tpu.models.gns import gns_forward

    cfg = GNSConfig(K=2, latent_dim=8, hidden_dim=8, reference_parity=False)
    params = init_gns_params(jax.random.key(3), cfg)
    buses, lines, gens = prepare_case(load_case(14))
    base = gns_forward(params, cfg, buses, lines, gens, method="scatter")
    anch = gns_forward(
        params, cfg.replace(slack_anchor=10.0), buses, lines, gens,
        method="scatter",
    )
    # identical states/residuals, loss differs by the discounted anchor sum
    np.testing.assert_allclose(np.asarray(anch.theta), np.asarray(base.theta))
    assert float(anch.total_loss) > float(base.total_loss)
    np.testing.assert_allclose(
        float(anch.last_loss), float(base.last_loss), rtol=1e-6
    )
    with pytest.raises(ValueError, match="paper-mode"):
        gns_forward(
            params,
            cfg.replace(reference_parity=True, slack_anchor=1.0),
            buses, lines, gens, method="scatter",
        )


def test_v_anchor_breaks_branch_tie():
    """v_anchor adds a (v-1)^2 term on free buses only (paper mode):
    states/residuals unchanged, loss strictly larger whenever any free
    bus is off 1.0; rejected in parity mode like the other paper knobs."""
    from gns_tpu.models.gns import gns_forward

    cfg = GNSConfig(K=2, latent_dim=8, hidden_dim=8, reference_parity=False)
    params = init_gns_params(jax.random.key(3), cfg)
    buses, lines, gens = prepare_case(load_case(30))
    base = gns_forward(params, cfg, buses, lines, gens, method="scatter")
    anch = gns_forward(
        params, cfg.replace(v_anchor=10.0), buses, lines, gens,
        method="scatter",
    )
    np.testing.assert_allclose(np.asarray(anch.v), np.asarray(base.v))
    assert float(anch.total_loss) > float(base.total_loss)
    np.testing.assert_allclose(
        float(anch.last_loss), float(base.last_loss), rtol=1e-6
    )
    with pytest.raises(ValueError, match="paper-mode"):
        gns_forward(
            params,
            cfg.replace(reference_parity=True, v_anchor=1.0),
            buses, lines, gens, method="scatter",
        )


def test_batched_nr_matches_scipy_oracle():
    """eval.nr_batched: one batched dispatch solves a shared-topology set;
    agreement with the float64 sequential oracle ~1e-5 p.u. (the float32
    mismatch floor), same convergence verdicts."""
    from gns_tpu.eval.nr_batched import solve_batched
    from gns_tpu.utils.augment import generate_cases

    cases_ = list(generate_cases(30, 6, seed=3, feasible_only=True))[1:]
    res = solve_batched(cases_, chunk_size=4)  # exercises chunking too
    assert res["converged"].all()
    for i, c in enumerate(cases_):
        ref = newton_raphson_pf(c)
        assert ref.success
        np.testing.assert_allclose(res["v"][i], ref.vm, atol=2e-5)
        np.testing.assert_allclose(
            res["theta_deg"][i], ref.va_deg, atol=2e-3
        )

    # harness backend path produces the same dict contract
    nr = run_nr_oracle(cases_, backend="batched")
    assert nr["converged"].all()
    assert nr["v"].shape == (6, 30) and nr["line_flow"].shape[0] == 6
