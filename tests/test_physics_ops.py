"""Physics-op unit tests against golden values from the reference
(SURVEY.md §4 'Physics-op unit tests') plus line-flow and warmup checks."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gns_tpu.physics import (
    active_line_flow,
    global_active_compensation,
    local_power_imbalance,
)
from tests.conftest import load_golden


def test_compensation_and_imbalance_vs_golden():
    """Step-0 physics outputs from the golden reference run.

    The golden fixtures capture Pg_new/qg_new/delta_p/delta_q per step
    (tools/make_goldens.py wraps the reference's physics functions). Step 0
    inputs are reproducible here from the captured network_input (v, theta
    are its first two columns after the state update of step 0 — instead we
    verify at the *final* step using the stored v/theta outputs, which the
    reference computes its last physics refresh from, pre-clamp).
    """
    g = load_golden("multiphi_K4_L20_H10_grid1")
    buses, lines, gens = g["buses"], g["lines"], g["generators"]
    # v in the golden output is clamped AFTER the last physics call
    # (main.py:199-201), but clamping only affects negative v; check none.
    v = jnp.asarray(g["v"])
    theta = jnp.asarray(g["theta"])
    assert float(v.min()) >= 0

    pg_new, qg_new = global_active_compensation(
        v, theta, buses, lines, gens, reference_parity=True, method="scatter"
    )
    np.testing.assert_allclose(
        np.asarray(pg_new), g["Pg_new"][-1], rtol=1e-4, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(qg_new), g["qg_new"][-1], rtol=1e-4, atol=1e-5
    )
    dp, dq = local_power_imbalance(
        v, theta, buses, lines, gens, pg_new, qg_new,
        reference_parity=True, method="scatter",
    )
    np.testing.assert_allclose(np.asarray(dp), g["delta_p"][-1], rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(dq), g["delta_q"][-1], rtol=1e-4, atol=1e-5)


def test_active_line_flow_matches_numpy():
    g = load_golden("multiphi_K4_L20_H10_grid1")
    lines = g["lines"]
    v = g["v"]
    theta = g["theta"]
    out = np.asarray(active_line_flow(jnp.asarray(v), jnp.asarray(theta), lines))
    src = lines[:, 0].astype(int) - 1
    dst = lines[:, 1].astype(int) - 1
    ref = (1.0 / lines[:, 3]) * v[src] * v[dst] * np.sin(theta[src] - theta[dst])
    np.testing.assert_allclose(out, ref, rtol=1e-6)


def test_warmup_schedule_ramps():
    from gns_tpu.train.trainer import init_train_state, make_train_step
    from gns_tpu.utils.augment import generate_cases
    from gns_tpu.utils.config import GNSConfig
    from gns_tpu.utils.prepare import batch_from_cases

    cfg = GNSConfig(K=2, latent_dim=8, hidden_dim=8, warmup_steps=10)
    data = batch_from_cases(list(generate_cases(14, 3, seed=2)))
    state = init_train_state(jax.random.key(0), cfg)
    step = make_train_step(cfg, method="scatter", donate=False)
    p0 = jax.device_get(state.params)
    state, _ = step(state, data)  # warmup step 0: lr == 0, no movement
    p1 = jax.device_get(state.params)
    zero_delta = max(
        float(np.abs(a - b).max()) for a, b in zip(
            jax.tree.leaves(p0), jax.tree.leaves(p1))
    )
    assert zero_delta == 0.0
    state, _ = step(state, data)  # warmup step 1: lr ~ lr/10
    p2 = jax.device_get(state.params)
    max_delta = max(
        float(np.abs(a - b).max()) for a, b in zip(
            jax.tree.leaves(p1), jax.tree.leaves(p2))
    )
    # moved, but far less than a full-lr Adam step (|update| ~ lr_t)
    assert 0 < max_delta < cfg.lr


# ---------------------------------------------------------------------------
# Quirk Q8 + the paper-mode physics conventions that fix it (ROADMAP #6).
# ---------------------------------------------------------------------------


def _nr_state(case_nr, paper_shunts=True):
    from gns_tpu.eval.newton_raphson import newton_raphson_pf
    from gns_tpu.utils.cases import load_case
    from gns_tpu.utils.prepare import prepare_case

    case = load_case(case_nr)
    res = newton_raphson_pf(case)
    assert res.success
    buses, lines, gens = prepare_case(case, paper_shunts=paper_shunts)
    v = jnp.asarray(res.vm, jnp.float32)
    theta = jnp.asarray(np.deg2rad(res.va_deg), jnp.float32)
    return buses, lines, gens, v, theta


def test_delta_q_cancels_identically_quirk_q8():
    """The reference computes qg_new at EVERY bus from the same reactive
    flow expressions the imbalance subtracts (GNS/main.py:64-76 vs
    :98-102), so delta_q == 0 to float noise in BOTH modes: the training
    loss carries no reactive signal."""
    buses, lines, gens = _nr_state(30)[:3]
    n = buses.shape[0]
    rng = np.random.default_rng(0)
    v = jnp.asarray(1.0 + 0.1 * rng.standard_normal(n), jnp.float32)
    theta = jnp.asarray(0.2 * rng.standard_normal(n), jnp.float32)
    for parity in (True, False):
        pg, qg = global_active_compensation(
            v, theta, buses, lines, gens, reference_parity=parity
        )
        dp, dq = local_power_imbalance(
            v, theta, buses, lines, gens, pg, qg, reference_parity=parity
        )
        assert float(jnp.abs(dq).max()) < 1e-4
        assert float(jnp.abs(dp).max()) > 1.0


def test_qg_gen_only_restores_reactive_residual():
    """With qg_gen_only, load buses carry a real reactive mismatch (it
    anchors |v|); at the NR solution it vanishes (NR satisfies reactive
    balance at PQ buses)."""
    from gns_tpu.utils.schema import GEN

    # true shunts: the residual models exactly the grid NR solved (the
    # authentic case30 has a 19 MVAr bank at bus 10 the paper defaults
    # would erase, GNSConfig.true_shunts)
    buses, lines, gens, v_nr, th_nr = _nr_state(30, paper_shunts=False)
    n = buses.shape[0]
    gen_bus = np.asarray(gens[:, GEN["bus_i"]], int) - 1
    is_load = np.ones(n, bool)
    is_load[gen_bus] = False

    # far from the solution: load-bus delta_q is live signal
    v = jnp.ones(n) * 1.2
    pg, qg = global_active_compensation(
        v, jnp.zeros(n), buses, lines, gens,
        reference_parity=False, qg_gen_only=True,
    )
    assert float(np.abs(np.asarray(qg)[is_load]).max()) == 0.0
    dp, dq = local_power_imbalance(
        v, jnp.zeros(n), buses, lines, gens, pg, qg, reference_parity=False
    )
    assert float(np.abs(np.asarray(dq)[is_load]).max()) > 0.05
    # at the NR solution it vanishes
    pg, qg = global_active_compensation(
        v_nr, th_nr, buses, lines, gens,
        reference_parity=False, qg_gen_only=True,
    )
    dp, dq = local_power_imbalance(
        v_nr, th_nr, buses, lines, gens, pg, qg, reference_parity=False
    )
    # with true shunts there is no fictitious-shunt floor: reactive
    # balance at PQ buses holds to float32 noise
    assert float(jnp.abs(dq).max()) < 1e-4


def test_nr_convention_objective_minimum_is_nr():
    """qg_gen_only + dispatch='setpoint_slack' + true shunts: the
    residual at the NR solution vanishes to float noise, orders of
    magnitude below any degenerate state — the objective's minimum IS
    the NR solution exactly."""
    from gns_tpu.physics.fused import physics_refresh

    buses, lines, gens, v_nr, th_nr = _nr_state(30, paper_shunts=False)
    n = buses.shape[0]

    def residual(v, theta):
        pg, qg = global_active_compensation(
            v, theta, buses, lines, gens, reference_parity=False,
            qg_gen_only=True, dispatch="setpoint_slack",
        )
        dp, dq = local_power_imbalance(
            v, theta, buses, lines, gens, pg, qg,
            reference_parity=False, zero_slack_dp=True,
        )
        # fused path must agree exactly
        pg2, qg2, dp2, dq2 = physics_refresh(
            v, theta, buses, lines, gens, reference_parity=False,
            qg_gen_only=True, dispatch="setpoint_slack",
        )
        np.testing.assert_allclose(np.asarray(dp), np.asarray(dp2), atol=1e-6)
        np.testing.assert_allclose(np.asarray(dq), np.asarray(dq2), atol=1e-6)
        return float(jnp.sum(dp**2 + dq**2) / n)

    at_nr = residual(v_nr, th_nr)
    assert at_nr < 1e-8  # float noise: measured ~3e-12 on authentic case30
    for v, th in [
        (jnp.ones(n), jnp.zeros(n)),
        (jnp.zeros(n), jnp.zeros(n)),
        (8.0 * jnp.ones(n), jnp.zeros(n)),
    ]:
        assert residual(v, th) > 0.01  # degenerate states: >=1e7 x the floor


def test_paper_flows_match_pypower_at_solved_dispatch():
    """With NR's own solved generator outputs, the paper-mode delta_p
    collapses to the paper-shunt floor — the branch-flow equations agree
    with pypower's."""
    from gns_tpu.eval.newton_raphson import newton_raphson_pf
    from gns_tpu.utils.cases import load_case
    from gns_tpu.utils.prepare import prepare_case

    case = load_case(30)
    res = newton_raphson_pf(case)
    buses, lines, gens = prepare_case(case)
    v = jnp.asarray(res.vm, jnp.float32)
    theta = jnp.asarray(np.deg2rad(res.va_deg), jnp.float32)
    pg_nr = jnp.asarray(np.asarray(res.gen, float)[:, 1] / 100.0, jnp.float32)
    _, qg = global_active_compensation(
        v, theta, buses, lines, gens, reference_parity=False
    )
    dp, dq = local_power_imbalance(
        v, theta, buses, lines, gens, pg_nr, qg, reference_parity=False
    )
    # floor = the fictitious paper shunts (Gs=0.01/bus, utils.py:23-30)
    assert float(jnp.abs(dp).max()) < 0.03


def test_new_conventions_require_paper_mode():
    buses, lines, gens, v, th = _nr_state(30)
    with pytest.raises(ValueError):
        global_active_compensation(
            v, th, buses, lines, gens, reference_parity=True, qg_gen_only=True
        )
    with pytest.raises(ValueError):
        local_power_imbalance(
            v, th, buses, lines, gens, jnp.zeros(gens.shape[0]),
            jnp.zeros(buses.shape[0]), reference_parity=True,
            zero_slack_dp=True,
        )
    from gns_tpu.models.gns import gns_forward
    from gns_tpu.models.gns import init_gns_params
    from gns_tpu.utils.config import GNSConfig

    cfg = GNSConfig(K=2, latent_dim=8, hidden_dim=8, reference_parity=True,
                    qg_gen_only=True)
    params = init_gns_params(jax.random.key(0), cfg)
    with pytest.raises(ValueError):
        gns_forward(params, cfg, buses, lines, gens)


def test_gns_forward_nr_convention_runs_and_masks_slack():
    """Model forward under the NR-convention objective: slack delta_p is
    zero, load-bus delta_q is live, loss is finite."""
    from gns_tpu.models.gns import init_gns_params
    from gns_tpu.models.gns import gns_forward
    from gns_tpu.utils.config import GNSConfig
    from gns_tpu.utils.schema import BUS

    buses, lines, gens = _nr_state(30)[:3]
    cfg = GNSConfig(K=3, latent_dim=8, hidden_dim=8, reference_parity=False,
                    qg_gen_only=True, dispatch="setpoint_slack")
    params = init_gns_params(jax.random.key(0), cfg)
    out = gns_forward(params, cfg, buses, lines, gens)
    slack = np.asarray(buses[:, BUS["type"]]) == 3
    assert np.abs(np.asarray(out.delta_p)[slack]).max() == 0.0
    assert float(np.abs(np.asarray(out.delta_q)).max()) > 1e-3
    assert np.isfinite(float(out.total_loss))
