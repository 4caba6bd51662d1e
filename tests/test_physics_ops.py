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
