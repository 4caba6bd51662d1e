"""Shared-topology fast path: augmented single-case batches share src/dst/
gen placement (reference: GNS/augment_grids.py:25-54 perturbs parameters,
never topology), so the forward can close over one set of unbatched index
arrays. Must be numerically equivalent to the general per-grid path."""

import numpy as np
import pytest

import jax

from gns_tpu.models.gns import gns_forward_batch, init_gns_params
from gns_tpu.train.trainer import init_train_state, make_train_step
from gns_tpu.utils.augment import generate_cases
from gns_tpu.utils.config import GNSConfig
from gns_tpu.utils.prepare import batch_from_cases, extract_shared_topology


@pytest.mark.parametrize(
    "parity,mphi", [(True, True), (True, False), (False, True)]
)
def test_forward_matches_per_grid_path(parity, mphi):
    cfg = GNSConfig(K=3, reference_parity=parity, multiple_phi=mphi)
    params = init_gns_params(jax.random.key(0), cfg)
    batch = batch_from_cases(list(generate_cases(14, 7, seed=0)))
    topo = extract_shared_topology(batch)
    assert topo is not None
    ref = gns_forward_batch(params, cfg, batch, method="onehot")
    out = gns_forward_batch(params, cfg, batch, method="onehot", topo=topo)
    np.testing.assert_allclose(
        np.asarray(out.v), np.asarray(ref.v), rtol=1e-5, atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(out.theta), np.asarray(ref.theta), rtol=1e-5, atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(out.total_loss), np.asarray(ref.total_loss), rtol=2e-5
    )


def test_mixed_topology_returns_none():
    mixed = batch_from_cases(
        list(generate_cases(9, 1, seed=1)) + list(generate_cases(14, 1, seed=2)),
        pad_sizes=(32, 48, 8),
    )
    assert extract_shared_topology(mixed) is None


def test_train_step_matches(tol=5e-4):
    """One optimizer step with/without topo must agree (Adam noise bound)."""
    cfg = GNSConfig(K=2, latent_dim=8, hidden_dim=8, seed=0)
    batch = batch_from_cases(list(generate_cases(14, 7, seed=3)))
    topo = extract_shared_topology(batch)
    s0 = init_train_state(jax.random.key(1), cfg)

    ref_state, ref_m = make_train_step(cfg, method="onehot", donate=False)(s0, batch)
    st_state, st_m = make_train_step(
        cfg, method="onehot", donate=False, topo=topo
    )(s0, batch)
    np.testing.assert_allclose(
        float(st_m["loss"]), float(ref_m["loss"]), rtol=2e-5
    )
    for a, b in zip(
        jax.tree.leaves(ref_state.params), jax.tree.leaves(st_state.params)
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=8e-3, atol=cfg.lr
        )
