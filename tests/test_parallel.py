"""Distributed tests on a simulated 8-device CPU mesh (conftest.py).

Invariant (SURVEY.md §4): the sharded forward/train step equals the
single-device one, for both dp-only and dp x gp (edge-partitioned) meshes.
"""

import numpy as np
import pytest

import jax

from gns_tpu.models.gns import gns_forward_batch, init_gns_params
from gns_tpu.parallel.mesh import make_mesh
from gns_tpu.parallel.sharding import (
    make_sharded_train_step,
    replicate,
    shard_batch,
)
from gns_tpu.train.trainer import init_train_state, make_train_step
from gns_tpu.utils.augment import generate_cases
from gns_tpu.utils.config import GNSConfig
from gns_tpu.utils.prepare import batch_from_cases

CFG = GNSConfig(K=2, latent_dim=8, hidden_dim=8, multiple_phi=True, seed=0)


@pytest.fixture(scope="module")
def data():
    cases = list(generate_cases(14, 8, seed=5))[1:]  # 8 grids, E=20
    return batch_from_cases(cases + cases[:1])[:8]


@pytest.mark.parametrize("dp,gp", [(8, 1), (4, 2), (2, 4)])
def test_sharded_forward_matches_single_device(data, dp, gp):
    mesh = make_mesh(dp=dp, gp=gp)
    params = init_gns_params(jax.random.key(0), CFG)

    ref = gns_forward_batch(params, CFG, data, method="onehot")

    sharded = shard_batch(data, mesh)
    params_r = replicate(params, mesh)
    out = jax.jit(lambda p, b: gns_forward_batch(p, CFG, b, method="onehot"))(
        params_r, sharded
    )
    np.testing.assert_allclose(np.asarray(out.v), np.asarray(ref.v), rtol=2e-5, atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(out.total_loss), np.asarray(ref.total_loss), rtol=2e-5
    )


@pytest.mark.parametrize("dp,gp", [(4, 2), (2, 4)])
def test_sharded_train_step_matches_single_device(data, dp, gp):
    mesh = make_mesh(dp=dp, gp=gp)
    state0 = init_train_state(jax.random.key(1), CFG)

    ref_step = make_train_step(CFG, method="onehot", donate=False)
    ref_state, ref_metrics = ref_step(state0, data)

    sh_step = make_sharded_train_step(CFG, mesh, method="onehot")
    sh_state, sh_metrics = sh_step(replicate(state0, mesh), shard_batch(data, mesh))

    np.testing.assert_allclose(
        float(sh_metrics["loss"]), float(ref_metrics["loss"]), rtol=2e-5
    )
    # Adam divides by sqrt(second moment), amplifying float32 reduction-order
    # differences between shardings on near-zero grads: a single element's
    # update can flip by up to ~lr (1e-3), which bounds the atol.
    for a, b in zip(jax.tree.leaves(ref_state.params), jax.tree.leaves(sh_state.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=8e-3, atol=CFG.lr)


def test_sharded_parity_mode(data):
    """Quirk-Q2 gathers survive SPMD partitioning (semantics-preserving)."""
    mesh = make_mesh(dp=2, gp=4)
    cfg = CFG.replace(reference_parity=True)
    params = init_gns_params(jax.random.key(2), cfg)
    ref = gns_forward_batch(params, cfg, data, method="onehot")
    out = jax.jit(lambda p, b: gns_forward_batch(p, cfg, b, method="onehot"))(
        replicate(params, mesh), shard_batch(data, mesh)
    )
    np.testing.assert_allclose(
        np.asarray(out.total_loss), np.asarray(ref.total_loss), rtol=2e-5
    )
