"""Mixed-size mega-batch training (BASELINE.json config #5): grids from
cases 9/14/30 padded to one bucket, trained as one jitted step on a dp x gp
mesh — masks must keep padded buses/lines/gens out of the loss."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gns_tpu.models.gns import gns_forward_batch, init_gns_params
from gns_tpu.parallel.mesh import make_mesh
from gns_tpu.parallel.sharding import make_sharded_train_step, replicate, shard_batch
from gns_tpu.train.trainer import init_train_state
from gns_tpu.utils.augment import generate_cases
from gns_tpu.utils.config import GNSConfig
from gns_tpu.utils.prepare import GridBatch, batch_from_cases

CFG = GNSConfig(
    K=2, latent_dim=8, hidden_dim=8, multiple_phi=True,
    reference_parity=False, seed=0,
)


@pytest.fixture(scope="module")
def megabatch():
    cases = (
        list(generate_cases(9, 2, seed=1))
        + list(generate_cases(14, 2, seed=2))
        + list(generate_cases(30, 1, seed=3))[1:]  # drop base, keep 1 aug
    )
    # bucket: N=32, E=48 (both divisible by gp=4... E=48/4=12, N fine), G=8
    return batch_from_cases(cases, pad_sizes=(32, 48, 8))


def test_padded_loss_matches_unpadded(megabatch):
    """A grid's loss must be identical whether padded into a bucket or not."""
    params = init_gns_params(jax.random.key(0), CFG)
    padded = gns_forward_batch(params, CFG, megabatch, method="scatter")

    # compare grid 0 (case9 base) padded vs exact-shape
    single = batch_from_cases(list(generate_cases(9, 2, seed=1))[:1])
    exact = gns_forward_batch(params, CFG, single, method="scatter")
    np.testing.assert_allclose(
        float(padded.total_loss[0]), float(exact.total_loss[0]), rtol=2e-5
    )
    np.testing.assert_allclose(
        np.asarray(padded.v[0, :9]), np.asarray(exact.v[0]), rtol=2e-5, atol=1e-6
    )


def test_dense_fast_path_matches_masked(megabatch):
    """dense=True (mask-free lowering for unpadded batches) is numerically
    identical to the masked path; GridBatch.is_dense() gates it."""
    params = init_gns_params(jax.random.key(0), CFG)
    batch = batch_from_cases(list(generate_cases(14, 5, seed=7)))  # unpadded
    assert batch.is_dense()
    assert not megabatch.is_dense()  # padded bucket: masks load-bearing
    masked = gns_forward_batch(params, CFG, batch, method="onehot")
    dense = gns_forward_batch(params, CFG, batch, method="onehot", dense=True)
    np.testing.assert_allclose(
        np.asarray(dense.v), np.asarray(masked.v), rtol=2e-6, atol=1e-7
    )
    np.testing.assert_allclose(
        np.asarray(dense.total_loss), np.asarray(masked.total_loss), rtol=2e-6
    )
    # train-step equality through the dense epoch path
    from gns_tpu.train.trainer import init_train_state, make_train_step

    s0 = init_train_state(jax.random.key(1), CFG)
    _, m_ref = make_train_step(CFG, method="onehot", donate=False)(s0, batch)
    _, m_dense = make_train_step(
        CFG, method="onehot", donate=False, dense=True
    )(s0, batch)
    np.testing.assert_allclose(
        float(m_dense["loss"]), float(m_ref["loss"]), rtol=2e-6
    )


def test_padded_loss_matches_unpadded_case30(megabatch):
    params = init_gns_params(jax.random.key(0), CFG)
    padded = gns_forward_batch(params, CFG, megabatch, method="scatter")
    single = batch_from_cases(list(generate_cases(30, 1, seed=3))[1:2])
    exact = gns_forward_batch(params, CFG, single, method="scatter")
    # grids: [case9 base, 2x case9 aug, case14 base, 2x case14 aug, case30 aug]
    np.testing.assert_allclose(
        float(padded.total_loss[6]), float(exact.total_loss[0]), rtol=2e-5
    )


def test_megabatch_sharded_train_step(megabatch):
    """One dp x gp sharded train step on the mixed bucket runs and learns."""
    mesh = make_mesh(dp=2, gp=4)
    batch = megabatch[:6]  # 6 grids over dp=2; E=48 over gp=4
    state = replicate(init_train_state(jax.random.key(1), CFG), mesh)
    step = make_sharded_train_step(CFG, mesh, method="onehot")
    sharded = shard_batch(batch, mesh)
    state, m0 = step(state, sharded)
    for _ in range(15):
        state, m = step(state, sharded)
    assert np.isfinite(float(m["loss"]))
    assert float(m["loss"]) < float(m0["loss"])


def test_onehot_scatter_agree_on_padded(megabatch):
    params = init_gns_params(jax.random.key(2), CFG)
    a = gns_forward_batch(params, CFG, megabatch, method="scatter")
    b = gns_forward_batch(params, CFG, megabatch, method="onehot")
    np.testing.assert_allclose(
        np.asarray(a.total_loss), np.asarray(b.total_loss), rtol=2e-5
    )
