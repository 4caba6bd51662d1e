"""Tensor-parallel and pipeline-parallel executors match single-device
numerics (SURVEY.md §2.6: TP spec-level support, PP experimental K-step
staging). Runs on the simulated 8-device CPU mesh (conftest.py)."""

import numpy as np
import pytest

import jax

from gns_tpu.models.gns import gns_forward_batch, init_gns_params
from gns_tpu.parallel.mesh import make_mesh
from gns_tpu.parallel.pipeline import make_pipelined_forward
from gns_tpu.parallel.sharding import shard_batch
from gns_tpu.parallel.tensor_parallel import (
    make_tp_train_step,
    shard_params_tp,
    tp_init_train_state,
)
from gns_tpu.train.trainer import init_train_state, make_train_step
from gns_tpu.utils.augment import generate_cases
from gns_tpu.utils.config import GNSConfig
from gns_tpu.utils.prepare import batch_from_cases

CFG = GNSConfig(K=4, latent_dim=8, hidden_dim=8, multiple_phi=True, seed=0)


@pytest.fixture(scope="module")
def data():
    cases = list(generate_cases(14, 8, seed=5))[1:]  # 8 grids
    return batch_from_cases(cases + cases[:1])[:8]


def test_tp_forward_matches(data):
    mesh = make_mesh(dp=2, gp=2, devices=jax.devices()[:4], axis_names=("dp", "tp"))
    params = init_gns_params(jax.random.key(0), CFG)
    ref = gns_forward_batch(params, CFG, data, method="onehot")

    params_tp = shard_params_tp(params, mesh)
    batch = shard_batch(data, mesh, gp=None)
    out = jax.jit(lambda p, b: gns_forward_batch(p, CFG, b, method="onehot"))(
        params_tp, batch
    )
    np.testing.assert_allclose(np.asarray(out.v), np.asarray(ref.v), rtol=2e-5, atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(out.total_loss), np.asarray(ref.total_loss), rtol=2e-5
    )


def test_tp_train_step_matches(data):
    mesh = make_mesh(dp=2, gp=2, devices=jax.devices()[:4], axis_names=("dp", "tp"))
    state = init_train_state(jax.random.key(0), CFG)
    from gns_tpu.models.gns import gns_forward_batch as fwd

    def loss(p, b):
        return fwd(p, CFG, b, method="onehot").total_loss.mean()

    g_ref = jax.grad(loss)(state.params, data)  # before donation deletes state
    ref_state, ref_metrics = make_train_step(CFG, method="onehot")(state, data)

    tp_state0 = tp_init_train_state(jax.random.key(0), CFG, mesh)
    batch = shard_batch(data, mesh, gp=None)
    step = make_tp_train_step(CFG, mesh, method="onehot")
    tp_state, metrics = step(tp_state0, batch)

    np.testing.assert_allclose(
        float(metrics["loss"]), float(ref_metrics["loss"]), rtol=2e-5
    )
    # Post-Adam params are ill-conditioned for comparison (update ~ sign(g)
    # flips wholesale where g ~ reduction-order noise), so check the grads.
    g_tp = jax.jit(jax.grad(loss))(tp_state0.params, batch)
    for a, b in zip(jax.tree.leaves(g_tp), jax.tree.leaves(g_ref)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-3, atol=2e-5
        )
    # And the TP step moved params by exactly one optimizer step's magnitude.
    assert int(tp_state.step) == 1


@pytest.mark.parametrize("n_stages,microbatch", [(2, 2), (4, 1), (4, 2)])
def test_pipeline_forward_matches(data, n_stages, microbatch):
    mesh = make_mesh(dp=n_stages, gp=1, devices=jax.devices()[:n_stages], axis_names=("pp", "unused"))
    params = init_gns_params(jax.random.key(0), CFG)
    ref = gns_forward_batch(params, CFG, data, method="onehot")

    fn = make_pipelined_forward(CFG, mesh, microbatch=microbatch)
    out = fn(params, data)
    np.testing.assert_allclose(np.asarray(out.v), np.asarray(ref.v), rtol=2e-5, atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(out.theta), np.asarray(ref.theta), rtol=2e-5, atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(out.total_loss), np.asarray(ref.total_loss), rtol=2e-5
    )
    np.testing.assert_allclose(
        np.asarray(out.last_loss), np.asarray(ref.last_loss), rtol=2e-5, atol=1e-7
    )


@pytest.mark.parametrize("n_stages,microbatch,remat", [(2, 2, True), (4, 1, True), (2, 4, False)])
def test_pipeline_train_step_matches(data, n_stages, microbatch, remat):
    """Pipeline-parallel TRAINING: gradients flow backward through the
    GPipe schedule (reverse ppermutes) and match the single-device step.
    remat=True exercises the stage-local recompute path."""
    from gns_tpu.parallel.pipeline import make_pipelined_train_step

    mesh = make_mesh(dp=n_stages, gp=1, devices=jax.devices()[:n_stages],
                     axis_names=("pp", "unused"))
    state = init_train_state(jax.random.key(0), CFG)

    def loss(p, b):
        return gns_forward_batch(p, CFG, b, method="onehot").total_loss.mean()

    g_ref = jax.grad(loss)(state.params, data)
    ref_state, ref_metrics = make_train_step(CFG, method="onehot", donate=False)(
        state, data
    )

    step = make_pipelined_train_step(
        CFG, mesh, microbatch=microbatch, remat=remat
    )
    pp_state, metrics = step(state, data)

    np.testing.assert_allclose(
        float(metrics["loss"]), float(ref_metrics["loss"]), rtol=2e-5
    )
    np.testing.assert_allclose(
        float(metrics["last_loss"]), float(ref_metrics["last_loss"]), rtol=2e-5
    )
    # Gradient equality (post-Adam params are sign(g)-noise-sensitive; the
    # grads are the real invariant — same convention as the TP test).
    from jax.sharding import PartitionSpec as P

    from gns_tpu.parallel import pipeline as pl

    body = pl._pipeline_body(CFG, n_stages, microbatch, "pp", "onehot", remat)
    mapped = jax.shard_map(
        lambda p, b: body(p, b).total_loss.mean(),
        mesh=mesh, in_specs=(P("pp"), P()), out_specs=P(), check_vma=False,
    )
    g_pp = jax.jit(jax.grad(mapped))(state.params, data)
    for a, b in zip(jax.tree.leaves(g_pp), jax.tree.leaves(g_ref)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-3, atol=2e-5
        )
    assert int(pp_state.step) == 1


def test_pipeline_forward_production_lowering(data):
    """Pipeline staging with the TPU production lowering (bf16 compute,
    aggregate-then-project fold, hybrid ops): per-stage fuse_step_params
    must emit the folded layout and the staged carry must still match the
    single-device forward."""
    cfg = CFG.replace(
        compute_dtype="bfloat16", fold_output="on", gather_method="hybrid",
        reference_parity=False,
    )
    mesh = make_mesh(dp=2, gp=1, devices=jax.devices()[:2], axis_names=("pp", "unused"))
    params = init_gns_params(jax.random.key(1), cfg)
    ref = gns_forward_batch(params, cfg, data, method="hybrid")
    fn = make_pipelined_forward(cfg, mesh, microbatch=2, method="hybrid")
    out = fn(params, data)
    np.testing.assert_allclose(
        np.asarray(out.v), np.asarray(ref.v), rtol=1e-4, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(out.total_loss), np.asarray(ref.total_loss), rtol=1e-4
    )
