"""Explicit shard_map edge-partition tests: forward and full train step
must equal the single-device computation (paper-correct physics mode)."""

import numpy as np
import pytest

import jax

from gns_tpu.models.gns import gns_forward_batch, init_gns_params
from gns_tpu.parallel.edge_partition import (
    make_edge_partitioned_forward,
    make_edge_partitioned_train_step,
)
from gns_tpu.parallel.mesh import make_mesh
from gns_tpu.train.trainer import init_train_state, make_train_step
from gns_tpu.utils.augment import generate_cases
from gns_tpu.utils.config import GNSConfig
from gns_tpu.utils.prepare import batch_from_cases

CFG = GNSConfig(
    K=2, latent_dim=8, hidden_dim=8, multiple_phi=True,
    reference_parity=False, seed=0,
)


@pytest.fixture(scope="module")
def data300():
    # case300: E=411 not divisible by small gp; use case14 (E=20) and
    # case30 (E=41 -> not divisible either). Stick to case14 for exact
    # divisibility (gp in {2,4}) and case300 padded to 416 for gp=8.
    return batch_from_cases(list(generate_cases(14, 7, seed=9)))


@pytest.mark.parametrize("dp,gp", [(4, 2), (2, 4)])
def test_edge_partitioned_forward_matches(data300, dp, gp):
    mesh = make_mesh(dp=dp, gp=gp)
    params = init_gns_params(jax.random.key(0), CFG)
    ref = gns_forward_batch(params, CFG, data300, method="onehot")
    fwd = make_edge_partitioned_forward(CFG, mesh, method="onehot")
    out = fwd(params, data300)
    np.testing.assert_allclose(
        np.asarray(out.v), np.asarray(ref.v), rtol=2e-5, atol=2e-6
    )
    np.testing.assert_allclose(
        np.asarray(out.total_loss), np.asarray(ref.total_loss), rtol=2e-5
    )


def test_edge_partitioned_case300_padded():
    """case300 (E=411) padded to a gp-divisible bucket still matches."""
    mesh = make_mesh(dp=1, gp=8)
    cfg = CFG
    batch = batch_from_cases(
        list(generate_cases(300, 1, seed=3)), pad_sizes=(304, 416, 72)
    )
    params = init_gns_params(jax.random.key(1), cfg)
    ref = gns_forward_batch(params, cfg, batch, method="onehot")
    fwd = make_edge_partitioned_forward(cfg, mesh, method="onehot")
    out = fwd(params, batch)
    np.testing.assert_allclose(
        np.asarray(out.total_loss), np.asarray(ref.total_loss), rtol=5e-5
    )


def test_edge_partitioned_production_config_matches(data300):
    """The TPU production lowering (bf16 compute, aggregate-then-project
    fold, hybrid custom-VJP gather/segment ops) must survive shard_map
    edge partitioning: partial per-shard aggregations + psum equal the
    single-device result to f32-reassociation noise."""
    cfg = CFG.replace(
        compute_dtype="bfloat16", fold_output="on", gather_method="hybrid"
    )
    mesh = make_mesh(dp=2, gp=4)
    params = init_gns_params(jax.random.key(5), cfg)
    ref = gns_forward_batch(params, cfg, data300, method="hybrid")
    fwd = make_edge_partitioned_forward(cfg, mesh, method="hybrid")
    out = fwd(params, data300)
    np.testing.assert_allclose(
        np.asarray(out.v), np.asarray(ref.v), rtol=1e-4, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(out.total_loss), np.asarray(ref.total_loss), rtol=1e-4
    )


def test_edge_partitioned_train_step_matches(data300):
    mesh = make_mesh(dp=2, gp=4)
    data = data300[:4]
    state0 = init_train_state(jax.random.key(2), CFG)

    ref_step = make_train_step(CFG, method="onehot", donate=False)
    ref_state, ref_m = ref_step(state0, data)

    ep_step = make_edge_partitioned_train_step(CFG, mesh, method="onehot")
    ep_state, ep_m = ep_step(state0, data)

    np.testing.assert_allclose(
        float(ep_m["loss"]), float(ref_m["loss"]), rtol=2e-5
    )
    # Adam's sqrt(second-moment) normalization amplifies float32
    # reduction-order noise on near-zero grads, so post-update params get a
    # loose tolerance; the gradient check below is the strict invariant.
    for a, b in zip(
        jax.tree.leaves(ref_state.params), jax.tree.leaves(ep_state.params)
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-2, atol=2e-4
        )


def test_edge_partitioned_gradients_match(data300):
    """The strict invariant: grad-through-shard_map == single-device grad."""
    import jax.numpy as jnp
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    from gns_tpu.models.gns import gns_forward
    from gns_tpu.parallel.edge_partition import _batch_specs

    mesh = make_mesh(dp=2, gp=4)
    data = data300[:4]
    params = init_gns_params(jax.random.key(2), CFG)

    def ref_loss(p):
        return gns_forward_batch(p, CFG, data, method="onehot").total_loss.mean()

    def local_loss(p, batch):
        fn = lambda b, l, g, bm, lm, gm, nb: gns_forward(
            p, CFG, b, l, g, bm, lm, gm, nb, method="onehot", edge_axis="gp"
        )
        out = jax.vmap(fn)(
            batch.buses, batch.lines, batch.generators,
            batch.bus_mask, batch.line_mask, batch.gen_mask, batch.n_bus,
        )
        return jax.lax.pmean(out.total_loss.mean(), "dp")

    lf = shard_map(
        local_loss, mesh=mesh,
        in_specs=(P(), _batch_specs("dp", "gp")), out_specs=P(),
        check_vma=False,
    )
    g_ref = jax.grad(ref_loss)(params)
    g_ep = jax.grad(lf)(params, data)
    for a, b in zip(jax.tree.leaves(g_ref), jax.tree.leaves(g_ep)):
        a, b = np.asarray(a), np.asarray(b)
        scale = max(np.abs(a).max(), 1e-8)
        np.testing.assert_allclose(a / scale, b / scale, atol=5e-5)


def test_parity_mode_rejected():
    mesh = make_mesh(dp=2, gp=4)
    cfg = CFG.replace(reference_parity=True)
    with pytest.raises(ValueError, match="reference_parity"):
        make_edge_partitioned_forward(cfg, mesh)


def test_edge_partitioned_paper_conventions_match(data300):
    """qg_gen_only + dispatch='setpoint_slack' must survive the edge
    partition: sharded forward == single-device forward (the per-bus
    masks are bus-local; only flow sums cross the gp axis)."""
    cfg = CFG.replace(qg_gen_only=True, dispatch="setpoint_slack")
    mesh = make_mesh(dp=2, gp=4)
    params = init_gns_params(jax.random.key(1), cfg)
    ref = gns_forward_batch(params, cfg, data300, method="onehot")
    fwd = make_edge_partitioned_forward(cfg, mesh, method="onehot")
    out = fwd(params, data300)
    np.testing.assert_allclose(
        np.asarray(out.v), np.asarray(ref.v), rtol=2e-5, atol=2e-6
    )
    np.testing.assert_allclose(
        np.asarray(out.delta_q), np.asarray(ref.delta_q), rtol=2e-4, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(out.total_loss), np.asarray(ref.total_loss), rtol=2e-5
    )
    # the reactive residual must actually be live (Q8 fixed) and slack dp zero
    assert float(np.abs(np.asarray(out.delta_q)).max()) > 1e-3
