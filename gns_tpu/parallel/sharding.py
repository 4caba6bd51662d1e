"""Constraint-based SPMD sharding of batches, params and the train step.

GridBatch layout on a (dp, gp) mesh:
  buses/bus_mask/n_bus      P('dp')            — bus state owned per-sample
  lines/line_mask           P('dp','gp')       — edges partitioned over gp
  generators/gen_mask       P('dp')
  params                    fully replicated

With edges sharded, the one-hot incidence contraction (ops/segment.py)
becomes a local partial matmul + an XLA-inserted all-reduce of the per-bus
partial sums over 'gp' — exactly the boundary-latent exchange of
BASELINE.json's north star, riding ICI. Gradient all-reduce over 'dp' is
likewise inserted by XLA because params are replicated.

Note: reference-parity mode (quirk Q2's bus-id gathers into per-line
arrays) is semantics-preserving under SPMD — XLA partitions the gather —
so both physics modes work sharded.
"""

from __future__ import annotations

from typing import Optional

import jax
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from gns_tpu.models.gns import gns_forward_batch
from gns_tpu.train.trainer import TrainState, make_optimizer
from gns_tpu.utils.config import GNSConfig
from gns_tpu.utils.prepare import GridBatch


def batch_sharding(mesh: Mesh, dp="dp", gp: Optional[str] = "gp"):
    """Per-field NamedShardings for a GridBatch on `mesh`.

    dp may be a single axis name or a tuple of names — e.g. ("dcn", "dp")
    on a hybrid multi-host mesh (parallel.mesh.make_hybrid_mesh), which
    shards the batch across hosts and intra-host chips at once while 'gp'
    stays inside a host.
    """
    ns = lambda *spec: NamedSharding(mesh, P(*spec))
    return GridBatch(
        buses=ns(dp, None, None),
        lines=ns(dp, gp, None),
        generators=ns(dp, None, None),
        bus_mask=ns(dp, None),
        line_mask=ns(dp, gp),
        gen_mask=ns(dp, None),
        n_bus=ns(dp),
    )


def shard_batch(batch: GridBatch, mesh: Mesh, dp="dp", gp: Optional[str] = "gp") -> GridBatch:
    """Place a host GridBatch onto the mesh with the canonical layout.

    Pads nothing: batch size must divide the dp axis size and the edge
    count the gp axis size (pad the batch/bucket beforehand otherwise).
    """
    shardings = batch_sharding(mesh, dp, gp)
    return GridBatch(
        *(jax.device_put(x, s) for x, s in zip(batch, shardings))
    )


def replicate(tree, mesh: Mesh):
    s = NamedSharding(mesh, P())
    return jax.device_put(tree, s)


def make_sharded_train_step(
    cfg: GNSConfig,
    mesh: Mesh,
    optimizer=None,
    method: str = "auto",
    dp="dp",
    gp: Optional[str] = "gp",
    topo=None,
):
    """Jitted train step with explicit input/output shardings on `mesh`."""
    optimizer = optimizer or make_optimizer(cfg)
    repl = NamedSharding(mesh, P())
    b_shard = batch_sharding(mesh, dp, gp)

    def loss_fn(params, batch: GridBatch):
        out = gns_forward_batch(params, cfg, batch, method=method, topo=topo)
        return out.total_loss.mean(), out.last_loss.mean()

    def step_fn(state: TrainState, batch: GridBatch):
        (loss, last_loss), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, batch
        )
        updates, opt_state = optimizer.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return (
            TrainState(params, opt_state, state.step + 1),
            {"loss": loss, "last_loss": last_loss},
        )

    state_shardings = TrainState(params=repl, opt_state=repl, step=repl)
    return jax.jit(
        step_fn,
        in_shardings=(state_shardings, b_shard),
        out_shardings=(state_shardings, repl),
    )


def make_sharded_eval_step(
    cfg: GNSConfig,
    mesh: Mesh,
    method: str = "auto",
    dp="dp",
    gp: Optional[str] = "gp",
    topo=None,
):
    b_shard = batch_sharding(mesh, dp, gp)
    repl = NamedSharding(mesh, P())

    def fn(params, batch: GridBatch):
        return gns_forward_batch(params, cfg, batch, method=method, topo=topo)

    return jax.jit(fn, in_shardings=(repl, b_shard))
