"""Explicit edge-partitioned execution with shard_map.

The sharding.py path lets XLA's SPMD partitioner place collectives; this
module is the *explicit* formulation: edges are partitioned over the 'gp'
mesh axis inside `shard_map`, bus/generator state is replicated, and every
edge->bus aggregation performs a `lax.psum` over 'gp' — the boundary-latent
exchange of BASELINE.json's north star, riding ICI as an all-reduce of
per-bus partials. Per K-step and grid that is one (N, latent) all-reduce
per phi head plus the physics partial sums, all fused into the same
compiled program so XLA overlaps them with local compute.

Replicated-node/partitioned-edge is the right decomposition at these graph
sizes (N <= 300 buses but E-proportional work dominating: messages, MLPs on
E rows, trig physics): node-side compute is duplicated, edge-side work —
the O(E·latent) hot path — splits cleanly.

Requires paper-correct physics (reference_parity=False): quirk Q2 indexes
per-line arrays with bus ids, which has no consistent meaning on a
partitioned edge set.
"""

from __future__ import annotations

from typing import Optional

import jax
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from gns_tpu.models.gns import gns_forward
from gns_tpu.train.trainer import TrainState, make_optimizer
from gns_tpu.utils.config import GNSConfig
from gns_tpu.utils.prepare import GridBatch


def _batch_specs(dp: Optional[str], gp: str):
    """PartitionSpecs for a GridBatch inside shard_map: edges over gp,
    everything else over dp (or replicated)."""
    return GridBatch(
        buses=P(dp, None, None),
        lines=P(dp, gp, None),
        generators=P(dp, None, None),
        bus_mask=P(dp, None),
        line_mask=P(dp, gp),
        gen_mask=P(dp, None),
        n_bus=P(dp),
    )


def make_edge_partitioned_forward(
    cfg: GNSConfig,
    mesh: Mesh,
    dp: Optional[str] = "dp",
    gp: str = "gp",
    method: str = "auto",
):
    """Batched forward with explicit edge partitioning. Returns a jitted
    fn(params, GridBatch) -> GNSOutput (outputs replicated over gp)."""
    if cfg.reference_parity:
        raise ValueError("edge partitioning requires reference_parity=False")

    def local_forward(params, batch: GridBatch):
        fn = lambda b, l, g, bm, lm, gm, nb: gns_forward(
            params, cfg, b, l, g, bm, lm, gm, nb,
            method=method, edge_axis=gp,
        )
        return jax.vmap(fn)(
            batch.buses, batch.lines, batch.generators,
            batch.bus_mask, batch.line_mask, batch.gen_mask, batch.n_bus,
        )

    smapped = shard_map(
        local_forward,
        mesh=mesh,
        in_specs=(P(), _batch_specs(dp, gp)),
        out_specs=jax.tree.map(lambda _: P(dp), _out_tree_proto()),
        check_vma=False,
    )
    return jax.jit(smapped)


def _out_tree_proto():
    from gns_tpu.models.gns import GNSOutput

    return GNSOutput(0, 0, 0, 0, 0, 0)


def make_edge_partitioned_train_step(
    cfg: GNSConfig,
    mesh: Mesh,
    optimizer=None,
    dp: Optional[str] = "dp",
    gp: str = "gp",
    method: str = "auto",
):
    """Full training step with explicit dp x gp collectives: per-bus partial
    psums over gp inside the forward, gradient psums over dp x gp via the
    AD transpose of shard_map's replicated params."""
    if cfg.reference_parity:
        raise ValueError("edge partitioning requires reference_parity=False")
    optimizer = optimizer or make_optimizer(cfg)

    def local_loss(params, batch: GridBatch):
        fn = lambda b, l, g, bm, lm, gm, nb: gns_forward(
            params, cfg, b, l, g, bm, lm, gm, nb,
            method=method, edge_axis=gp,
        )
        out = jax.vmap(fn)(
            batch.buses, batch.lines, batch.generators,
            batch.bus_mask, batch.line_mask, batch.gen_mask, batch.n_bus,
        )
        # local per-shard means -> global means via pmean over dp; both are
        # replicated over gp already (every edge aggregation was psum'ed).
        loss = out.total_loss.mean()
        last = out.last_loss.mean()
        if dp is not None:
            loss = jax.lax.pmean(loss, dp)
            last = jax.lax.pmean(last, dp)
        return loss, last

    # Differentiate THROUGH shard_map so its AD rules (collective transposes,
    # replicated-input psum of cotangents) produce the exact global gradient.
    loss_fn = shard_map(
        local_loss,
        mesh=mesh,
        in_specs=(P(), _batch_specs(dp, gp)),
        out_specs=(P(), P()),
        check_vma=False,
    )

    def step_fn(state: TrainState, batch: GridBatch):
        (loss, last), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, batch
        )
        updates, opt_state = optimizer.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return (
            TrainState(params, opt_state, state.step + 1),
            {"loss": loss, "last_loss": last},
        )

    return jax.jit(step_fn)
