"""Spec-level tensor parallelism: shard the MLP hidden dimension.

The reference has no TP (it has no parallelism at all; SURVEY.md §2.6) and
the GNS MLPs are tiny (~15K params), so TP is never load-bearing here. Per
the survey, the framework still provides *spec-level* support: a pytree of
NamedShardings that lays the LearningBlock weights out Megatron-style over
a `tp` mesh axis —

  w1 (K, din, h)   column-parallel: hidden output axis sharded
  b1 (K, h)        sharded with w1's output
  w2 (K, h, h)     row-parallel: hidden input axis sharded (XLA inserts the
                   all-reduce of the partial sums over `tp`)
  b2, w4, b4       replicated

No hand-written collectives: committing params with these shardings is
enough — GSPMD propagates the layout through the jitted forward/step and
inserts the psum after the row-parallel matmul, riding ICI.
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def tp_param_shardings(params, mesh: Mesh, tp: str = "tp"):
    """NamedSharding pytree matching an init_gns_params tree.

    Leaves keep their leading stacked-K axis unsharded; only the hidden
    axis is partitioned over `tp` as in the module docstring.
    """
    specs = {
        "w1": P(None, None, tp),
        "b1": P(None, tp),
        "w2": P(None, tp, None),
        "b2": P(),
        "w4": P(),
        "b4": P(),
    }

    def one(path, _leaf):
        name = path[-1].key  # 'w1' .. 'b4'
        return NamedSharding(mesh, specs[name])

    return jax.tree_util.tree_map_with_path(one, params)


def shard_params_tp(params, mesh: Mesh, tp: str = "tp"):
    """Commit params to the mesh with the TP layout (a no-op numerically)."""
    return jax.device_put(params, tp_param_shardings(params, mesh, tp))


def tp_init_train_state(key, cfg, mesh: Mesh, optimizer=None, tp: str = "tp"):
    """TrainState with TP-sharded params.

    The optimizer moments mirror the param tree, so running optimizer.init
    under jit with committed TP params makes GSPMD give mu/nu the same
    layout — no per-leaf spec bookkeeping needed.
    """
    import jax.numpy as jnp

    from gns_tpu.models.gns import init_gns_params
    from gns_tpu.train.trainer import TrainState, make_optimizer

    optimizer = optimizer or make_optimizer(cfg)
    params = shard_params_tp(init_gns_params(key, cfg), mesh, tp)
    opt_state = jax.jit(optimizer.init)(params)
    step = jax.device_put(jnp.zeros((), jnp.int32), NamedSharding(mesh, P()))
    return TrainState(params=params, opt_state=opt_state, step=step)


def make_tp_train_step(cfg, mesh: Mesh = None, optimizer=None, method: str = "auto"):
    """Jitted train step for a (dp, tp) mesh: batch sharded over dp, params
    over tp (as committed by tp_init_train_state). No explicit in_shardings:
    GSPMD propagates the committed layouts through forward+backward and
    inserts the row-parallel psum and the dp gradient all-reduce. `mesh` is
    accepted for API symmetry only."""
    del mesh
    import optax

    from gns_tpu.models.gns import gns_forward_batch
    from gns_tpu.train.trainer import TrainState, make_optimizer
    from gns_tpu.utils.prepare import GridBatch

    optimizer = optimizer or make_optimizer(cfg)

    def loss_fn(params, batch: GridBatch):
        out = gns_forward_batch(params, cfg, batch, method=method)
        return out.total_loss.mean(), out.last_loss.mean()

    @jax.jit
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

    return step_fn
