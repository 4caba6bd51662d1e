"""Pipeline parallelism over the K correction steps (forward + training).

The reference's K steps carry distinct per-step weights (reference:
GNS/main.py:124-134, 154) — natural pipeline stage boundaries (SURVEY.md
§2.6). This executor shards the stacked-K parameter axis over a `pp` mesh
axis (stage s owns steps s·K/S .. (s+1)·K/S−1) and streams microbatches of
grids through the stages GPipe-style inside one `shard_map`:

  tick t: stage 0 initializes microbatch t's state; every stage advances
  the in-flight carry it holds by its K/S steps; the carry — (v, theta, m,
  delta_p, delta_q, total_loss), a few KB per grid — is ppermute'd to the
  next stage over ICI. After M + S − 1 ticks all M microbatches have
  drained; the last stage finalizes (v clamp + last_loss) and the outputs
  are psum-broadcast.

Training (make_pipelined_train_step) differentiates straight through the
shard_map: XLA transposes the schedule into the reverse pipeline (each
ppermute becomes the opposite-direction ppermute, so cotangents flow
last-stage -> first-stage), and GPipe-style stage-local rematerialization
(jax.checkpoint around each stage's K/S-step scan) keeps only the
microbatch carries live instead of every step's activations. Gradients
arrive sharded over `pp` exactly like the parameters, so the optax update
runs stage-local with no parameter collective at all — the pipeline's
whole communication budget is the tiny ppermute'd carries.

Per the survey this is an *experimental option*, not the critical path —
dp×gp (data × edge partition) is the production layout. Numerics are
identical to gns_forward_batch / make_train_step: the same gns_machinery
init/step/finalize runs, only placement differs.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from gns_tpu.models.gns import GNSOutput, fuse_step_params, gns_machinery
from gns_tpu.train.trainer import TrainState, make_optimizer
from gns_tpu.utils.config import GNSConfig
from gns_tpu.utils.prepare import GridBatch


def pp_param_sharding(mesh: Mesh, pp: str = "pp"):
    """Shard the stacked-K leading axis of every param leaf over `pp`."""
    return NamedSharding(mesh, P(pp))


def _pipeline_body(cfg: GNSConfig, n_stages: int, microbatch: int, pp: str,
                   method: str, remat: bool):
    """The per-stage GPipe schedule. Returns body(params_local, batch) ->
    GNSOutput with leading (n_micro, microbatch) axes, psum-broadcast so
    every stage holds the full result (replicated out_specs)."""
    k_local = cfg.K // n_stages
    f32 = jnp.float32

    def body(params_local, batch: GridBatch):
        # params_local leaves: (K/S, ...) — this stage's step weights.
        s = jax.lax.axis_index(pp)
        bsz = batch.buses.shape[0]
        if bsz % microbatch:
            # Flooring n_micro would silently DROP the remainder grids
            # from the loss/gradients (the forward's reshape would catch
            # it loudly, but the train path has no reshape).
            raise ValueError(
                f"batch size {bsz} not divisible by microbatch={microbatch}"
            )
        n_micro = bsz // microbatch
        latent = cfg.latent_dim
        n = batch.buses.shape[1]

        def mb_slice(tree, i):
            return jax.tree.map(
                lambda x: jax.lax.dynamic_slice_in_dim(
                    x, i * microbatch, microbatch
                ),
                tree,
            )

        # Stage-local discounts: global step k = s*k_local + j (main.py:198).
        ks = s * k_local + jnp.arange(k_local, dtype=f32)
        discounts = jnp.asarray(cfg.gamma, f32) ** (cfg.K - ks)

        def grid_machinery(b, l, g, bm, lm, gm, nb):
            return gns_machinery(cfg, b, l, g, bm, lm, gm, nb, method=method)

        def init_one(b, l, g, bm, lm, gm, nb):
            init, _, _, _ = grid_machinery(b, l, g, bm, lm, gm, nb)
            return init

        fused_local = fuse_step_params(params_local, cfg)

        def stage_one(fused, carry, b, l, g, bm, lm, gm, nb):
            _, step, _, _ = grid_machinery(b, l, g, bm, lm, gm, nb)
            carry, _ = jax.lax.scan(step, carry, (fused, discounts))
            return carry

        if remat:
            # GPipe recompute: the backward pass re-runs each stage's K/S
            # steps from the incoming carry instead of storing every
            # step's activations for the whole schedule.
            stage_one = jax.checkpoint(stage_one)

        def final_one(carry, b, l, g, bm, lm, gm, nb):
            _, _, finalize, _ = grid_machinery(b, l, g, bm, lm, gm, nb)
            return finalize(carry)

        def fields(mb: GridBatch):
            return (mb.buses, mb.lines, mb.generators, mb.bus_mask,
                    mb.line_mask, mb.gen_mask, mb.n_bus)

        # In-flight carry buffer (one microbatch wide).
        buf = (
            jnp.zeros((microbatch, n), f32),           # v
            jnp.zeros((microbatch, n), f32),           # theta
            jnp.zeros((microbatch, n, latent), f32),   # m
            jnp.zeros((microbatch, n), f32),           # delta_p
            jnp.zeros((microbatch, n), f32),           # delta_q
            jnp.zeros((microbatch,), f32),             # total_loss
        )
        outs = GNSOutput(
            v=jnp.zeros((n_micro, microbatch, n), f32),
            theta=jnp.zeros((n_micro, microbatch, n), f32),
            total_loss=jnp.zeros((n_micro, microbatch), f32),
            last_loss=jnp.zeros((n_micro, microbatch), f32),
            delta_p=jnp.zeros((n_micro, microbatch, n), f32),
            delta_q=jnp.zeros((n_micro, microbatch, n), f32),
        )
        perm = [(i, (i + 1) % n_stages) for i in range(n_stages)]

        for t in range(n_micro + n_stages - 1):
            # Which microbatch this stage works on at tick t (bubble ticks
            # compute on a clamped index and are discarded downstream).
            my_mb = jnp.clip(t - s, 0, n_micro - 1)
            mb = mb_slice(batch, my_mb)
            # Stage 0 injects microbatch t's init state.
            inj = mb_slice(batch, min(t, n_micro - 1))
            init_state = jax.vmap(init_one)(*fields(inj))
            carry_in = jax.tree.map(
                lambda a, b: jnp.where(s == 0, a, b), init_state, buf
            )
            carry_out = jax.vmap(
                lambda *a: stage_one(fused_local, *a)
            )(carry_in, *fields(mb))
            out_idx = t - (n_stages - 1)
            if 0 <= out_idx < n_micro:
                fin = jax.vmap(final_one)(carry_out, *fields(mb))
                is_last = s == n_stages - 1
                outs = jax.tree.map(
                    lambda o, f: o.at[out_idx].set(
                        jnp.where(is_last, f, o[out_idx])
                    ),
                    outs, fin,
                )
            buf = jax.lax.ppermute(carry_out, pp, perm)

        # Only the last stage wrote outs; broadcast to every stage.
        return jax.lax.psum(outs, pp)

    return body


def _check_stages(cfg: GNSConfig, mesh: Mesh, pp: str) -> int:
    n_stages = mesh.shape[pp]
    if cfg.K % n_stages != 0:
        raise ValueError(f"K={cfg.K} not divisible by {n_stages} stages")
    return n_stages


def make_pipelined_forward(
    cfg: GNSConfig,
    mesh: Mesh,
    microbatch: int = 1,
    pp: str = "pp",
    method: str = "onehot",
):
    """Return a jitted fn(params, batch) -> GNSOutput running the K steps
    pipelined over the `pp` mesh axis.

    Requires cfg.K % mesh.shape[pp] == 0 and batch_size % microbatch == 0.
    """
    n_stages = _check_stages(cfg, mesh, pp)
    body = _pipeline_body(cfg, n_stages, microbatch, pp, method, remat=False)

    def fwd_body(params_local, batch):
        outs = body(params_local, batch)
        bsz = batch.buses.shape[0]
        return jax.tree.map(
            lambda x: x.reshape((bsz,) + x.shape[2:]), outs
        )

    mapped = jax.shard_map(
        fwd_body,
        mesh=mesh,
        in_specs=(P(pp), P()),
        out_specs=P(),
        check_vma=False,
    )
    return jax.jit(mapped)


def make_pipelined_train_step(
    cfg: GNSConfig,
    mesh: Mesh,
    optimizer: Optional[optax.GradientTransformation] = None,
    microbatch: int = 1,
    pp: str = "pp",
    method: str = "onehot",
    remat: bool = True,
    donate: bool = False,
):
    """Pipeline-parallel training step: (TrainState, GridBatch) ->
    (TrainState, {loss, last_loss}), the PP sibling of
    trainer.make_train_step (identical numerics, stage-sharded placement).

    jax.grad runs straight through the shard_map — the transposed program
    is the reverse pipeline (opposite-direction ppermutes carry the carry
    cotangents from the last stage back to the first), and with
    remat=True each stage recomputes its K/S forward steps during the
    backward (GPipe schedule) instead of materializing every activation.
    Parameter gradients come out sharded over `pp` like the parameters
    themselves, so the optimizer update is stage-local.
    """
    n_stages = _check_stages(cfg, mesh, pp)
    optimizer = optimizer or make_optimizer(cfg)
    body = _pipeline_body(cfg, n_stages, microbatch, pp, method, remat=remat)

    def loss_body(params_local, batch):
        outs = body(params_local, batch)
        return jnp.mean(outs.total_loss), jnp.mean(outs.last_loss)

    mapped_loss = jax.shard_map(
        loss_body,
        mesh=mesh,
        in_specs=(P(pp), P()),
        out_specs=(P(), P()),
        check_vma=False,
    )

    def step_fn(state: TrainState, batch: GridBatch):
        (loss, last_loss), grads = jax.value_and_grad(
            mapped_loss, has_aux=True
        )(state.params, batch)
        updates, opt_state = optimizer.update(
            grads, state.opt_state, state.params
        )
        params = optax.apply_updates(state.params, updates)
        return (
            TrainState(params, opt_state, state.step + 1),
            {"loss": loss, "last_loss": last_loss},
        )

    return jax.jit(step_fn, donate_argnums=(0,) if donate else ())
