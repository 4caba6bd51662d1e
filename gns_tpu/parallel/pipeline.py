"""Experimental pipeline parallelism over the K correction steps.

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

Per the survey this is an *experimental option*, not the critical path —
dp×gp (data × edge partition) is the production layout; the pipeline is
forward/inference only. Numerics are identical to gns_forward_batch: the
same gns_machinery init/step/finalize runs, only placement differs.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from gns_tpu.models.gns import GNSOutput, fuse_step_params, gns_machinery
from gns_tpu.utils.config import GNSConfig
from gns_tpu.utils.prepare import GridBatch


def pp_param_sharding(mesh: Mesh, pp: str = "pp"):
    """Shard the stacked-K leading axis of every param leaf over `pp`."""
    return NamedSharding(mesh, P(pp))


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
    n_stages = mesh.shape[pp]
    if cfg.K % n_stages != 0:
        raise ValueError(f"K={cfg.K} not divisible by {n_stages} stages")
    k_local = cfg.K // n_stages
    f32 = jnp.float32

    def body(params_local, batch: GridBatch):
        # params_local leaves: (K/S, ...) — this stage's step weights.
        s = jax.lax.axis_index(pp)
        bsz = batch.buses.shape[0]
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

        def stage_one(carry, b, l, g, bm, lm, gm, nb):
            _, step, _, _ = grid_machinery(b, l, g, bm, lm, gm, nb)
            carry, _ = jax.lax.scan(step, carry, (fused_local, discounts))
            return carry

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
            carry_out = jax.vmap(stage_one)(carry_in, *fields(mb))
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
        outs = jax.lax.psum(outs, pp)
        return jax.tree.map(lambda x: x.reshape((bsz,) + x.shape[2:]), outs)

    mapped = jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(P(pp), P()),
        out_specs=P(),
        check_vma=False,
    )
    return jax.jit(mapped)
