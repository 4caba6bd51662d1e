"""The GNS model: K learned correction steps over the bus-branch graph.

TPU-native re-design of the reference model (reference: GNS/main.py:107-202):

  * The K steps — each with its *own* MLP weights (main.py:124-134) — are a
    single `lax.scan` over parameter pytrees stacked along a leading K axis,
    so the whole forward is one compiled program regardless of K.
  * Edge aggregation goes through gns_tpu.ops.segment_sum, which lowers to a
    dense incidence matmul on the MXU (or a Pallas kernel) instead of a
    scatter.
  * The physics loss is computed inside the forward, exactly like the
    reference (main.py:198-199): a gamma-discounted sum of per-step squared
    bus power imbalances.
  * Everything is single-grid shaped; the training layer vmaps over a
    GridBatch and pjit-shards the batch across devices.

Per-step semantics (the activation-parity contract; SURVEY.md §2.2):
  state init: m = 0 (N,latent); theta = 0 (N,);
    v = scatter-add of generator vg onto buses, buses without a generator
    get 1.0 (sums over co-located generators — quirk Q3, main.py:146);
    delta_p/delta_q from generator set-points.
  step k:
    edge_in = concat(m[dst], line feats r,x,b,tau,shift) — NOTE the message
    uses the destination bus's own latent, and only t_bus-direction edges
    (main.py:153-155; f_bus is unused by the neural message passing);
    phi MLP(s) -> scatter-add at dst; node_in = concat(v, theta, delta_p,
    delta_q, m, phi_sum); theta += L_theta(node_in) at all buses;
    v += L_v(node_in) at non-generator buses only (PV freeze, main.py:184);
    m += L_m(node_in); physics refresh via global_active_compensation +
    local_power_imbalance; total_loss += gamma^(K-k) * sum(dp^2+dq^2)/N.
  post: last_loss = undiscounted final residual; v = max(v, 0).

With `multiple_phi=False`, quirk Q1 applies: phi outputs (E,1) and only
latent column 0 of phi_sum is ever written (main.py:169-170).
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from gns_tpu.models.blocks import init_learning_block, learning_block_apply
from gns_tpu.ops import segment_sum
from gns_tpu.ops.segment import broadcast_col0_segment_sum
from gns_tpu.physics.fused import physics_refresh
from gns_tpu.utils.config import GNSConfig
from gns_tpu.utils.schema import GEN


class GNSOutput(NamedTuple):
    v: jnp.ndarray  # (N,)
    theta: jnp.ndarray  # (N,)
    total_loss: jnp.ndarray  # scalar
    last_loss: jnp.ndarray  # scalar
    delta_p: jnp.ndarray  # (N,) final active mismatch
    delta_q: jnp.ndarray  # (N,) final reactive mismatch


def init_gns_params(key, cfg: GNSConfig, dtype=jnp.float32):
    """Stacked-K parameter pytree: every leaf has leading dimension K."""

    def stacked_block(key, dim_in, dim_out):
        keys = jax.random.split(key, cfg.K)
        blocks = [
            init_learning_block(k, dim_in, cfg.hidden_dim, dim_out, dtype)
            for k in keys
        ]
        return jax.tree.map(lambda *xs: jnp.stack(xs), *blocks)

    names = []
    if cfg.multiple_phi:
        names += [
            ("phi_v", cfg.phi_in_dim, cfg.latent_dim),
            ("phi_theta", cfg.phi_in_dim, cfg.latent_dim),
            ("phi_m", cfg.phi_in_dim, cfg.latent_dim),
        ]
    else:
        names += [("phi", cfg.phi_in_dim, 1)]
    names += [
        ("L_theta", cfg.update_in_dim, 1),
        ("L_v", cfg.update_in_dim, 1),
        ("L_m", cfg.update_in_dim, cfg.latent_dim),
    ]
    keys = jax.random.split(key, len(names))
    return {
        name: stacked_block(k, din, dout) for k, (name, din, dout) in zip(keys, names)
    }


def gns_machinery(
    cfg: GNSConfig,
    buses,
    lines,
    generators,
    bus_mask: Optional[jnp.ndarray] = None,
    line_mask: Optional[jnp.ndarray] = None,
    gen_mask: Optional[jnp.ndarray] = None,
    n_bus: Optional[jnp.ndarray] = None,
    method: str = "auto",
    precision=None,
    edge_axis: Optional[str] = None,
):
    """Factor the K-step loop into (init_carry, step, finalize) for one grid.

    `gns_forward` composes them with one lax.scan; the pipeline-parallel
    executor (parallel/pipeline.py) runs contiguous slices of steps on
    different devices, passing the carry between stages. The carry is
    (v, theta, m, delta_p, delta_q, total_loss); `step(carry, (step_params,
    discount))` advances one correction step; `finalize(carry)` applies the
    v>=0 clamp and computes last_loss (reference: GNS/main.py:199-202).

    edge_axis: when the edge set is sharded over a named mesh axis inside
    shard_map, per-bus edge aggregations are psum'ed over that axis — the
    boundary-latent exchange of edge-partitioned execution (ICI all-reduce).
    Bus/gen state is replicated across the axis. Requires
    reference_parity=False (see physics/compensation.py).
    """
    if edge_axis is not None and cfg.reference_parity:
        raise ValueError("edge-partitioned execution requires reference_parity=False")

    def _psum(x):
        return jax.lax.psum(x, edge_axis) if edge_axis is not None else x

    # Mixed precision: run the MLPs in compute_dtype (bf16 on the MXU),
    # keep state/physics in float32.
    cdt = jnp.dtype(cfg.compute_dtype)

    def mlp(block_params, x, keep_dtype: bool = False):
        if cdt != x.dtype:
            block_params = jax.tree.map(lambda p: p.astype(cdt), block_params)
            x = x.astype(cdt)
        out = learning_block_apply(block_params, x, cfg.leaky_relu_slope, precision)
        if keep_dtype or cdt == jnp.float32:
            return out
        return out.astype(jnp.float32)
    n = buses.shape[0]
    latent = cfg.latent_dim
    f32 = buses.dtype

    gen_idx = generators[:, GEN["bus_i"]].astype(jnp.int32) - 1
    gm = gen_mask if gen_mask is not None else jnp.ones(generators.shape[0], f32)
    lm = line_mask if line_mask is not None else jnp.ones(lines.shape[0], f32)
    n_real = (
        jnp.asarray(n, f32) if n_bus is None else jnp.asarray(n_bus, f32)
    )

    # --- state init (main.py:141-153) ---
    m = jnp.zeros((n, latent), f32)
    theta = jnp.zeros((n,), f32)
    # Q3: co-located generators *sum* their vg set-points.
    v = segment_sum(generators[:, GEN["vg"]] * gm, gen_idx, n, method=method)
    v = jnp.where(v == 0, jnp.ones_like(v), v)
    pg_bus = segment_sum(generators[:, GEN["Pg"]] * gm, gen_idx, n, method=method)
    qg_bus = segment_sum(generators[:, GEN["qg"]] * gm, gen_idx, n, method=method)
    v2 = v * v
    delta_p = pg_bus - buses[:, 2] - buses[:, 4] * v2
    delta_q = qg_bus - buses[:, 3] + buses[:, 5] * v2

    dst = lines[:, 1].astype(jnp.int32) - 1
    line_feats = lines[:, 2:7]
    # PV-freeze mask: buses hosting any (real) generator keep their v.
    is_gen = segment_sum(gm, gen_idx, n, method=method) > 0

    bm = bus_mask if bus_mask is not None else None
    lm_col = lm[:, None]

    # Per-step discount weights gamma^(K-k), k = 0..K-1 (main.py:198).
    discounts = cfg.gamma ** (cfg.K - jnp.arange(cfg.K, dtype=f32))

    def residual_sums(dp, dq):
        sq = dp * dp + dq * dq
        if bm is not None:
            sq = sq * bm
        return jnp.sum(sq) / n_real

    def step(carry, xs):
        v, theta, m, delta_p, delta_q, total_loss = carry
        step_params, disc = xs

        edge_in = jnp.concatenate([m[dst], line_feats], axis=1)
        node_base = jnp.concatenate(
            [v[:, None], theta[:, None], delta_p[:, None], delta_q[:, None], m],
            axis=1,
        )

        def agg_phi(name):
            # keep bf16 through the masked aggregation (f32 accumulation on
            # the MXU via preferred_element_type in ops/segment.py)
            out = mlp(step_params[name], edge_in, keep_dtype=True)
            agg = segment_sum(out * lm_col.astype(out.dtype), dst, n, method=method)
            return _psum(agg.astype(jnp.float32))

        if cfg.multiple_phi:
            in_v = jnp.concatenate([node_base, agg_phi("phi_v")], axis=1)
            in_theta = jnp.concatenate([node_base, agg_phi("phi_theta")], axis=1)
            in_m = jnp.concatenate([node_base, agg_phi("phi_m")], axis=1)
        else:
            phi_out = mlp(step_params["phi"], edge_in)
            if cfg.reference_parity:
                # Q1: (E,1) messages write only latent column 0.
                phi_sum = broadcast_col0_segment_sum(
                    phi_out * lm_col, dst, n, latent, method=method
                )
            else:
                # paper-correct: broadcast the scalar message across latent.
                phi_sum = jnp.broadcast_to(
                    _psum(
                        segment_sum(phi_out[:, 0] * lm, dst, n, method=method)
                    )[:, None],
                    (n, latent),
                )
            in_v = in_theta = in_m = jnp.concatenate([node_base, phi_sum], axis=1)

        theta_up = mlp(step_params["L_theta"], in_theta)[:, 0]
        v_up = mlp(step_params["L_v"], in_v)[:, 0]
        m_up = mlp(step_params["L_m"], in_m)

        theta = theta + theta_up
        v = jnp.where(is_gen, v, v + v_up)  # PV freeze (main.py:184-186)
        m = m + m_up

        # fused compensation + imbalance: shared edge messages computed
        # once (physics/fused.py; numerically equal to the unfused pair)
        pg_new, qg_new, delta_p, delta_q = physics_refresh(
            v, theta, buses, lines, generators,
            reference_parity=cfg.reference_parity,
            bus_mask=bm, line_mask=lm, gen_mask=gm, method=method,
            edge_axis=edge_axis,
        )
        total_loss = total_loss + disc * residual_sums(delta_p, delta_q)
        return (v, theta, m, delta_p, delta_q, total_loss), None

    init = (v, theta, m, delta_p, delta_q, jnp.asarray(0.0, f32))

    def finalize(carry) -> GNSOutput:
        v, theta, m, delta_p, delta_q, total_loss = carry
        last_loss = residual_sums(delta_p, delta_q)
        v = jnp.maximum(v, 0.0)  # clamp (main.py:201)
        return GNSOutput(v, theta, total_loss, last_loss, delta_p, delta_q)

    return init, step, finalize, discounts


def gns_forward(
    params,
    cfg: GNSConfig,
    buses,
    lines,
    generators,
    bus_mask: Optional[jnp.ndarray] = None,
    line_mask: Optional[jnp.ndarray] = None,
    gen_mask: Optional[jnp.ndarray] = None,
    n_bus: Optional[jnp.ndarray] = None,
    method: str = "auto",
    precision=None,
    edge_axis: Optional[str] = None,
) -> GNSOutput:
    """Run K correction steps on one grid. Shapes: (N,6), (E,7), (G,7).

    See gns_machinery for the edge_axis (edge-partitioned execution) story.
    """
    init, step, finalize, discounts = gns_machinery(
        cfg, buses, lines, generators, bus_mask, line_mask, gen_mask, n_bus,
        method=method, precision=precision, edge_axis=edge_axis,
    )
    carry, _ = jax.lax.scan(step, init, (params, discounts))
    return finalize(carry)


def gns_forward_batch(params, cfg: GNSConfig, batch, method: str = "auto", precision=None):
    """vmap the forward over a GridBatch -> batched GNSOutput."""
    fn = lambda b, l, g, bm, lm, gm, nb: gns_forward(
        params, cfg, b, l, g, bm, lm, gm, nb, method=method, precision=precision
    )
    return jax.vmap(fn)(
        batch.buses,
        batch.lines,
        batch.generators,
        batch.bus_mask,
        batch.line_mask,
        batch.gen_mask,
        batch.n_bus,
    )
