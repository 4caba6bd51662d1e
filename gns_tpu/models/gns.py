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

from gns_tpu.models.blocks import (
    init_learning_block,
    learning_block_apply,
    learning_block_hidden,
)
from gns_tpu.ops import segment_sum
from gns_tpu.ops.segment import broadcast_col0_segment_sum, gather
from gns_tpu.physics.fused import physics_refresh
from gns_tpu.utils.config import GNSConfig
from gns_tpu.utils.schema import BUS, BUS_TYPE_SLACK, GEN


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
    params = {
        name: stacked_block(k, din, dout) for k, (name, din, dout) in zip(keys, names)
    }
    s = cfg.init_correction_scale
    if s != 1.0:
        if cfg.reference_parity:
            raise ValueError(
                "init_correction_scale requires reference_parity=False "
                "(the reference's init has no such knob)"
            )
        # start near identity: scale the update heads' OUTPUT layers so
        # the per-step corrections begin small (see utils/config.py —
        # deep K stacks on stiff networks have a NaN forward at the
        # torch-default init)
        for name in ("L_theta", "L_v", "L_m"):
            params[name]["w4"] = params[name]["w4"] * s
            params[name]["b4"] = params[name]["b4"] * s
    return params


# Head orders of the fused layout. L_theta consumes phi_theta's aggregate,
# L_v phi_v's, L_m phi_m's (reference: GNS/main.py:165-167).
PHI_HEADS = ("phi_v", "phi_theta", "phi_m")
L_HEADS = ("L_theta", "L_v", "L_m")
_L_TO_PHI_BLOCK = (1, 0, 2)  # phi block index consumed by each L head


def _blockdiag(ws):
    """Stack stacked-K mats (K, a_i, b_i) into (K, sum a_i, sum b_i) block-diag."""
    k = ws[0].shape[0]
    ra = sum(w.shape[1] for w in ws)
    rb = sum(w.shape[2] for w in ws)
    out = jnp.zeros((k, ra, rb), ws[0].dtype)
    ia = ib = 0
    for w in ws:
        out = out.at[:, ia : ia + w.shape[1], ib : ib + w.shape[2]].set(w)
        ia += w.shape[1]
        ib += w.shape[2]
    return out


def fuse_step_params(params, cfg: GNSConfig):
    """Fold the per-head MLPs into single block MLPs per step.

    The three phi heads see the *same* edge input (main.py:155-159), so
    their first layers concatenate exactly into one (in, 3H) matmul; the
    hidden and output layers become block-diagonal. Likewise the three L
    heads: their inputs share node_base and differ only in which phi
    aggregate they append (main.py:165-167), which block-structures their
    first layer over the fused input [node_base | phi_v | phi_theta |
    phi_m]. Output columns: [theta_up, v_up, m_up(latent)]. The three phi
    segment-sums also collapse into one (E, 3L) aggregation.

    Zero off-diagonal blocks contribute exact +0.0 to each dot product, so
    this is numerically identical to the unfused path up to float
    reassociation of the (longer) contractions. Stored/optimized parameters
    keep the reference's per-head layout (torch interop, TP shardings);
    fusion happens on the fly inside the forward trace.

    With cfg.resolved_fold_output (aggregate-then-project; see
    utils/config.py), the fused phi's OUTPUT layer is additionally folded
    into the fused L's first layer: the aggregation is linear, so
        agg((H2 @ W4phi + b4phi) * mask) @ W1a
          == agg(H2 * mask) @ (W4phi @ W1a) + deg * (b4phi @ W1a)
    where W1a is the L first layer's aggregate-input block and deg the
    masked in-degree. The returned dict then has "phi_hidden" (layers 1-2
    only) instead of "phi_fused", and L_fused.w1 has shape
    (K, base + 3*hidden + 1, 3*hidden) — the +1 row is deg's weight,
    b4phi @ W1a. The E-row output matmul disappears and the edge
    aggregation narrows from 3*latent to 3*hidden.
    """
    if not cfg.fused_heads:
        return params
    lat, hid = cfg.latent_dim, cfg.hidden_dim
    base = 4 + lat  # node_base width: v, theta, delta_p, delta_q, m
    fold = cfg.resolved_fold_output and cfg.multiple_phi
    cat = jnp.concatenate
    fused = {}
    if cfg.multiple_phi:
        ps = [params[h] for h in PHI_HEADS]
        phi = {
            "w1": cat([p["w1"] for p in ps], axis=2),
            "b1": cat([p["b1"] for p in ps], axis=1),
            "w2": _blockdiag([p["w2"] for p in ps]),
            "b2": cat([p["b2"] for p in ps], axis=1),
        }
        phi_w4 = _blockdiag([p["w4"] for p in ps])  # (K, 3H, 3L)
        phi_b4 = cat([p["b4"] for p in ps], axis=1)  # (K, 3L)
        if fold:
            fused["phi_hidden"] = phi
        else:
            fused["phi_fused"] = dict(phi, w4=phi_w4, b4=phi_b4)
    else:
        fused["phi"] = params["phi"]
    ls = [params[h] for h in L_HEADS]
    if cfg.multiple_phi:
        k = ls[0]["w1"].shape[0]
        w1 = jnp.zeros((k, base + 3 * lat, 3 * hid), ls[0]["w1"].dtype)
        for i, (p, blk) in enumerate(zip(ls, _L_TO_PHI_BLOCK)):
            cols = slice(i * hid, (i + 1) * hid)
            w1 = w1.at[:, :base, cols].set(p["w1"][:, :base])
            w1 = w1.at[:, base + blk * lat : base + (blk + 1) * lat, cols].set(
                p["w1"][:, base:]
            )
        if fold:
            w1a = w1[:, base:]  # (K, 3L, 3H) aggregate-input block
            # HIGHEST: these tiny products define the folded weights; the
            # default matmul precision (bf16 passes on TPU and on XLA:CPU)
            # would silently degrade the float32 path.
            hp = jax.lax.Precision.HIGHEST
            w1 = cat(
                [
                    w1[:, :base],
                    jnp.einsum("khl,kli->khi", phi_w4, w1a, precision=hp),
                    jnp.einsum("kl,kli->ki", phi_b4, w1a, precision=hp)[
                        :, None, :
                    ],  # deg feature row (carries b4phi)
                ],
                axis=1,
            )
    else:
        # single-phi: all three L heads share the identical input.
        w1 = cat([p["w1"] for p in ls], axis=2)
    fused["L_fused"] = {
        "w1": w1,
        "b1": cat([p["b1"] for p in ls], axis=1),
        "w2": _blockdiag([p["w2"] for p in ls]),
        "b2": cat([p["b2"] for p in ls], axis=1),
        "w4": _blockdiag([p["w4"] for p in ls]),  # cols [theta, v, m...]
        "b4": cat([p["b4"] for p in ls], axis=1),
    }
    return fused


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
    topo=None,
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

    topo: optional utils.prepare.GridTopology of batch-invariant
    (src, dst, gen_idx) index arrays. Under vmap they stay unbatched, so
    one-hot incidence matrices are built once per program ((N, E) instead
    of (B, N, E)) and every aggregation lowers to one large MXU
    contraction over the whole batch.
    """
    if edge_axis is not None and cfg.reference_parity:
        raise ValueError("edge-partitioned execution requires reference_parity=False")
    if cfg.reference_parity and (
        cfg.qg_gen_only or cfg.dispatch != "lambda" or cfg.slack_anchor
        or cfg.v_anchor or cfg.true_shunts or cfg.admittance_inputs
    ):
        raise ValueError(
            "qg_gen_only / dispatch='setpoint_slack' / slack_anchor / "
            "v_anchor / true_shunts / admittance_inputs are paper-mode "
            "options: set reference_parity=False (utils/config.py)"
        )

    def _psum(x):
        return jax.lax.psum(x, edge_axis) if edge_axis is not None else x

    # Mixed precision: run the MLPs in compute_dtype (bf16 on the MXU),
    # keep state/physics in float32.
    cdt = jnp.dtype(cfg.compute_dtype)

    def mlp(block_params, x, keep_dtype: bool = False, hidden_only: bool = False):
        prec = precision
        if prec is None and cdt == jnp.float32:
            # float32 must mean float32: the TPU MXU's default matmul
            # precision truncates f32 operands to bf16, which breaks
            # activation parity vs the reference (~1e-3 v error over K
            # steps). bf16 compute_dtype keeps the fast single-pass path.
            prec = jax.lax.Precision.HIGHEST
        if cdt != x.dtype:
            block_params = jax.tree.map(lambda p: p.astype(cdt), block_params)
            x = x.astype(cdt)
        apply = learning_block_hidden if hidden_only else learning_block_apply
        out = apply(block_params, x, cfg.leaky_relu_slope, prec)
        if keep_dtype or cdt == jnp.float32:
            return out
        return out.astype(jnp.float32)
    n = buses.shape[0]
    latent = cfg.latent_dim
    f32 = buses.dtype

    gen_idx = (
        generators[:, GEN["bus_i"]].astype(jnp.int32) - 1
        if topo is None
        else topo.gen_idx
    )
    # None masks = dense batch (no padding): every mask multiply and mask
    # HBM read is skipped — exact, since x*1 == x and n_real == N.
    gm = gen_mask
    lm = line_mask
    n_real = (
        jnp.asarray(n, f32) if n_bus is None else jnp.asarray(n_bus, f32)
    )

    # --- state init (main.py:141-153) ---
    m = jnp.zeros((n, latent), f32)
    theta = jnp.zeros((n,), f32)
    # One (G,4) aggregation for vg/Pg/qg/gen-count instead of four scatters.
    # Q3: co-located generators *sum* their vg set-points.
    # (init runs once, outside the K scan — the ones-multiply is free)
    gm_or_ones = gm if gm is not None else jnp.ones(generators.shape[0], f32)
    agg0 = segment_sum(
        jnp.stack(
            [
                generators[:, GEN["vg"]] * gm_or_ones,
                generators[:, GEN["Pg"]] * gm_or_ones,
                generators[:, GEN["qg"]] * gm_or_ones,
                gm_or_ones,
            ],
            axis=1,
        ),
        gen_idx,
        n,
        method=method,
    )
    v, pg_bus, qg_bus = agg0[:, 0], agg0[:, 1], agg0[:, 2]
    v = jnp.where(v == 0, jnp.ones_like(v), v)
    v2 = v * v
    delta_p = pg_bus - buses[:, 2] - buses[:, 4] * v2
    delta_q = qg_bus - buses[:, 3] + buses[:, 5] * v2

    dst = lines[:, 1].astype(jnp.int32) - 1 if topo is None else topo.dst
    line_feats = lines[:, 2:7]
    if cfg.admittance_inputs:
        # paper-mode message representation in admittance space: an
        # out-of-service line (encoded r=x=1e6) becomes a well-scaled 0
        # instead of an off-distribution huge impedance (utils/config.py)
        r_l, x_l = lines[:, 2], lines[:, 3]
        denom = r_l * r_l + x_l * x_l
        line_feats = jnp.stack(
            [r_l / denom, -x_l / denom, lines[:, 4], lines[:, 5],
             lines[:, 6]], axis=1,
        )
    # PV-freeze mask: buses hosting any (real) generator keep their v.
    is_gen = agg0[:, 3] > 0

    # Step-invariant masks for the paper-mode physics conventions.
    gen_bus_mask = is_gen.astype(f32) if cfg.qg_gen_only else None
    slack_mask = None
    if cfg.dispatch == "setpoint_slack":
        slack_mask = (buses[:, BUS["type"]] == BUS_TYPE_SLACK).astype(f32)
        # keep the delta_p input feature consistent with the residual
        delta_p = delta_p * (1.0 - slack_mask)

    bm = bus_mask if bus_mask is not None else None
    # Slack-anchor gauge regularizer (paper mode; see utils/config.py).
    anchor_mask = None
    if cfg.slack_anchor:
        anchor_mask = (buses[:, BUS["type"]] == BUS_TYPE_SLACK).astype(f32)
        if bm is not None:
            anchor_mask = anchor_mask * bm
    # High-voltage-branch tie-breaker on the free (non-generator) buses
    # (paper mode; see utils/config.py v_anchor).
    v_anchor_mask = None
    if cfg.v_anchor:
        v_anchor_mask = 1.0 - is_gen.astype(f32)
        if bm is not None:
            v_anchor_mask = v_anchor_mask * bm
    lm_col = lm[:, None] if lm is not None else None

    def line_masked(x):
        """Apply the line mask to an (E, D) edge tensor; identity when the
        batch is dense (mask multiplies cost real HBM traffic per K-step)."""
        return x if lm_col is None else x * lm_col.astype(x.dtype)
    # Gather lowering (ops/segment.py): 'hybrid' (take forward, custom
    # one-hot-matmul VJP) dominates on TPU — it keeps the forward a cheap
    # copy AND the backward scatter-free, which the old take/onehot
    # trade-off ('take' fast forward but scatter VJP; 'onehot' matmul both
    # ways) could only pick between. Measured at the headline train
    # config: 1.16 (hybrid) vs 1.41 (take) vs 1.43 (onehot) ms/step.
    gmethod = cfg.gather_method
    if gmethod == "auto":
        gmethod = "hybrid" if jax.default_backend() == "tpu" else "take"

    # Per-step discount weights gamma^(K-k), k = 0..K-1 (main.py:198).
    discounts = cfg.gamma ** (cfg.K - jnp.arange(cfg.K, dtype=f32))

    # Masked in-degree for the aggregate-then-project fold (the deg feature
    # carrying b4phi @ W1a; see fuse_step_params). Step-invariant.
    deg_col = None
    if cfg.resolved_fold_output and cfg.multiple_phi and cfg.fused_heads:
        deg_lm = lm if lm is not None else jnp.ones(lines.shape[0], f32)
        deg_col = _psum(segment_sum(deg_lm, dst, n, method=method))[:, None]

    def residual_sums(dp, dq):
        sq = dp * dp + dq * dq
        if bm is not None:
            sq = sq * bm
        return jnp.sum(sq) / n_real

    def step(carry, xs):
        v, theta, m, delta_p, delta_q, total_loss = carry
        step_params, disc = xs
        fused = "L_fused" in step_params

        # gather via one-hot matmul on TPU so the VJP stays scatter-free
        # (a take VJP lowers to XLA scatter — 6x slower backward, measured)
        edge_in = jnp.concatenate([gather(m, dst, method=gmethod), line_feats], axis=1)
        node_base = jnp.concatenate(
            [v[:, None], theta[:, None], delta_p[:, None], delta_q[:, None], m],
            axis=1,
        )

        def single_phi_sum():
            phi_out = mlp(step_params["phi"], edge_in)
            if cfg.reference_parity:
                # Q1: (E,1) messages write only latent column 0.
                return broadcast_col0_segment_sum(
                    line_masked(phi_out), dst, n, latent, method=method
                )
            # paper-correct: broadcast the scalar message across latent.
            return jnp.broadcast_to(
                _psum(segment_sum(line_masked(phi_out)[:, 0], dst, n, method=method))[
                    :, None
                ],
                (n, latent),
            )

        if fused:
            # Block MLPs from fuse_step_params: one edge matmul chain, ONE
            # edge aggregation, one node matmul chain.
            if "phi_hidden" in step_params:
                # aggregate-then-project fold: aggregate the (E, 3H) hidden
                # activation; phi's output projection lives inside
                # L_fused.w1, with the in-degree column carrying b4phi.
                h2 = mlp(step_params["phi_hidden"], edge_in, keep_dtype=True,
                         hidden_only=True)
                agg = segment_sum(line_masked(h2), dst, n, method=method)
                node_in = jnp.concatenate(
                    [node_base, _psum(agg.astype(jnp.float32)), deg_col],
                    axis=1,
                )
            elif cfg.multiple_phi:
                phi_out = mlp(step_params["phi_fused"], edge_in, keep_dtype=True)
                agg = segment_sum(line_masked(phi_out), dst, n, method=method)
                node_in = jnp.concatenate(
                    [node_base, _psum(agg.astype(jnp.float32))], axis=1
                )
            else:
                node_in = jnp.concatenate([node_base, single_phi_sum()], axis=1)
            out = mlp(step_params["L_fused"], node_in)
            theta_up, v_up, m_up = out[:, 0], out[:, 1], out[:, 2:]
        else:

            def agg_phi(name):
                # keep bf16 through the masked aggregation (f32 accumulation
                # on the MXU via preferred_element_type in ops/segment.py)
                out = mlp(step_params[name], edge_in, keep_dtype=True)
                agg = segment_sum(line_masked(out), dst, n, method=method)
                return _psum(agg.astype(jnp.float32))

            if cfg.multiple_phi:
                in_v = jnp.concatenate([node_base, agg_phi("phi_v")], axis=1)
                in_theta = jnp.concatenate([node_base, agg_phi("phi_theta")], axis=1)
                in_m = jnp.concatenate([node_base, agg_phi("phi_m")], axis=1)
            else:
                in_v = in_theta = in_m = jnp.concatenate(
                    [node_base, single_phi_sum()], axis=1
                )

            theta_up = mlp(step_params["L_theta"], in_theta)[:, 0]
            v_up = mlp(step_params["L_v"], in_v)[:, 0]
            m_up = mlp(step_params["L_m"], in_m)

        theta = theta + theta_up
        v = jnp.where(is_gen, v, v + v_up)  # PV freeze (main.py:184-186)
        m = m + m_up

        # fused compensation + imbalance: shared edge messages computed
        # once (physics/fused.py; numerically equal to the unfused pair).
        # (Selectively rematerializing just this chain was measured 8%
        # SLOWER at the headline config — XLA already schedules the trig
        # residuals well; see ROADMAP.md.)
        pg_new, qg_new, delta_p, delta_q = physics_refresh(
            v, theta, buses, lines, generators,
            reference_parity=cfg.reference_parity,
            bus_mask=bm, line_mask=lm, gen_mask=gm, method=method,
            edge_axis=edge_axis, topo=topo, gather_method=gmethod,
            qg_gen_only=cfg.qg_gen_only, dispatch=cfg.dispatch,
            gen_bus_mask=gen_bus_mask, slack_mask=slack_mask,
        )
        step_loss = residual_sums(delta_p, delta_q)
        if anchor_mask is not None:
            step_loss = step_loss + cfg.slack_anchor * jnp.sum(
                anchor_mask * theta * theta
            ) / n_real
        if v_anchor_mask is not None:
            dv = v - 1.0
            step_loss = step_loss + cfg.v_anchor * jnp.sum(
                v_anchor_mask * dv * dv
            ) / n_real
        total_loss = total_loss + disc * step_loss
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
    topo=None,
) -> GNSOutput:
    """Run K correction steps on one grid. Shapes: (N,6), (E,7), (G,7).

    See gns_machinery for the edge_axis (edge-partitioned execution) and
    topo (shared-topology fast path) stories.
    """
    init, step, finalize, discounts = gns_machinery(
        cfg, buses, lines, generators, bus_mask, line_mask, gen_mask, n_bus,
        method=method, precision=precision, edge_axis=edge_axis, topo=topo,
    )
    if cfg.resolved_remat:
        step = jax.checkpoint(step)
    carry, _ = jax.lax.scan(
        step,
        init,
        (fuse_step_params(params, cfg), discounts),
        unroll=cfg.resolved_scan_unroll,
    )
    return finalize(carry)


def gns_forward_batch(
    params, cfg: GNSConfig, batch, method: str = "auto", precision=None,
    topo=None, dense: bool = False,
):
    """vmap the forward over a GridBatch -> batched GNSOutput.

    topo (utils.prepare.GridTopology): batch-invariant index arrays, closed
    over as vmap constants — see gns_machinery. Use
    utils.prepare.extract_shared_topology(batch) on host data to obtain it.

    dense: the batch is unpadded (GridBatch.is_dense() on host data) — the
    mask fields are ignored entirely, eliminating every per-K-step mask
    multiply and the masks' HBM traffic. Exact for unpadded batches.
    """
    if dense:
        fn = lambda b, l, g: gns_forward(
            params, cfg, b, l, g,
            method=method, precision=precision, topo=topo,
        )
        return jax.vmap(fn)(batch.buses, batch.lines, batch.generators)
    fn = lambda b, l, g, bm, lm, gm, nb: gns_forward(
        params, cfg, b, l, g, bm, lm, gm, nb,
        method=method, precision=precision, topo=topo,
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
