"""Whole-forward Pallas megakernel: all K correction steps in VMEM.
STATUS: EXPERIMENTAL — correct, but measured SLOWER than the XLA path;
see the verdict below. Kept as a worked, tested artifact of the
investigation, not wired into any production path.

This kernel executes the ENTIRE forward — state init, K x (edge MLP,
aggregation, node MLP, reference-parity physics refresh), loss — for one
grid per program instance, touching HBM only to read the grid (~20 KB),
the shared 0/1 incidences, and the weights. Topology is shared across the
batch (utils.prepare.GridTopology), so every gather/scatter is a plain
row-major matmul against a precomputed incidence.

Precision: MLP matmuls run bf16 with f32 accumulation — identical to the
production `compute_dtype="bfloat16"` serving path. Physics one-hot
contractions of f32 operands split the data into hi+lo bf16 halves (two
MXU passes, exact to ~2^-16 relative), because compiled Mosaic ignores
`precision=HIGHEST` (see pallas_fused.py). Verified on a real v5e:
compiled-kernel-vs-f32 error is SMALLER than the XLA bf16 path's own
error (case14 K=4: 7.7e-4 vs 2.3e-3 max |dv|).

Performance verdict (measured, v5e, case300 K=4, B=1024): the XLA
shared-topology lowering serves 243k grids/s (4.2 ms/batch, ~35% of the
HBM roofline on whole-batch (B*E, .) matmuls); this per-sample kernel
reaches only 16k grids/s (~62 us/grid) because its (411, 25)-sized
per-grid matmuls cannot utilize the 128x128 MXU and the shared-incidence
DMAs (~1.8 MB) re-fetch per program. Beating XLA here would need
batch-tiled matmuls *inside* the kernel (T~64 samples per program with
in-VMEM (T*E, .) reshapes) — re-deriving by hand the schedule XLA already
emits. At these model sizes the whole-batch XLA path is the right
lowering; a megakernel pays off only when per-sample work is large enough
to fill the MXU on its own.

Scope: multiple_phi=True, reference_parity=True (the configuration of
every shipped checkpoint). Forward/inference only.

Reference semantics: GNS/main.py:140-202 (forward), 34-104 (physics);
quirk citations in SURVEY.md §2.2/§2.4.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gns_tpu.utils.schema import GEN

_BF = jnp.bfloat16
_F32 = jnp.float32


def _oh_dot_exact(a_bf, x_f32):
    """0/1-matrix (M,K)bf16 @ (K,D)f32 with hi+lo bf16 split: exact to
    ~2^-16 relative (each product is 1.0 * bf16-half, itself exact)."""
    hi = x_f32.astype(_BF)
    lo = (x_f32 - hi.astype(_F32)).astype(_BF)
    return jnp.dot(a_bf, hi, preferred_element_type=_F32) + jnp.dot(
        a_bf, lo, preferred_element_type=_F32
    )


def _vsum(x):
    """Scalar sum of a 1-D vector via a sublane-axis reduction: Mosaic
    rejects lane-axis multi_reductions on offset-layout vectors (e.g.
    column slices of a (G,7) block) with 'Not implemented: Offset change'.
    """
    return jnp.sum(x[:, None], axis=0)[0]


def _mlp_bf16(x, w1, b1, w2, b2, w4, b4, slope):
    """Fused-head LearningBlock chain in bf16 (f32 accumulation + bias)."""

    def lin(h, w, b):
        out = jnp.dot(h.astype(_BF), w.astype(_BF), preferred_element_type=_F32)
        return out + b.astype(_F32)

    h = lin(x, w1, b1)
    h = jnp.where(h >= 0, h, slope * h)
    h = lin(h, w2, b2)
    h = jnp.where(h >= 0, h, slope * h)
    return lin(h, w4, b4)


def _kernel(
    K, latent, gamma, slope,
    # refs
    Gdst_ref, Gsrc_ref, Qsrc_ref, Qdst_ref, Agen_ref, Adst_ref, Asrc_ref,
    buses_ref, lines_ref, gens_ref, bm_ref, lm_ref, gm_ref,
    pw1, pb1, pw2, pb2, pw4, pb4,      # phi_fused, stacked K
    lw1, lb1, lw2, lb2, lw4, lb4,      # L_fused, stacked K
    v_out, th_out, loss_out, dp_out, dq_out,
):
    buses = buses_ref[0]       # (N, 6)
    lines = lines_ref[0]       # (E, 7)
    gens = gens_ref[0]         # (G, 7)
    bm = bm_ref[0, 0]          # (N,)
    lm = lm_ref[0, 0]          # (E,)
    gm = gm_ref[0, 0]          # (G,)
    n = buses.shape[0]
    e = lines.shape[0]
    g = gens.shape[0]

    # 0/1 incidences: built ONCE outside the kernel (shared topology) and
    # DMA'd as constant blocks; every gather/scatter is a plain row-major
    # matmul (a transposed dot_general would force a Mosaic relayout per
    # call). Gdst/Gsrc (E,N) gather bus->edge; Adst/Asrc (N,E) aggregate
    # edge->bus; Qsrc/Qdst (E,E) are the Q2 line-by-bus-id gathers;
    # Agen (N,G) scatters generators to buses.
    Gdst, Gsrc = Gdst_ref[:], Gsrc_ref[:]
    Qsrc, Qdst = Qsrc_ref[:], Qdst_ref[:]
    Agen = Agen_ref[:]
    Adst, Asrc = Adst_ref[:], Asrc_ref[:]

    # --- line geometry (f32 VPU; reference main.py:38 + prepare) ---
    r, x = lines[:, 2], lines[:, 3]
    z2 = r * r + x * x
    y = 1.0 / jnp.sqrt(z2)
    tau = lines[:, 5]
    shift = lines[:, 6]
    b_chg = lines[:, 4]
    line_feats = lines[:, 2:7]  # (E, 5)

    # K-invariant Q2 gathers of per-line arrays by bus index (exact).
    statq = jnp.stack([y, tau, shift, b_chg], axis=1)  # (E,4)
    s_at_src = _oh_dot_exact(Qsrc, statq)
    s_at_dst = _oh_dot_exact(Qdst, statq)
    y_s, tau_s, sh_s, b_s = (s_at_src[:, i] for i in range(4))
    y_d, tau_d, sh_d, b_d = (s_at_dst[:, i] for i in range(4))

    # --- state init (main.py:141-153) ---
    ginit = jnp.stack(
        [gens[:, GEN["vg"]] * gm, gens[:, GEN["Pg"]] * gm,
         gens[:, GEN["qg"]] * gm, gm], axis=1,
    )  # (G,4)
    agg0 = _oh_dot_exact(Agen, ginit)  # (N,4)
    v = jnp.where(agg0[:, 0] == 0, jnp.ones((n,), _F32), agg0[:, 0])
    is_gen = agg0[:, 3] > 0
    pd, qd, gs, bs = buses[:, 2], buses[:, 3], buses[:, 4], buses[:, 5]
    v2 = v * v
    delta_p = agg0[:, 1] - pd - gs * v2
    delta_q = agg0[:, 2] - qd + bs * v2
    theta = jnp.zeros((n,), _F32)
    m = jnp.zeros((n, latent), _F32)
    n_real = _vsum(bm)

    # lambda-dispatch constants (compensation.py:35-53)
    pg_set = gens[:, GEN["Pg_set"]] * gm
    pmin = gens[:, GEN["Pmin"]] * gm
    pmax = gens[:, GEN["Pmax"]] * gm
    gsums = jnp.sum(jnp.stack([pg_set, pmin, pmax], axis=1), axis=0)  # (3,)
    s_set, s_min, s_max = gsums[0], gsums[1], gsums[2]

    total_loss = jnp.zeros((), _F32)
    lm_col = lm[:, None]
    base = 4 + latent

    for k in range(K):
        # --- edge stage: gather m[dst] (bf16 ok: feeds a bf16 MLP) ---
        m_dst = jnp.dot(Gdst, m.astype(_BF), preferred_element_type=_F32)
        edge_in = jnp.concatenate([m_dst, line_feats], axis=1)  # (E, L+5)
        phi_out = _mlp_bf16(
            edge_in, pw1[k], pb1[k], pw2[k], pb2[k], pw4[k], pb4[k], slope
        )  # (E, 3L)
        agg = _oh_dot_exact(Adst, phi_out * lm_col)  # (N, 3L)

        node_in = jnp.concatenate(
            [v[:, None], theta[:, None], delta_p[:, None], delta_q[:, None],
             m, agg], axis=1,
        )  # (N, base + 3L)
        out = _mlp_bf16(
            node_in, lw1[k], lb1[k], lw2[k], lb2[k], lw4[k], lb4[k], slope
        )  # (N, 2 + L)
        theta = theta + out[:, 0]
        v = jnp.where(is_gen, v, v + out[:, 1])  # PV freeze (main.py:184)
        m = m + out[:, 2:]

        # --- reference-parity physics refresh (physics/fused.py) ---
        v2 = v * v
        vth = jnp.stack([v, theta], axis=1)  # (N,2)
        at_src = _oh_dot_exact(Gsrc, vth)
        at_dst = _oh_dot_exact(Gdst, vth)
        v_s, v_d = at_src[:, 0], at_dst[:, 0]
        th_sd = at_src[:, 1] - at_dst[:, 1]  # (E,) = delta
        # Q2: per-step gathers of the per-line angle array by bus index.
        dpair = _oh_dot_exact(Qsrc, th_sd[:, None])  # delta[src]
        d_s = dpair[:, 0]
        dj_d = -_oh_dot_exact(Qdst, th_sd[:, None])[:, 0]  # (-delta)[dst]

        ang_s = th_sd - d_s - sh_s
        ang_d = -th_sd - dj_d - sh_d
        sin_ds, cos_ds = jnp.sin(d_s), jnp.cos(d_s)
        sin_djd = jnp.sin(dj_d)
        vv_s = v_s * v_d * y_s / tau_s
        vv_d = v_d * v_s * y_d / tau_d

        # NOTE second term uses v_s/tau^2, not (v_s/tau)^2 (author quirk).
        msg_joule = jnp.abs(
            vv_s * (jnp.sin(ang_s) + jnp.sin(-th_sd - d_s + sh_s))
            + (v_s / tau_s**2) * y_s * sin_ds
            + v_d**2 * y_s * sin_ds
        )
        p_joule = _vsum(msg_joule * lm)

        p_from = vv_s * jnp.sin(ang_s) + (v_s / tau_s) ** 2 * y_s * sin_ds
        p_to = vv_d * jnp.sin(ang_d) + v_d**2 * y_d * sin_djd
        q_from = -vv_s * jnp.cos(ang_s) + (v_s / tau_s) ** 2 * (
            y_s * cos_ds - b_s / 2.0
        )
        q_to = -vv_d * jnp.cos(ang_d) + v_d**2 * (y_d * sin_djd - b_d / 2.0)

        from_pair = jnp.stack([p_from, q_from], axis=1) * lm_col  # @ dst
        to_pair = jnp.stack([p_to, q_to], axis=1) * lm_col        # @ src
        agg_dst = _oh_dot_exact(Adst, from_pair)
        agg_src = _oh_dot_exact(Asrc, to_pair)
        p_sum = agg_dst[:, 0] + agg_src[:, 0]
        q_sum = agg_dst[:, 1] + agg_src[:, 1]

        p_global = _vsum(pd * bm + v2 * bm * gs) + p_joule
        lam_lo = (p_global - s_min) / (2.0 * (s_set - s_min))
        lam_hi = (p_global - 2.0 * s_set + s_max) / (2.0 * (s_max - s_set))
        lam = jnp.where(p_global < s_set, lam_lo, lam_hi)
        pg_lo = pmin + 2.0 * (pg_set - pmin) * lam
        pg_hi = 2.0 * pg_set - pmax + 2.0 * (pmax - pg_set) * lam
        pg_new = jnp.where(lam < 0.5, pg_lo, pg_hi) * gm

        qg_new = (qd - bs * v2) - q_sum
        pg_bus = _oh_dot_exact(Agen, pg_new[:, None])[:, 0]
        delta_p = (pg_bus - pd - gs * v2 + p_sum) * bm
        delta_q = ((qg_new - qd + bs * v2) + q_sum) * bm

        disc = gamma ** (K - k)
        total_loss = total_loss + disc * _vsum(
            (delta_p * delta_p + delta_q * delta_q) * bm
        ) / n_real

    last_loss = _vsum((delta_p * delta_p + delta_q * delta_q) * bm) / n_real
    v = jnp.maximum(v, 0.0)  # clamp (main.py:201)

    v_out[0, 0] = v
    th_out[0, 0] = theta
    loss_out[0, 0] = jnp.stack([total_loss, last_loss])
    dp_out[0, 0] = delta_p
    dq_out[0, 0] = delta_q


def megakernel_forward_batch(params, cfg, batch, topo, interpret: bool = False):
    """Run the whole batched forward as one Pallas kernel (grid over
    samples). Requires multiple_phi=True, reference_parity=True, and a
    shared GridTopology. Returns a models.gns.GNSOutput."""
    from gns_tpu.models.gns import GNSOutput, fuse_step_params

    if not (cfg.multiple_phi and cfg.reference_parity):
        raise ValueError(
            "megakernel supports multiple_phi=True + reference_parity=True"
        )
    if topo is None:
        raise ValueError("megakernel requires a shared GridTopology")
    # fold_output off: this kernel consumes the explicit phi output layer
    # (the aggregate-then-project fold lives in the XLA path only).
    fcfg = cfg.replace(fused_heads=True, fold_output="off")
    fp = fuse_step_params(params, fcfg)
    pw, lw = fp["phi_fused"], fp["L_fused"]

    s, n, _ = batch.buses.shape
    e = batch.lines.shape[1]
    g = batch.generators.shape[1]
    latent = cfg.latent_dim

    # Mosaic requires the LAST TWO block dims to be (8,128)-divisible or
    # full-dim matches; 2-D per-sample rows (1, N) violate that, so every
    # vector operand ships as (*, 1, N) with block (1, 1, N).
    const3 = lambda i: (0, 0, 0)
    const2 = lambda i: (0, 0)
    row3 = lambda i: (i, 0, 0)
    vm = pltpu.VMEM

    def w_spec(a):
        idx = const3 if a.ndim == 3 else const2
        return pl.BlockSpec(a.shape, idx, memory_space=vm)

    # Shared 0/1 incidences, built once (bf16: 0/1 exact).
    import numpy as np

    src = np.asarray(topo.src)
    dst = np.asarray(topo.dst)
    gidx = np.asarray(topo.gen_idx)

    def oh(rows_idx, n_cols, transpose=False):
        m = np.zeros((len(rows_idx), n_cols), np.float32)
        # ids are in range by construction (prepare.py routes padding to
        # the dead slot); clip is belt-and-braces only.
        m[np.arange(len(rows_idx)), np.clip(rows_idx, 0, n_cols - 1)] = 1.0
        return jnp.asarray(m.T if transpose else m, _BF)

    Gdst = oh(dst, n)                   # (E,N) gather bus->edge
    Gsrc = oh(src, n)
    Qsrc = oh(src, e)                   # (E,E) Q2 line-by-bus-id gather
    Qdst = oh(dst, e)
    Agen = oh(gidx, n, transpose=True)  # (N,G) gen->bus scatter
    Adst = oh(dst, n, transpose=True)   # (N,E) edge->bus aggregation
    Asrc = oh(src, n, transpose=True)

    inc_specs = [
        w_spec(a) for a in (Gdst, Gsrc, Qsrc, Qdst, Agen, Adst, Asrc)
    ]

    in_specs = inc_specs + [
        pl.BlockSpec((1, n, 6), row3, memory_space=vm),
        pl.BlockSpec((1, e, 7), row3, memory_space=vm),
        pl.BlockSpec((1, g, 7), row3, memory_space=vm),
        pl.BlockSpec((1, 1, n), row3, memory_space=vm),
        pl.BlockSpec((1, 1, e), row3, memory_space=vm),
        pl.BlockSpec((1, 1, g), row3, memory_space=vm),
    ] + [w_spec(a) for a in (pw["w1"], pw["b1"], pw["w2"], pw["b2"], pw["w4"], pw["b4"],
                             lw["w1"], lw["b1"], lw["w2"], lw["b2"], lw["w4"], lw["b4"])]
    out_specs = (
        pl.BlockSpec((1, 1, n), row3, memory_space=vm),
        pl.BlockSpec((1, 1, n), row3, memory_space=vm),
        pl.BlockSpec((1, 1, 2), row3, memory_space=vm),
        pl.BlockSpec((1, 1, n), row3, memory_space=vm),
        pl.BlockSpec((1, 1, n), row3, memory_space=vm),
    )
    out_shape = (
        jax.ShapeDtypeStruct((s, 1, n), _F32),
        jax.ShapeDtypeStruct((s, 1, n), _F32),
        jax.ShapeDtypeStruct((s, 1, 2), _F32),
        jax.ShapeDtypeStruct((s, 1, n), _F32),
        jax.ShapeDtypeStruct((s, 1, n), _F32),
    )
    kern = functools.partial(
        _kernel, cfg.K, latent, float(cfg.gamma), float(cfg.leaky_relu_slope)
    )
    v, theta, losses, dp, dq = pl.pallas_call(
        kern,
        grid=(s,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
    )(
        Gdst, Gsrc, Qsrc, Qdst, Agen, Adst, Asrc,
        batch.buses, batch.lines, batch.generators,
        batch.bus_mask[:, None, :], batch.line_mask[:, None, :],
        batch.gen_mask[:, None, :],
        pw["w1"], pw["b1"], pw["w2"], pw["b2"], pw["w4"], pw["b4"],
        lw["w1"], lw["b1"], lw["w2"], lw["b2"], lw["w4"], lw["b4"],
    )
    return GNSOutput(
        v=v[:, 0], theta=theta[:, 0], total_loss=losses[:, 0, 0],
        last_loss=losses[:, 0, 1], delta_p=dp[:, 0], delta_q=dq[:, 0],
    )
