"""Fused edge-stage Pallas kernel: gather + phi-MLPs + segment-sum.

One kernel performs the whole neural message-passing edge stage of a GNS
correction step (reference: GNS/main.py:155-163) for a batch of grids:

    for each sample s:
      edge_in = concat(m[s][dst], line_feats[s])        # gather
      for head in (phi_v, phi_theta, phi_m):
        out = MLP_head(edge_in) * line_mask[s]          # 3 matmuls + lrelu
        head_sum[s] = onehot(dst) @ out                  # segment-sum

Everything lives in VMEM for the duration of a sample's program: the edge
intermediates (E x (latent+5), 3 x E x latent) never round-trip HBM, unlike
the op-by-op XLA lowering where each matmul output is an HBM tensor. The
gather and the aggregation use the same VMEM-built one-hot incidence
(transposed / untransposed) on the MXU.

The custom VJP recomputes the edge stage with plain jnp ops (rematerialized
backward) — at these sizes recompute is cheaper than saving E-sized
residuals to HBM.

Precision note (verified on a real v5e): compiled Mosaic ignores the
`precision=HIGHEST` request on these dots and truncates f32 operands to
bf16, so the compiled kernel matches the XLA reference only to ~1e-2
relative (interpret mode is exact f32). This kernel is an alternative
lowering, not the production path — the shared-topology one-hot XLA
lowering (ops/segment.py) is both faster and f32-exact; use that for
parity-grade numerics.
"""

from __future__ import annotations

import functools
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gns_tpu.ops.segment import segment_sum

_HEADS = ("phi_v", "phi_theta", "phi_m")


def _lrelu(x, slope):
    return jnp.where(x >= 0, x, slope * x)


def _fused_kernel(slope, n, e, latent,
                  seg_ref, m_ref, feats_ref, mask_ref,
                  *w_refs_and_outs):
    w_refs = w_refs_and_outs[:18]
    out_refs = w_refs_and_outs[18:]
    seg = seg_ref[0, :]  # (E,)

    # gather m[dst]: (E, N) one-hot^T @ m (N, L) on the MXU
    cols = jax.lax.broadcasted_iota(jnp.int32, (e, n), 1)
    onehot_t = (cols == seg[:, None]).astype(jnp.float32)
    gathered = jnp.dot(onehot_t, m_ref[0],
                       preferred_element_type=jnp.float32,
                       precision=jax.lax.Precision.HIGHEST)
    edge_in = jnp.concatenate([gathered, feats_ref[0]], axis=1)  # (E, L+5)

    rows = jax.lax.broadcasted_iota(jnp.int32, (n, e), 0)
    onehot = (rows == seg[None, :]).astype(jnp.float32)
    mask = mask_ref[0]  # (E, 1) — mask ships as (S, E, 1), see _fused_impl

    for h in range(3):
        w1, b1, w2, b2, w4, b4 = w_refs[h * 6:(h + 1) * 6]
        x = _lrelu(
            jnp.dot(edge_in, w1[:], preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST) + b1[0], slope)
        x = _lrelu(
            jnp.dot(x, w2[:], preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST) + b2[0], slope)
        x = jnp.dot(x, w4[:], preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST) + b4[0]
        out_refs[h][0] = jnp.dot(
            onehot, x * mask, preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)


def _weights_list(step_params: Dict):
    ws = []
    for head in _HEADS:
        blk = step_params[head]
        ws += [blk["w1"], blk["b1"][None, :], blk["w2"], blk["b2"][None, :],
               blk["w4"], blk["b4"][None, :]]
    return ws


def _fused_impl(m, feats, line_mask, seg_ids, step_params, slope, interpret):
    s, n, latent = m.shape
    e = seg_ids.shape[0]
    ws = _weights_list(step_params)

    # Mosaic needs the last two block dims divisible by (8, 128) or equal to
    # the full array dims; ship the mask as (S, E, 1) so its per-sample
    # block (1, E, 1) full-matches the trailing dims.
    mask3 = line_mask[..., None]

    const = lambda i: (0, 0)
    in_specs = [
        pl.BlockSpec((1, e), const, memory_space=pltpu.VMEM),        # seg
        pl.BlockSpec((1, n, latent), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, e, feats.shape[-1]), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, e, 1), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
    ] + [pl.BlockSpec(w.shape, const, memory_space=pltpu.VMEM) for w in ws]
    out_specs = tuple(
        pl.BlockSpec((1, n, latent), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
        for _ in range(3)
    )
    kern = functools.partial(_fused_kernel, slope, n, e, latent)
    outs = pl.pallas_call(
        kern,
        grid=(s,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=tuple(
            jax.ShapeDtypeStruct((s, n, latent), jnp.float32) for _ in range(3)
        ),
        interpret=interpret,
    )(seg_ids.astype(jnp.int32)[None, :], m, feats, mask3, *ws)
    return outs


def _xla_reference(m, feats, line_mask, seg_ids, step_params, slope):
    """Plain-jnp twin of the kernel (correctness oracle + VJP recompute)."""
    n = m.shape[1]
    gathered = jnp.take(m, seg_ids, axis=1)  # (S, E, L)
    edge_in = jnp.concatenate([gathered, feats], axis=-1)

    def head(blk):
        x = _lrelu(jnp.einsum("sef,fh->seh", edge_in, blk["w1"]) + blk["b1"], slope)
        x = _lrelu(jnp.einsum("seh,hk->sek", x, blk["w2"]) + blk["b2"], slope)
        x = jnp.einsum("sek,kl->sel", x, blk["w4"]) + blk["b4"]
        x = x * line_mask[..., None]
        return jax.vmap(lambda xx: segment_sum(xx, seg_ids, n, method="onehot"))(x)

    return tuple(head(step_params[h]) for h in _HEADS)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def fused_edge_stage(m, feats, line_mask, seg_ids, step_params,
                     slope: float = 0.01, interpret: bool = False):
    """(phi_v_sum, phi_theta_sum, phi_m_sum), each (S, N, latent).

    m: (S, N, latent); feats: (S, E, F); line_mask: (S, E); seg_ids: (E,)
    shared across the batch; step_params: {phi_v, phi_theta, phi_m} blocks.
    """
    return _fused_impl(m, feats, line_mask, seg_ids, step_params, slope, interpret)


def _fwd(m, feats, line_mask, seg_ids, step_params, slope, interpret):
    out = _fused_impl(m, feats, line_mask, seg_ids, step_params, slope, interpret)
    return out, (m, feats, line_mask, seg_ids, step_params)


def _bwd(slope, interpret, res, g):
    m, feats, line_mask, seg_ids, step_params = res
    _, vjp = jax.vjp(
        lambda mm, ff, lm, sp: _xla_reference(mm, ff, lm, seg_ids, sp, slope),
        m, feats, line_mask, step_params,
    )
    dm, dfeats, dlm, dparams = vjp(g)
    return dm, dfeats, dlm, None, dparams


fused_edge_stage.defvjp(_fwd, _bwd)
