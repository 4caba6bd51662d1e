"""Pallas TPU kernels for edge aggregation.

`pallas_segment_sum`: batched segment-sum (S, E, D) -> (S, N, D) with shared
edge->bus indices. The per-edge destination ids arrive via scalar prefetch
(SMEM) and the one-hot incidence matrix is materialized *in VMEM* with a
broadcasted iota compare — never written to HBM — so per grid-step the
kernel reads the messages once and writes the per-bus sums once. The MXU
does the (N, E) x (E, D) contraction. This is the TPU-native lowering of
torch_scatter.scatter_add (reference: GNS/main.py:2; SURVEY.md §2.5).

Custom VJP: the adjoint of segment-sum is a row gather (out_bar[seg_ids]),
expressed with the same incidence trick (transposed contraction).

Topology note: augmentation perturbs parameters, never topology
(reference: GNS/augment_grids.py:35-53), so one index vector serves the
whole batch — which is what makes scalar prefetch the right mechanism.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _seg_sum_kernel(seg_ref, data_ref, out_ref):
    """One batch element: out (N, D) = onehot(seg) (N,E) @ data (E, D)."""
    n = out_ref.shape[1]
    e = data_ref.shape[1]
    # one-hot incidence built in VMEM: rows = buses, cols = edges.
    rows = jax.lax.broadcasted_iota(jnp.int32, (n, e), 0)
    seg = seg_ref[0, :]  # (E,) int32, VMEM-resident
    onehot = (rows == seg[None, :]).astype(data_ref.dtype)
    # HIGHEST precision: the MXU's default f32 path truncates operands to
    # bf16, costing ~1e-2 absolute error; multi-pass f32 keeps exactness.
    out_ref[0] = jnp.dot(
        onehot, data_ref[0], preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    ).astype(out_ref.dtype)


def _gather_kernel(seg_ref, data_ref, out_ref):
    """Adjoint: out (E, D) = data[seg] = onehot(seg).T (E,N) @ data (N, D)."""
    n = data_ref.shape[1]
    e = out_ref.shape[1]
    cols = jax.lax.broadcasted_iota(jnp.int32, (e, n), 1)
    seg = seg_ref[0, :]
    onehot_t = (cols == seg[:, None]).astype(data_ref.dtype)
    out_ref[0] = jnp.dot(
        onehot_t, data_ref[0], preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    ).astype(out_ref.dtype)


def _batched_call(kernel, data, seg_ids, out_rows, interpret):
    s, _, d = data.shape
    e = seg_ids.shape[0]
    grid_spec = pl.GridSpec(
        grid=(s,),
        in_specs=[
            pl.BlockSpec((1, e), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (1, data.shape[1], d), lambda i: (i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, out_rows, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((s, out_rows, d), data.dtype),
        interpret=interpret,
    )(seg_ids.astype(jnp.int32)[None, :], data)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def pallas_segment_sum(data, segment_ids, num_segments: int, interpret: bool = False):
    """Batched segment-sum on TPU via Pallas.

    data: (E, D) or (S, E, D); segment_ids: (E,) shared across the batch.
    Returns (num_segments, D) or (S, num_segments, D).
    """
    return _fwd_impl(data, segment_ids, num_segments, interpret)


def _fwd_impl(data, segment_ids, num_segments, interpret):
    squeeze = data.ndim == 2
    if squeeze:
        data = data[None]
    out = _batched_call(_seg_sum_kernel, data, segment_ids, num_segments, interpret)
    return out[0] if squeeze else out


def pallas_gather(data, segment_ids, num_edges: int, interpret: bool = False):
    """data[segment_ids] for data (N, D) or (S, N, D) -> (.., E, D)."""
    squeeze = data.ndim == 2
    if squeeze:
        data = data[None]
    out = _batched_call(_gather_kernel, data, segment_ids, num_edges, interpret)
    return out[0] if squeeze else out


def _seg_sum_fwd(data, segment_ids, num_segments, interpret):
    return _fwd_impl(data, segment_ids, num_segments, interpret), (
        segment_ids,
        data.shape,
    )


def _seg_sum_bwd(num_segments, interpret, res, g):
    segment_ids, in_shape = res
    e = in_shape[-2]
    d_data = pallas_gather(g, segment_ids, e, interpret=interpret)
    if len(in_shape) == 2 and d_data.ndim == 3:
        d_data = d_data[0]
    return d_data, None


pallas_segment_sum.defvjp(_seg_sum_fwd, _seg_sum_bwd)
