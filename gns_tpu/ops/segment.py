"""Edge aggregation primitives: segment-sum (scatter-add) and gather.

The reference's only native-code dependency is `torch_scatter.scatter_add`
(reference: GNS/main.py:2 and ~14 call sites, SURVEY.md §2.5). On TPU the
same contraction has three natural lowerings, all provided here:

  * 'scatter'  — `jax.ops.segment_sum`: XLA scatter-add. Exact reference
                 semantics; best on CPU and the correctness oracle for the
                 other paths.
  * 'onehot'   — one-hot incidence matmul: `A[n,e] @ data[e,d]` on the MXU.
                 Grid topologies here are small (E<=411) and fixed per case,
                 so the one-hot matrix folds into a single fused matmul per
                 step — the idiomatic dense-hardware lowering for sparse GNN
                 aggregation on TPUs.
  * 'pallas'   — hand-written Pallas TPU kernel (gns_tpu.ops.pallas_segment)
                 for large batched aggregations.

All paths are differentiable (the VJP of segment-sum is gather and vice
versa; XLA derives it for 'scatter'/'onehot', the Pallas path defines a
custom VJP).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def incidence_matrix(segment_ids, num_segments: int, dtype=jnp.float32):
    """Dense one-hot incidence matrix A with A[n, e] = 1 iff segment_ids[e]==n.

    Out-of-range ids (used for masked/padded edges) produce all-zero columns,
    matching segment_sum's drop semantics.
    """
    return jax.nn.one_hot(segment_ids, num_segments, dtype=dtype, axis=0)


def _onehot_matmul(mat, data, acc_dtype):
    """mat @ data with the 0/1-matrix precision policy: float32 data needs
    HIGHEST (multi-pass) or the MXU truncates operands to bf16; bf16 data
    takes the fast single-pass path with `acc_dtype` accumulation."""
    squeeze = data.ndim == 1
    if squeeze:
        data = data[:, None]
    if data.dtype == jnp.float32:
        out = jnp.matmul(mat, data, precision=jax.lax.Precision.HIGHEST)
    else:
        out = jnp.matmul(mat, data, preferred_element_type=acc_dtype)
    return out[:, 0] if squeeze else out


def _onehot_segment_sum(data, segment_ids, num_segments):
    a = incidence_matrix(segment_ids, num_segments, dtype=data.dtype)
    # f32 accumulation keeps bf16-message sums accurate.
    return _onehot_matmul(a, data, jnp.float32)


@partial(jax.custom_vjp, nondiff_argnums=(2,))
def _segment_sum_hybrid(data, segment_ids, num_segments):
    return _onehot_segment_sum(data, segment_ids, num_segments)


def _segsum_hybrid_fwd(data, segment_ids, num_segments):
    out = _onehot_segment_sum(data, segment_ids, num_segments)
    # zero-length dtype token: residuals must be JAX types, not dtypes
    return out, (segment_ids, jnp.zeros((0,), data.dtype))


def _segsum_hybrid_bwd(num_segments, res, ct):
    # VJP of segment-sum is a row gather; jnp.take is a copy (cheap, no
    # N*E contraction) and appears only in the backward, where the forward
    # matmul already paid the MXU cost. The cotangent arrives in the f32
    # accumulation dtype; the primal's cotangent must match its dtype.
    segment_ids, token = res
    return jnp.take(ct, segment_ids, axis=0).astype(token.dtype), None


_segment_sum_hybrid.defvjp(_segsum_hybrid_fwd, _segsum_hybrid_bwd)


@partial(jax.custom_vjp, nondiff_argnums=(2,))
def _gather_hybrid(data, indices, num_rows):
    return jnp.take(data, indices, axis=0)


def _gather_hybrid_fwd(data, indices, num_rows):
    return jnp.take(data, indices, axis=0), (indices, jnp.zeros((0,), data.dtype))


def _gather_hybrid_bwd(num_rows, res, ct):
    # VJP of gather is a segment-sum; the one-hot matmul keeps it
    # scatter-free (an XLA scatter-add serializes on TPU).
    indices, token = res
    squeeze = ct.ndim == 1
    out = _onehot_segment_sum(ct[:, None] if squeeze else ct, indices, num_rows)
    return (out[:, 0] if squeeze else out).astype(token.dtype), None


_gather_hybrid.defvjp(_gather_hybrid_fwd, _gather_hybrid_bwd)


def segment_sum(
    data,
    segment_ids,
    num_segments: int,
    method: str = "auto",
):
    """Sum `data` rows into `num_segments` buckets keyed by `segment_ids`.

    data: (E,) or (E, D); segment_ids: (E,) int. Returns (num_segments,) or
    (num_segments, D). Drop-in for torch_scatter.scatter_add with a
    zero-initialized `out` (reference: GNS/main.py:42 et al.).

    method 'hybrid': one-hot matmul forward with a custom VJP whose
    backward is a plain row gather (take) instead of the transposed
    matmul — same values, half the MXU contractions per fwd+bwd pair.
    Auto picks it on TPU: measured 1.16 vs 1.41 ms/step at the headline
    train config together with gather 'hybrid'.
    """
    if method == "auto":
        method = "hybrid" if jax.default_backend() == "tpu" else "scatter"
    if method == "scatter":
        return jax.ops.segment_sum(data, segment_ids, num_segments=num_segments)
    if method == "onehot":
        return _onehot_segment_sum(data, segment_ids, num_segments)
    if method == "hybrid":
        return _segment_sum_hybrid(data, segment_ids, num_segments)
    if method == "pallas":
        from gns_tpu.ops.pallas_segment import pallas_segment_sum

        return pallas_segment_sum(data, segment_ids, num_segments)
    raise ValueError(f"unknown segment_sum method {method!r}")


def gather(data, indices, method: str = "take"):
    """Row gather `data[indices]` (the transpose of segment_sum).

    method:
      * 'take'   — jnp.take. Fast forward, but its VJP lowers to an XLA
                   scatter-add, which serializes on TPU — measured 6x
                   slower backward than forward on the train step.
      * 'onehot' — G(E, N) @ data with G[e, indices[e]] = 1: an MXU matmul
                   whose VJP is the transposed matmul (the segment-sum),
                   keeping the backward pass scatter-free. The incidence is
                   shared with the forward aggregation's one-hot (XLA CSEs
                   the transpose), so it costs no extra HBM.
      * 'hybrid' — take forward, one-hot-matmul backward (custom VJP):
                   the copy stays cheap and the VJP stays scatter-free.
                   Dominates both on TPU (the scatter problem is exactly
                   what 'onehot' solved, without paying a forward matmul).
      * 'auto'   — hybrid on TPU, take elsewhere.

    Out-of-range indices clamp under 'take'/'hybrid' (jnp.take default
    mode under jit) and produce zero rows under 'onehot'; both are only
    reachable for masked padding whose contribution is zeroed anyway.
    """
    if method == "auto":
        method = "hybrid" if jax.default_backend() == "tpu" else "take"
    if method == "hybrid":
        return _gather_hybrid(data, indices, data.shape[0])
    if method != "onehot":
        return jnp.take(data, indices, axis=0)
    g = jax.nn.one_hot(indices, data.shape[0], dtype=data.dtype, axis=-1)
    # each output row copies exactly one input row, so accumulate in the
    # data's own dtype (no sum to protect).
    return _onehot_matmul(g, data, data.dtype)


def _degree_slots(segment_ids, num_segments: int):
    """Host-side slot tables for the degree-slot segment sum.

    slots[d, n] = index of segment n's d-th member row (last row as an
    in-range dummy for empty slots), valid[d, n] = 1.0 iff filled. d ranges over the
    maximum segment size (the graph's max in-degree — <= 9 on the MATPOWER
    cases). Slot order follows row order, matching the sequential
    accumulation order of scatter-add.
    """
    import numpy as np

    ids = np.asarray(segment_ids)
    e = ids.shape[0]
    counts = np.bincount(ids, minlength=num_segments)
    dmax = max(int(counts.max()) if e else 1, 1)
    # dummy = last row (in range: jnp.take's out-of-jit default fills with
    # NaN for out-of-range indices, and NaN * 0.0 poisons the masked sum)
    slots = np.full((dmax, num_segments), max(e - 1, 0), np.int32)
    valid = np.zeros((dmax, num_segments), np.float32)
    pos = np.zeros(num_segments, np.int64)
    for row, n in enumerate(ids):
        slots[pos[n], n] = row
        valid[pos[n], n] = 1.0
        pos[n] += 1
    return slots, valid


def make_degree_segment_sum(segment_ids, num_segments: int):
    """Build a segment-sum for a STATIC (host-known) segment map as a
    degree-slot take-tree: out[n] = sum_d data[slots[d, n]] * valid[d, n].

    No matmul in either direction — max_degree row gathers + adds forward
    (exact in the data dtype, bandwidth-bound) and one row gather backward
    (custom VJP: d_data[e] = ct[segment_ids[e]]). This beats the one-hot
    lowering for narrow float32 operands, where the 0/1 matmul needs the
    6-pass HIGHEST path (the TPU MXU truncates f32 to bf16): the physics
    refresh's (E, 2) mismatch sums are the motivating case.

    segment_ids must be a concrete (numpy) array — shared-topology only.
    """
    slots, valid = _degree_slots(segment_ids, num_segments)
    ids = segment_ids

    @jax.custom_vjp
    def f(data):
        squeeze = data.ndim == 1
        x = data[:, None] if squeeze else data
        out = None
        for d in range(slots.shape[0]):
            t = jnp.take(x, slots[d], axis=0) * valid[d][:, None].astype(x.dtype)
            out = t if out is None else out + t
        return out[:, 0] if squeeze else out

    def fwd(data):
        return f(data), (data.ndim == 1, jnp.zeros((0,), data.dtype))

    def bwd(res, ct):
        squeeze, token = res
        g = jnp.take(ct, ids, axis=0)
        return (g.astype(token.dtype),)

    f.defvjp(fwd, bwd)
    return f


def broadcast_col0_segment_sum(data_col, segment_ids, num_segments, latent_dim, method="auto"):
    """Reference quirk Q1: scatter an (E, 1) message into an (N, latent) buffer.

    torch_scatter broadcasts the index to the *source's* shape, so only
    latent column 0 is ever written; columns 1.. stay zero
    (reference: GNS/main.py:169-170, verified in SURVEY.md §2.4-Q1).
    """
    col0 = segment_sum(data_col[:, 0], segment_ids, num_segments, method=method)
    out = jnp.zeros((num_segments, latent_dim), dtype=data_col.dtype)
    return out.at[:, 0].set(col0)
