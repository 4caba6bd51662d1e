"""Device-mesh construction.

The reference has no parallelism at all (SURVEY.md §2.6); this layer is the
framework's distributed-communication backend. Instead of hand-written
transports (NCCL/MPI), the mesh + named shardings express *where* data
lives and XLA inserts the ICI/DCN collectives (psum, all-gather,
all-to-all) during SPMD partitioning — the standard TPU recipe.

Axes:
  dp — data parallel: GridBatch batch dimension, gradient all-reduce.
  gp — graph (edge) partition: the line/edge dimension of big grids; the
       GNN analog of sequence/context parallelism. Edge aggregation
       becomes a sharded contraction with an automatic all-reduce of the
       per-bus partial sums.

For multi-host runs, call `initialize_distributed()` first (wraps
jax.distributed.initialize) and build a hybrid mesh whose outer axis maps
to DCN (hosts) and inner axes to ICI, via jax.make_mesh's device ordering.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh


def make_mesh(
    dp: Optional[int] = None,
    gp: int = 1,
    devices: Optional[Sequence] = None,
    axis_names: Tuple[str, str] = ("dp", "gp"),
) -> Mesh:
    """Build a (dp, gp) mesh over the available devices.

    dp defaults to n_devices // gp. Uses jax.make_mesh when available so
    device order respects the physical ICI topology.
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if dp is None:
        if n % gp:
            raise ValueError(f"{n} devices not divisible by gp={gp}")
        dp = n // gp
    if dp * gp != n:
        raise ValueError(f"mesh {dp}x{gp} != {n} devices")
    # NOTE: jax.make_mesh defaults to Explicit axis types on this JAX
    # version, which breaks implicit sharding propagation through jit;
    # the plain Mesh constructor keeps the classic Auto axes.
    return Mesh(np.array(devices).reshape(dp, gp), axis_names)


def make_hybrid_mesh(
    dcn: Optional[int] = None,
    dp: Optional[int] = None,
    gp: int = 1,
    devices: Optional[Sequence] = None,
    axis_names: Tuple[str, str, str] = ("dcn", "dp", "gp"),
) -> Mesh:
    """Hybrid multi-host mesh: outer 'dcn' axis across hosts, inner
    ('dp', 'gp') axes across each host's chips over ICI.

    Shard the batch over the combined ('dcn', 'dp') axes
    (PartitionSpec(("dcn", "dp"), ...)) so the gradient all-reduce
    decomposes into a cheap intra-host ICI reduce-scatter/all-gather plus
    one small inter-host DCN all-reduce of the (tiny) parameter gradients;
    keep 'gp' (edge partition / boundary exchange) strictly inside a host
    so its per-K-step collectives never cross DCN.

    dcn defaults to jax.process_count(); dp to local chips // gp. On a
    multi-process run the device order groups each process's local chips
    together, which jax.devices() already guarantees.
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if dcn is None:
        dcn = max(jax.process_count(), 1)
    if n % dcn:
        raise ValueError(f"{n} devices not divisible by dcn={dcn}")
    per_host = n // dcn
    if dp is None:
        if per_host % gp:
            raise ValueError(f"{per_host} per-host devices not divisible by gp={gp}")
        dp = per_host // gp
    if dcn * dp * gp != n:
        raise ValueError(f"mesh {dcn}x{dp}x{gp} != {n} devices")
    return Mesh(np.array(devices).reshape(dcn, dp, gp), axis_names)


def initialize_distributed(**kwargs) -> None:
    """Multi-host init (DCN). Call this FIRST on a pod, before anything
    that touches the JAX backend.

    Ordering contract: `jax.distributed.initialize` must run before ANY
    backend-touching call (`jax.devices()`, `jax.process_count()`, array
    creation, ...) — touching the backend first initializes single-process
    JAX, after which distributed init is too late. This helper therefore
    guards on jax.distributed's own client state, never on
    `process_count()` (which both touches the backend and, pre-init,
    reports 1 even on a pod).

    Behavior:
      * already initialized (jax.distributed.is_initialized()) -> no-op,
        so library and launcher may both call this.
      * explicit kwargs (coordinator_address, num_processes, process_id,
        ...) -> initialize with them; failures PROPAGATE (silently falling
        back to a 1-host run on a real pod would be a correctness bug).
      * no kwargs -> auto-detect the cluster environment (TPU pod metadata,
        GKE, Slurm, ...); if NO environment is detected JAX raises
        ValueError("coordinator_address should be defined") and we proceed
        single-process — the right default for local dev. Any OTHER
        failure (cluster detected but coordinator unreachable, timeout)
        PROPAGATES: swallowing it would silently train each host
        independently with no gradient sync.
    """
    is_init = getattr(jax.distributed, "is_initialized", None)
    if is_init is not None and is_init():
        return  # already initialized
    # Fallback guard for JAX versions without is_initialized().
    state = getattr(jax.distributed, "global_state", None)
    if state is not None and getattr(state, "client", None) is not None:
        return
    try:
        jax.distributed.initialize(**kwargs)
    except Exception as e:
        if kwargs:
            raise
        if isinstance(e, ValueError) and "coordinator_address" in str(e):
            return  # no cluster env detected: single-process dev run
        raise
