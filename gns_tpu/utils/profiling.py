"""Profiling & observability.

The reference's only instrumentation is perf_counter around inference and a
broken total-time logger (reference: GNS/evaluate.py:33-36, GNS/main.py:316-318).
Here: jax.profiler trace capture (XProf/Perfetto), a step timer, a roofline
estimator for the training step, and NaN-guard helpers.
"""

from __future__ import annotations

import contextlib
import time
from dataclasses import dataclass
from typing import Optional

import jax

# TPU v5e (v5 lite) per-chip peaks, used for speed-of-light estimates.
TPU_V5E_PEAK_BF16_TFLOPS = 197.0
TPU_V5E_PEAK_F32_TFLOPS = 49.0  # bf16 MXU with f32 3-pass ~ 1/4 of bf16
TPU_V5E_HBM_GBPS = 819.0


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/gns_trace"):
    """Capture a profiler trace viewable in XProf/Perfetto/TensorBoard."""
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


def time_step(fn, *args, iters: int = 10, warmup: int = 2) -> float:
    """Mean wall seconds per call of a jitted step (blocks on last output)."""
    out = None
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


@dataclass
class Roofline:
    flops: float  # per step
    hbm_bytes: float  # per step
    sec: float  # measured

    @property
    def achieved_tflops(self) -> float:
        return self.flops / self.sec / 1e12

    @property
    def achieved_gbps(self) -> float:
        return self.hbm_bytes / self.sec / 1e9

    @property
    def hbm_bound_frac(self) -> float:
        """Fraction of HBM speed-of-light achieved (v5e)."""
        return self.achieved_gbps / TPU_V5E_HBM_GBPS

    @property
    def mfu_bf16(self) -> float:
        """Model FLOP utilization against the v5e bf16 MXU peak."""
        return self.achieved_tflops / TPU_V5E_PEAK_BF16_TFLOPS

    def summary(self) -> str:
        return (
            f"{self.sec*1e6:.0f} us/step | {self.achieved_tflops:.2f} TFLOP/s | "
            f"{self.achieved_gbps:.0f} GB/s HBM ({self.hbm_bound_frac*100:.0f}% of v5e peak)"
        )


def train_step_roofline(cfg, batch, sec: float, fwd_only: bool = False) -> Roofline:
    """Analytic FLOP/byte estimate of one GNS train step on `batch`.

    Counts the dominated terms: per-K-step MLP matmuls on E and N rows, the
    one-hot aggregation contraction, and trig physics messages; backward
    counted as 2x forward matmul FLOPs (standard estimate).
    """
    s, n, _ = batch.buses.shape
    e = batch.lines.shape[1]
    L, H, K = cfg.latent_dim, cfg.hidden_dim, cfg.K
    phi_in, upd_in = cfg.phi_in_dim, cfg.update_in_dim

    mlp = lambda rows, din, dout: 2 * rows * (din * H + H * H + H * dout)
    n_phi = 3 if cfg.multiple_phi else 1
    if cfg.resolved_fold_output and cfg.multiple_phi and cfg.fused_heads:
        # aggregate-then-project fold: phi runs layers 1-2 only (fused
        # trio width 3H), the aggregation is (N,E)@(E,3H), and L's first
        # layer consumes [base | agg3H | deg] (see models/gns.py).
        h3 = 3 * H
        base = 4 + L
        phi_flops = 2 * e * (phi_in * h3 + h3 * h3)
        upd_flops = 2 * n * ((base + h3 + 1) * h3 + h3 * h3 + h3 * (2 + L))
        agg_flops = 2 * n * e * h3
    else:
        phi_flops = n_phi * mlp(e, phi_in, L if cfg.multiple_phi else 1)
        upd_flops = mlp(n, upd_in, 1) * 2 + mlp(n, upd_in, L)
        agg_flops = n_phi * 2 * n * e * L  # one-hot contraction
    trig_flops = 40 * e  # physics messages, ~10 trig ops x amortized cost
    step_flops = (phi_flops + upd_flops + agg_flops + trig_flops) * K * s
    total_flops = step_flops * (1 if fwd_only else 3)

    state_bytes = 4 * s * (n * (6 + 2 + L) + e * 7 + batch.generators.shape[1] * 7)
    hbm = state_bytes * K * (1 if fwd_only else 2)  # rough per-step traffic
    return Roofline(flops=float(total_flops), hbm_bytes=float(hbm), sec=sec)


def assert_finite(tree, name: str = "tree") -> None:
    """Raise if any leaf contains NaN/Inf (host-side check)."""
    import numpy as np

    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        a = np.asarray(leaf)
        if not np.all(np.isfinite(a)):
            raise FloatingPointError(
                f"non-finite values in {name}{jax.tree_util.keystr(path)}"
            )
