"""Hybrid solver: GNS prediction warm-starts batched Newton-Raphson.

The practical promise of a learned power-flow solver (Donon et al., the
paper behind the reference — GNS/main.py:10) is not replacing Newton-
Raphson but accelerating it: the network's millisecond-scale prediction is
a high-quality initial iterate, and Newton converges quadratically from a
good start. The reference never builds this (its evaluate.py only compares
the two side by side, GNS/evaluate.py:89-148); here it is a first-class
pipeline that stays on the TPU end to end:

    GNS batched forward (serve.GNSPredictor, bf16, mask-free dense path)
      -> slack-gauge decode (the angle gauge NR pins, harness.py)
      -> batched full-Newton solve seeded with the prediction
         (nr_batched.solve_batched(warm_start=...), lock-step LU on MXU)

The result is EXACT (same fixed point as a flat start — Newton's root does
not depend on the iterate it starts from; only the iteration count does).
Measured honestly (tools/bench_hybrid.py, one process — the only honest
A/B on this relay, CLAUDE.md): with the shipped sup checkpoints the warm
start saves 1-2 of 5-7 Newton iterations (c14 5→3, c30 7→6, c118 7→6,
c300 5→5) with 256/256 convergence in both arms, but end-to-end wall time
is 0.58-0.84x — the extra forward dispatch plus host prep outweighs the
saved iterations, and the lock-step batched while_loop is gated by the
worst grid in the chunk, which the prediction helps least. Ships as a
correctness/robustness surface and for hot-start workloads (time-series
re-solve); see ROADMAP.md #8 for the full measurement.
"""

from __future__ import annotations

from typing import Dict, List, Optional

import numpy as np

from gns_tpu.eval.nr_batched import solve_batched
from gns_tpu.serve import GNSPredictor
from gns_tpu.utils.config import GNSConfig


def hybrid_solve(
    params,
    cfg: GNSConfig,
    cases: List[Dict],
    tol: float = 3e-5,
    max_iter: int = 20,
    chunk_size: int = 256,
    predictor: Optional[GNSPredictor] = None,
    return_prediction: bool = False,
    fallback_flat: bool = True,
) -> Dict[str, np.ndarray]:
    """Solve `cases` exactly, warm-started by the GNS prediction.

    Returns the solve_batched dict ({"v", "theta_deg", "converged",
    "iterations"}); with return_prediction=True it also carries the raw
    network guess under "gns_v"/"gns_theta_deg" so callers can report how
    far the prediction was from the solved fixed point.

    fallback_flat: Newton is only locally convergent — a bad prediction
    can leave the basin of attraction on grids a flat start solves
    (observed on strongly perturbed case30 grids with noise-level-0.1
    starts). Any grid the warm solve fails is re-solved from the flat
    start and spliced in, so the hybrid is never LESS robust than plain
    NR; "fallback_grids" reports how many needed it (0 in the measured
    benches with shipped checkpoints).
    """
    if predictor is None:
        predictor = GNSPredictor(
            params, cfg, batch_size=max(len(cases), 1), align_slack=True
        )
    pred = predictor.predict(cases)
    out = solve_batched(
        cases,
        tol=tol,
        max_iter=max_iter,
        chunk_size=chunk_size,
        warm_start=(pred["v"], pred["theta"]),
    )
    if fallback_flat and not out["converged"].all():
        bad = np.flatnonzero(~out["converged"])
        flat = solve_batched(
            [cases[i] for i in bad],
            tol=tol, max_iter=max_iter, chunk_size=chunk_size,
        )
        out["v"][bad] = flat["v"]
        out["theta_deg"][bad] = flat["theta_deg"]
        out["converged"][bad] = flat["converged"]
        out["iterations"] = max(out["iterations"], flat["iterations"])
        out["fallback_grids"] = bad.size
    else:
        out["fallback_grids"] = 0
    if return_prediction:
        out["gns_v"] = pred["v"]
        out["gns_theta_deg"] = np.rad2deg(pred["theta"]).astype(np.float32)
    return out
