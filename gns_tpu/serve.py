"""Batched serving: case dicts in, decoded predictions out.

The reference's only inference surface is the evaluate.py script's
per-grid loop (reference: GNS/evaluate.py:74-86 — one sequential forward
per grid). This module is the production path: pad a request set into one
GridBatch, run ONE jitted batched forward (shared topology when the grids
share one, the mask-free dense lowering when unpadded), and decode the
angles into Newton-Raphson's slack-pinned gauge (eval/harness.py
align_slack_angle — the physics loss is shift-invariant, so raw network
angles carry an arbitrary offset; the slack angle is a problem INPUT).

Measured on one TPU v5e (tools/bench_inference.py, batch 1024, bf16):
millions of case14 grids/s — roughly four orders of magnitude more
per-grid throughput than the sequential NR oracle on this host's CPU.

Usage:
    from gns_tpu.serve import GNSPredictor
    from gns_tpu.models.pretrained import load_pretrained

    params, cfg = load_pretrained("14-sup")
    predictor = GNSPredictor(params, cfg.replace(compute_dtype="bfloat16"))
    out = predictor.predict(cases)       # list of pypower-style dicts
    out["v"], out["theta"], out["last_loss"]   # (S, N), (S, N), (S,)
"""

from __future__ import annotations

from typing import Dict, List, Optional

import jax
import numpy as np

from gns_tpu.models.gns import gns_forward_batch
from gns_tpu.utils.config import GNSConfig
from gns_tpu.utils.prepare import batch_from_cases, extract_shared_topology


class GNSPredictor:
    """Jitted batched predictor with per-shape program reuse.

    One compiled program per (batch_size, grid shape) pair — requests are
    padded up to `batch_size` along the batch axis so a steady request
    stream reuses a single program. Set `align_slack=False` to get the
    raw network gauge instead of the NR-convention decode.
    """

    def __init__(
        self,
        params,
        cfg: GNSConfig,
        batch_size: int = 1024,
        method: str = "auto",
        align_slack: bool = True,
    ):
        self.params = params
        self.cfg = cfg
        self.batch_size = batch_size
        self.method = method
        self.align_slack = align_slack
        self._compiled: Dict[tuple, object] = {}

    def _fn_for(self, batch, topo, dense: bool):
        key = (batch.buses.shape, dense, topo is not None)
        fn = self._compiled.get(key)
        if fn is None:
            cfg, method = self.cfg, self.method

            def run(params, b):
                return gns_forward_batch(
                    params, cfg, b, method=method, topo=topo, dense=dense
                )

            fn = jax.jit(run)
            self._compiled[key] = fn
        return fn

    def predict(self, cases: List[Dict]) -> Dict[str, np.ndarray]:
        """Solve a list of pypower-style case dicts.

        Returns {"v": (S, N), "theta": (S, N) [decoded gauge],
        "last_loss": (S,)} for the S requested grids (padding rows used to
        fill the batch are stripped).
        """
        if not cases:
            raise ValueError("empty request")
        s = len(cases)
        # pad the request up to batch_size with copies so the compiled
        # program shape is stable across requests
        n_pad = (-s) % self.batch_size if s > self.batch_size else (
            self.batch_size - s
        )
        padded = list(cases) + [cases[-1]] * n_pad
        batch = batch_from_cases(
            padded, paper_shunts=not self.cfg.true_shunts
        )
        topo = extract_shared_topology(batch)
        dense = batch.is_dense()
        out = self._fn_for(batch, topo, dense)(self.params, batch)
        v = np.asarray(out.v)[:s]
        theta = np.asarray(out.theta)[:s]
        if self.align_slack:
            from gns_tpu.eval.harness import align_slack_angle

            theta = np.stack(
                [align_slack_angle(t, c) for t, c in zip(theta, cases)]
            )
        return {
            "v": v,
            "theta": theta,
            "last_loss": np.asarray(out.last_loss)[:s],
        }


def predict(
    params,
    cfg: GNSConfig,
    cases: List[Dict],
    batch_size: Optional[int] = None,
    method: str = "auto",
    align_slack: bool = True,
) -> Dict[str, np.ndarray]:
    """One-shot convenience wrapper around GNSPredictor."""
    bs = batch_size if batch_size is not None else max(len(cases), 1)
    return GNSPredictor(
        params, cfg, batch_size=bs, method=method, align_slack=align_slack
    ).predict(cases)
