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
    chunked into batch_size-sized dispatches (the last chunk padded with
    copies) so a steady request stream of ANY size reuses a single program
    and holds at most one batch in HBM. Set `align_slack=False` to get the
    raw network gauge instead of the NR-convention decode.
    """

    def __init__(
        self,
        params,
        cfg: GNSConfig,
        batch_size: int = 1024,
        method: str = "auto",
        align_slack: bool = True,
        mesh=None,
    ):
        """mesh: optional jax.sharding.Mesh with a "dp" axis — the padded
        request batch is sharded over the mesh's data axis and the SAME
        jitted forward compiles to an SPMD program (params replicated;
        grids never interact, so the program has no collectives). The
        serving twin of solve_batched(mesh=...); identical predictions
        to the single-device run (tests/test_solver_dp.py)."""
        self.params = params
        self.cfg = cfg
        self.batch_size = batch_size
        self.method = method
        self.align_slack = align_slack
        self.mesh = mesh
        if mesh is not None:
            from gns_tpu.parallel.solver_dp import dp_size, put_repl

            if batch_size % dp_size(mesh):
                raise ValueError(
                    f"batch_size {batch_size} must divide the mesh's dp "
                    f"axis ({dp_size(mesh)})"
                )
            self.params = put_repl(mesh, params)
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
        fill the last chunk are stripped).

        Requests larger than `batch_size` are split into batch_size-sized
        chunks, each a dispatch of the SAME cached program — one compiled
        program serves every request size, and peak HBM is bounded by one
        batch regardless of request size. Dispatches are issued
        asynchronously (host-side packing of chunk i+1 overlaps device
        execution of chunk i); results are fetched once at the end.
        """
        if not cases:
            raise ValueError("empty request")
        s = len(cases)
        outs = []
        for lo in range(0, s, self.batch_size):
            chunk = cases[lo:lo + self.batch_size]
            padded = chunk + [chunk[-1]] * (self.batch_size - len(chunk))
            batch = batch_from_cases(
                padded, paper_shunts=not self.cfg.true_shunts
            )
            topo = extract_shared_topology(batch)
            dense = batch.is_dense()
            if self.mesh is not None:
                from gns_tpu.parallel.solver_dp import put_dp

                batch = type(batch)(
                    *(put_dp(self.mesh, np.asarray(x)) for x in batch)
                )
            outs.append(
                (self._fn_for(batch, topo, dense)(self.params, batch),
                 len(chunk))
            )
        v = np.concatenate([np.asarray(o.v)[:k] for o, k in outs])
        theta = np.concatenate([np.asarray(o.theta)[:k] for o, k in outs])
        if self.align_slack:
            from gns_tpu.eval.harness import align_slack_angle

            theta = np.stack(
                [align_slack_angle(t, c) for t, c in zip(theta, cases)]
            )
        return {
            "v": v,
            "theta": theta,
            "last_loss": np.concatenate(
                [np.asarray(o.last_loss)[:k] for o, k in outs]
            ),
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
