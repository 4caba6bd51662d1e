"""A/B bench: flat-start vs GNS-warm-started batched Newton-Raphson.

Measures, IN ONE PROCESS (cross-process readings drift ±10-15% on this
relay — CLAUDE.md), for a set of NR-feasible augmented grids per case:

  * iterations-to-tolerance of the lock-step batched Newton solve, flat
    start vs warm start (the robust, load-independent metric: the
    while_loop runs until the WHOLE batch converges), and
  * end-to-end wall time: warm arm = GNS forward + decode + warm solve;
    flat arm = solve alone. Both arms end in host value fetches (the only
    trustworthy barrier here), min over --repeats.

The solved fixed point is identical in both arms (asserted); the hybrid is
a pure speed play. Prints one JSON line per case.

Usage: python tools/bench_hybrid.py [--cases 14 30 118] [--grids 256]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cases", type=int, nargs="+", default=[14, 30, 118])
    ap.add_argument("--grids", type=int, default=256)
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--tol", type=float, default=3e-5)
    ap.add_argument("--checkpoint", default="sup",
                    help="pretrained variant suffix: sup | paper | parity")
    args = ap.parse_args()

    import numpy as np

    from gns_tpu.eval.hybrid import hybrid_solve
    from gns_tpu.eval.nr_batched import solve_batched
    from gns_tpu.models.pretrained import load_pretrained
    from gns_tpu.serve import GNSPredictor
    from gns_tpu.utils.augment import generate_cases

    for case in args.cases:
        key = case if args.checkpoint == "parity" else f"{case}-{args.checkpoint}"
        params, cfg = load_pretrained(key)
        cfg = cfg.replace(case_nr=case, compute_dtype="bfloat16")
        scale = 0.5 if case == 300 else 1.0
        cases = list(generate_cases(
            case, args.grids, seed=31415, scale=scale, feasible_only=True
        ))[1:]

        predictor = GNSPredictor(
            params, cfg, batch_size=len(cases), align_slack=True
        )

        # Warm both program caches (compile + one run each).
        flat = solve_batched(cases, tol=args.tol)
        hybrid = hybrid_solve(
            params, cfg, cases, tol=args.tol, predictor=predictor
        )
        np.testing.assert_allclose(  # same fixed point
            flat["v"][flat["converged"] & hybrid["converged"]],
            hybrid["v"][flat["converged"] & hybrid["converged"]],
            atol=5e-4,
        )

        t_flat = t_hybrid = float("inf")
        for _ in range(args.repeats):
            t0 = time.perf_counter()
            flat = solve_batched(cases, tol=args.tol)
            t_flat = min(t_flat, time.perf_counter() - t0)
            t0 = time.perf_counter()
            hybrid = hybrid_solve(
                params, cfg, cases, tol=args.tol, predictor=predictor
            )
            t_hybrid = min(t_hybrid, time.perf_counter() - t0)

        print(json.dumps({
            "case": case,
            "grids": len(cases),
            "tol": args.tol,
            "iters_flat": int(flat["iterations"]),
            "iters_hybrid": int(hybrid["iterations"]),
            "converged_flat": int(flat["converged"].sum()),
            "converged_hybrid": int(hybrid["converged"].sum()),
            "wall_ms_flat": round(t_flat * 1e3, 2),
            "wall_ms_hybrid": round(t_hybrid * 1e3, 2),
            "speedup": round(t_flat / t_hybrid, 3),
        }), flush=True)


if __name__ == "__main__":
    main()
