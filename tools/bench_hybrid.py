"""A/B bench: flat-start vs GNS-warm-started batched Newton-Raphson.

Measures, IN ONE PROCESS (cross-process readings drift ±10-15% on this
relay — CLAUDE.md), for a set of NR-feasible augmented grids per case:

  * iterations-to-tolerance of the lock-step batched Newton solve, flat
    start vs warm start (the robust, load-independent metric: the
    while_loop runs until the WHOLE batch converges), and
  * end-to-end wall time: warm arm = the FUSED hybrid (one XLA program:
    in-device grid prep + GNS forward + gauge decode + warm seeding +
    Newton while_loop — eval/hybrid.py); flat arm = solve alone. Both
    arms end in host value fetches (the only trustworthy barrier here),
    min over --repeats. --legacy additionally times the round-2
    two-dispatch pipeline (GNSPredictor -> host decode -> warm solve)
    for comparison.

The solved fixed point is identical in both arms (asserted); the hybrid is
a pure speed play. Prints one JSON line per case.

--scenario hot adds the time-series re-solve scenario the hybrid module
promises: after solving a base set, every grid's load ramps a few percent
(the operational pattern: re-solve a slightly changed system every few
minutes). Three arms on the ramped set: flat start, warm start from the
PREVIOUS solution (the classical tracking solver), and the fused GNS
hybrid (no previous solution needed — e.g. first solve of a new scenario
batch in contingency screening).

--scenario auto drives every arm through the UNIFIED surface
(eval/solve.py solve_ac, round-4): cold (params, no previous solution ->
resolves to the gns hybrid), hot (previous solution supplied -> resolves
to prev tracking), and no-model (-> flat), and reports auto-vs-best-
hand-picked ratios — the policy's "never slower" proof rows
(docs/HYBRID_BENCH_R4.json).

Usage: python tools/bench_hybrid.py [--cases 14 30 118] [--grids 256]
       [--scenario base|hot|both|auto] [--legacy]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def _ramp_loads(cases, frac=0.03, seed=7):
    """Per-grid uniform load ramp in [1-frac, 1+frac] (Pd, Qd scaled)."""
    import copy

    import numpy as np

    rng = np.random.default_rng(seed)
    out = []
    for c in cases:
        c2 = copy.deepcopy(c)
        r = 1.0 + frac * (2.0 * rng.random() - 1.0)
        c2["bus"][:, 2] *= r
        c2["bus"][:, 3] *= r
        out.append(c2)
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cases", type=int, nargs="+", default=[14, 30, 118])
    ap.add_argument("--grids", type=int, default=256)
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--tol", type=float, default=3e-5)
    ap.add_argument("--checkpoint", default="sup",
                    help="pretrained variant suffix: sup | paper | parity")
    ap.add_argument("--scenario", default="base",
                    choices=["base", "hot", "both", "auto"])
    ap.add_argument("--compact", type=int, default=0,
                    help="per-grid convergence exit: compact_after "
                         "iterations for BOTH arms (0 = lock-step)")
    ap.add_argument("--legacy", action="store_true",
                    help="also time the round-2 two-dispatch pipeline")
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

        if args.scenario in ("base", "both"):
            # Warm both program caches (compile + one run each).
            flat = solve_batched(cases, tol=args.tol,
                                 compact_after=args.compact)
            hybrid = hybrid_solve(params, cfg, cases, tol=args.tol,
                                  compact_after=args.compact)
            both = flat["converged"] & hybrid["converged"]
            np.testing.assert_allclose(  # same fixed point
                flat["v"][both], hybrid["v"][both], atol=5e-4
            )

            t_flat = t_hybrid = t_legacy = float("inf")
            predictor = None
            if args.legacy:
                predictor = GNSPredictor(
                    params, cfg, batch_size=len(cases), align_slack=True
                )
                hybrid_solve(params, cfg, cases, tol=args.tol,
                             predictor=predictor)
            for _ in range(args.repeats):
                t0 = time.perf_counter()
                flat = solve_batched(cases, tol=args.tol,
                                     compact_after=args.compact)
                t_flat = min(t_flat, time.perf_counter() - t0)
                t0 = time.perf_counter()
                hybrid = hybrid_solve(params, cfg, cases, tol=args.tol,
                                      compact_after=args.compact)
                t_hybrid = min(t_hybrid, time.perf_counter() - t0)
                if args.legacy:
                    t0 = time.perf_counter()
                    hybrid_solve(params, cfg, cases, tol=args.tol,
                                 predictor=predictor)
                    t_legacy = min(t_legacy, time.perf_counter() - t0)

            rec = {
                "scenario": "base",
                "case": case,
                "grids": len(cases),
                "tol": args.tol,
                "iters_flat": int(flat["iterations"]),
                "iters_hybrid": int(hybrid["iterations"]),
                "iters_grid_mean_flat": round(
                    float(flat["iterations_per_grid"].mean()), 2),
                "iters_grid_mean_hybrid": round(
                    float(hybrid["iterations_per_grid"].mean()), 2),
                "converged_flat": int(flat["converged"].sum()),
                "converged_hybrid": int(hybrid["converged"].sum()),
                "fallback_grids": int(hybrid["fallback_grids"]),
                "compact": args.compact,
                "wall_ms_flat": round(t_flat * 1e3, 2),
                "wall_ms_hybrid": round(t_hybrid * 1e3, 2),
                "speedup": round(t_flat / t_hybrid, 3),
            }
            if args.legacy:
                rec["wall_ms_legacy"] = round(t_legacy * 1e3, 2)
                rec["speedup_legacy"] = round(t_flat / t_legacy, 3)
            print(json.dumps(rec), flush=True)

        if args.scenario == "auto":
            # The unified surface (eval/solve.py solve_ac): auto must
            # match the best hand-picked arm in each scenario, through
            # the SAME one-process min-of-repeats methodology.
            from gns_tpu.eval.solve import solve_ac

            base_sol = solve_batched(cases, tol=args.tol)
            ramped = _ramp_loads(cases)
            prev = (base_sol["v"], np.deg2rad(base_sol["theta_deg"]))
            # warm every program cache (cold + hot shapes, all arms)
            flat = solve_batched(cases, tol=args.tol)
            hyb = hybrid_solve(params, cfg, cases, tol=args.tol)
            a_cold = solve_ac(cases, params=params, cfg=cfg, tol=args.tol)
            flat_h = solve_batched(ramped, tol=args.tol)
            track = solve_batched(ramped, tol=args.tol, warm_start=prev)
            a_hot = solve_ac(
                ramped, params=params, cfg=cfg, prev=base_sol, tol=args.tol
            )
            a_flat = solve_ac(cases, tol=args.tol)
            # cold resolution is deployment-dependent (RTT x case size —
            # eval/solve._gns_warm_pays); record what the policy chose
            assert a_cold["warm_start"] in ("gns", "flat")
            assert a_hot["warm_start"] == "prev"
            assert a_flat["warm_start"] == "flat"
            both = flat["converged"] & a_cold["converged"]
            np.testing.assert_allclose(  # same fixed point, every arm
                flat["v"][both], a_cold["v"][both], atol=5e-4
            )
            t = {k: float("inf") for k in
                 ("flat", "hybrid", "auto_cold", "flat_hot", "track",
                  "auto_hot", "auto_flat")}

            def tmin(key, fn):
                t0 = time.perf_counter()
                fn()
                t[key] = min(t[key], time.perf_counter() - t0)

            for _ in range(args.repeats):
                tmin("flat", lambda: solve_batched(cases, tol=args.tol))
                tmin("hybrid", lambda: hybrid_solve(
                    params, cfg, cases, tol=args.tol))
                tmin("auto_cold", lambda: solve_ac(
                    cases, params=params, cfg=cfg, tol=args.tol))
                tmin("flat_hot", lambda: solve_batched(ramped, tol=args.tol))
                tmin("track", lambda: solve_batched(
                    ramped, tol=args.tol, warm_start=prev))
                tmin("auto_hot", lambda: solve_ac(
                    ramped, params=params, cfg=cfg, prev=base_sol,
                    tol=args.tol))
                tmin("auto_flat", lambda: solve_ac(cases, tol=args.tol))
            print(json.dumps({
                "scenario": "auto",
                "case": case,
                "grids": len(cases),
                "tol": args.tol,
                "cold_resolved": a_cold["warm_start"],
                "compact_resolved": int(a_cold["compact_after"]),
                "wall_ms": {k: round(v * 1e3, 2) for k, v in t.items()},
                # auto vs the best hand-picked arm per scenario (>= ~1.0
                # minus dispatch noise proves the policy never loses)
                "auto_cold_vs_best": round(
                    min(t["flat"], t["hybrid"]) / t["auto_cold"], 3),
                "auto_hot_vs_best": round(
                    min(t["flat_hot"], t["track"]) / t["auto_hot"], 3),
                "auto_flat_vs_flat": round(t["flat"] / t["auto_flat"], 3),
            }), flush=True)

        if args.scenario in ("hot", "both"):
            base_sol = solve_batched(cases, tol=args.tol)
            ramped = _ramp_loads(cases)
            prev = (base_sol["v"], np.deg2rad(base_sol["theta_deg"]))
            # warm caches
            flat = solve_batched(ramped, tol=args.tol)
            track = solve_batched(ramped, tol=args.tol, warm_start=prev)
            hyb = hybrid_solve(params, cfg, ramped, tol=args.tol)
            t_flat = t_track = t_hyb = float("inf")
            for _ in range(args.repeats):
                t0 = time.perf_counter()
                flat = solve_batched(ramped, tol=args.tol)
                t_flat = min(t_flat, time.perf_counter() - t0)
                t0 = time.perf_counter()
                track = solve_batched(ramped, tol=args.tol, warm_start=prev)
                t_track = min(t_track, time.perf_counter() - t0)
                t0 = time.perf_counter()
                hyb = hybrid_solve(params, cfg, ramped, tol=args.tol)
                t_hyb = min(t_hyb, time.perf_counter() - t0)
            print(json.dumps({
                "scenario": "hot",
                "case": case,
                "grids": len(ramped),
                "iters_flat": int(flat["iterations"]),
                "iters_track": int(track["iterations"]),
                "iters_hybrid": int(hyb["iterations"]),
                "converged_flat": int(flat["converged"].sum()),
                "converged_track": int(track["converged"].sum()),
                "converged_hybrid": int(hyb["converged"].sum()),
                "wall_ms_flat": round(t_flat * 1e3, 2),
                "wall_ms_track": round(t_track * 1e3, 2),
                "wall_ms_hybrid": round(t_hyb * 1e3, 2),
                "speedup_track": round(t_flat / t_track, 3),
                "speedup_hybrid": round(t_flat / t_hyb, 3),
            }), flush=True)


if __name__ == "__main__":
    main()
