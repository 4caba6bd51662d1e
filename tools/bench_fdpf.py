"""A/B bench: batched full-Newton vs batched fast-decoupled power flow.

IN ONE PROCESS (cross-process readings drift ±10-15% on this relay —
CLAUDE.md), per case, on S NR-feasible augmented grids:

  * cold: flat-start solve_batched (NR) vs solve_batched_fdpf — wall
    time bracketed by the host value fetch each driver ends in (the only
    trustworthy barrier here), interleaved repeats, min-of-N;
  * hot: the tracking scenario — every grid's load ramps a few percent,
    both solvers re-solve warm-started from the previous solution. This
    is the regime fast-decoupled is built for: few, very cheap
    iterations (no Jacobian build, no factorization in the loop — B'/B''
    are factored once per solve).

Agreement of the two fixed points is asserted (~the f32 mismatch floor).
Prints one JSON line per case; --json-out appends rows to a file.

Usage: python tools/bench_fdpf.py [--cases 14 30 118 300] [--grids 256]
       [--repeats 3] [--json-out docs/FDPF_BENCH.json]
"""

from __future__ import annotations

import argparse
import copy
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def _ramp_loads(cases, frac=0.03, seed=7):
    import numpy as np

    rng = np.random.default_rng(seed)
    out = []
    for c in cases:
        c2 = copy.deepcopy(c)
        bus = np.asarray(c2["bus"], float)
        k = rng.uniform(1 - frac, 1 + frac)
        bus[:, 2] *= k
        bus[:, 3] *= k
        c2["bus"] = bus
        out.append(c2)
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cases", type=int, nargs="+",
                    default=[14, 30, 118, 300])
    ap.add_argument("--grids", type=int, default=256)
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--json-out", default=None)
    ap.add_argument("--gns", action="store_true",
                    help="also A/B the fused GNS hybrid's exact-solve "
                         "tail: hybrid_solve(solver='nr') vs 'fdpf', "
                         "using the shipped {case}-sup checkpoint")
    args = ap.parse_args()

    import numpy as np

    from gns_tpu.eval.fdpf import solve_batched_fdpf
    from gns_tpu.eval.nr_batched import solve_batched
    from gns_tpu.utils.augment import generate_cases

    rows = []
    for case in args.cases:
        scale = 0.5 if case == 300 else None
        kw = {"scale": scale} if scale else {}
        cases = list(
            generate_cases(case, args.grids, seed=13, feasible_only=True,
                           **kw)
        )[1:]
        ramped = _ramp_loads(cases)

        # warm-up: compile every program shape both arms will use
        base_nr = solve_batched(cases)
        base_fd = solve_batched_fdpf(cases)
        prev = (base_nr["v"], np.deg2rad(base_nr["theta_deg"]))
        solve_batched(ramped, warm_start=prev)
        solve_batched_fdpf(ramped, warm_start=prev)

        conv_fd = int(base_fd["converged"].sum())
        both = base_nr["converged"] & base_fd["converged"]
        dv = float(np.abs(base_fd["v"] - base_nr["v"])[both].max())
        assert dv < 1e-4, f"fixed points disagree: {dv}"

        t = {"cold_nr": float("inf"), "cold_fdpf": float("inf"),
             "hot_nr": float("inf"), "hot_fdpf": float("inf")}
        it = {}
        for _ in range(args.repeats):  # interleaved to cancel drift
            t0 = time.perf_counter()
            r = solve_batched(cases)
            t["cold_nr"] = min(t["cold_nr"], time.perf_counter() - t0)
            it["cold_nr"] = int(r["iterations"])

            t0 = time.perf_counter()
            r = solve_batched_fdpf(cases)
            t["cold_fdpf"] = min(t["cold_fdpf"], time.perf_counter() - t0)
            it["cold_fdpf"] = int(r["iterations"])

            t0 = time.perf_counter()
            r = solve_batched(ramped, warm_start=prev)
            t["hot_nr"] = min(t["hot_nr"], time.perf_counter() - t0)
            it["hot_nr"] = int(r["iterations"])

            t0 = time.perf_counter()
            r = solve_batched_fdpf(ramped, warm_start=prev)
            t["hot_fdpf"] = min(t["hot_fdpf"], time.perf_counter() - t0)
            it["hot_fdpf"] = int(r["iterations"])

        if args.gns:
            from gns_tpu.eval.hybrid import hybrid_solve
            from gns_tpu.models.pretrained import load_pretrained

            params, cfg = load_pretrained(f"{case}-sup")
            h_nr = hybrid_solve(params, cfg, cases)  # warm-up/compile
            h_fd = hybrid_solve(params, cfg, cases, solver="fdpf",
                                max_iter=60)
            hboth = h_nr["converged"] & h_fd["converged"]
            dvh = float(np.abs(h_fd["v"] - h_nr["v"])[hboth].max())
            assert dvh < 1e-4, f"hybrid fixed points disagree: {dvh}"
            t["gns_nr"] = t["gns_fdpf"] = float("inf")
            for _ in range(args.repeats):
                t0 = time.perf_counter()
                r = hybrid_solve(params, cfg, cases)
                t["gns_nr"] = min(t["gns_nr"], time.perf_counter() - t0)
                it["gns_nr"] = int(r["iterations"])
                t0 = time.perf_counter()
                r = hybrid_solve(params, cfg, cases, solver="fdpf",
                                 max_iter=60)
                t["gns_fdpf"] = min(t["gns_fdpf"],
                                    time.perf_counter() - t0)
                it["gns_fdpf"] = int(r["iterations"])

        row = {
            "bench": "fdpf_vs_nr", "case": case, "grids": len(cases),
            "fdpf_converged": conv_fd, "max_dv_vs_nr": dv,
            "t_cold_nr_s": round(t["cold_nr"], 4),
            "t_cold_fdpf_s": round(t["cold_fdpf"], 4),
            "cold_speedup": round(t["cold_nr"] / t["cold_fdpf"], 3),
            "t_hot_nr_s": round(t["hot_nr"], 4),
            "t_hot_fdpf_s": round(t["hot_fdpf"], 4),
            "hot_speedup": round(t["hot_nr"] / t["hot_fdpf"], 3),
            "iters": it,
        }
        if args.gns:
            row.update({
                "t_gns_nr_s": round(t["gns_nr"], 4),
                "t_gns_fdpf_s": round(t["gns_fdpf"], 4),
                "gns_speedup": round(t["gns_nr"] / t["gns_fdpf"], 3),
            })
        rows.append(row)
        print(json.dumps(row))

    if args.json_out:
        existing = []
        if os.path.exists(args.json_out):
            with open(args.json_out) as fh:
                existing = json.load(fh)
        with open(args.json_out, "w") as fh:
            json.dump(existing + rows, fh, indent=1)


if __name__ == "__main__":
    main()
