"""Measure the GNS-ranked N-1 screen: ranking quality + wall time.

For each case with an outage-aware checkpoint:
  1. Ground truth: the FULL NR screen (every variant Newton-solved,
     eval/contingency.screen_n1) — its "worst" set (islanding +
     voltage-violating contingencies) is the target, its wall time the
     baseline.
  2. The ranked screen (screen_n1_ranked) at several top-k budgets:
     recall of the true worst set, number of Newton solves spent, wall
     time. Islanding is flagged structurally (exact by construction —
     find_bridges == the full screen's non-converged set, asserted), so
     recall splits into the exact islanding part and the ranked
     violation part.

case300 runs TIMING-ONLY with its status-blind checkpoint (no 300-n1
yet): it measures the screen's scale behavior (411 variants, dense
300-bus Newton), not ranking quality — the row says so.

One process, min-of---repeats, value-fetch barriers (CLAUDE.md timing
rules). Writes docs/N1_SCREEN.json; the narrative lives in
docs/N1_SCREEN.md.

Usage: python tools/exp_n1_screen.py [--cases 14 118] [--repeats 3]
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
    ap.add_argument("--cases", nargs="+", default=["14", "118", "300"])
    ap.add_argument("--ks", type=int, nargs="+", default=[8, 16, 32, 64])
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--gen-outages", action="store_true", default=True)
    ap.add_argument("--json-out", default=os.path.join(REPO, "docs", "N1_SCREEN.json"))
    args = ap.parse_args()

    import numpy as np

    from gns_tpu.eval.contingency import (
        find_bridges,
        screen_n1,
        screen_n1_ranked,
    )
    from gns_tpu.models.pretrained import available_cases, load_pretrained
    from gns_tpu.utils.cases import load_case

    rows = []
    for case_name in args.cases:
        case_nr = int(case_name)
        case = load_case(case_nr)
        n1_key = f"{case_nr}-n1"
        ranking_valid = n1_key in available_cases()
        ckpt = n1_key if ranking_valid else f"{case_nr}-sup"
        params, cfg = load_pretrained(ckpt)

        # ground truth + full-screen baseline time
        full = screen_n1(case, gen_outages=args.gen_outages)
        t_full = float("inf")
        for _ in range(args.repeats):
            t0 = time.perf_counter()
            full = screen_n1(case, gen_outages=args.gen_outages)
            t_full = min(t_full, time.perf_counter() - t0)
        true_worst = set(np.asarray(full["worst"]).tolist())
        true_island = set(np.flatnonzero(~full["converged"]).tolist())
        true_viol = true_worst - true_island

        # structural stage is exact (assert, don't assume)
        br_bridges = set(find_bridges(case).tolist())
        outages = full["outages"]
        bridge_variants = {
            i for i, (kind, idx) in enumerate(outages)
            if kind == "branch" and idx in br_bridges
        }
        # a non-converged variant that is NOT a bridge would be an
        # electrically-divergent (not islanded) case — report, don't hide
        structural_exact = bridge_variants == true_island
        if not structural_exact:
            print(
                f"# case{case_nr}: bridges {sorted(bridge_variants)} vs "
                f"NR non-converged {sorted(true_island)}", file=sys.stderr,
            )

        for k in args.ks:
            # blind checkpoints get raw-feature inputs (r=1e6 encoded
            # impedance is out-of-distribution for them; their row is
            # timing-only anyway — ranking_valid says so)
            rep = screen_n1_ranked(
                case, params, cfg, gen_outages=args.gen_outages, top_k=k,
                encode_impedance=ranking_valid,
            )
            t_rank = float("inf")
            for _ in range(args.repeats):
                t0 = time.perf_counter()
                rep = screen_n1_ranked(
                    case, params, cfg, gen_outages=args.gen_outages,
                    top_k=k, encode_impedance=ranking_valid,
                )
                t_rank = min(t_rank, time.perf_counter() - t0)
            found = set(np.asarray(rep["worst"]).tolist())
            nc = len(outages)
            rows.append({
                "case": case_nr,
                "checkpoint": ckpt,
                "ranking_valid": ranking_valid,
                "structural_exact": structural_exact,
                "contingencies": nc,
                "top_k": k,
                "newton_solves_full": nc,
                "newton_solves_ranked": rep["n_newton_solves"],
                "true_worst": len(true_worst),
                "true_islanding": len(true_island),
                "true_violations": len(true_viol),
                "recall_worst": round(
                    len(true_worst & found) / max(len(true_worst), 1), 3),
                "recall_islanding": round(
                    len(true_island & found) / max(len(true_island), 1), 3)
                if true_island else None,
                "recall_violations": round(
                    len(true_viol & found) / max(len(true_viol), 1), 3)
                if true_viol else None,
                "wall_ms_full": round(t_full * 1e3, 1),
                "wall_ms_ranked": round(t_rank * 1e3, 1),
                "speedup": round(t_full / t_rank, 2),
            })
            print(json.dumps(rows[-1]), flush=True)

    # replace this experiment's own per-case rows, PRESERVE rows other
    # tools appended (bench_fdpf screen rows, exp_dc_ranking — they have
    # a "row" key; a plain overwrite silently dropped them once)
    kept = []
    if os.path.exists(args.json_out):
        with open(args.json_out) as fh:
            kept = [r for r in json.load(fh) if "row" in r]
    with open(args.json_out, "w") as fjson:
        json.dump(rows + kept, fjson, indent=1)
    print(f"wrote {args.json_out} ({len(rows)} screen rows + "
          f"{len(kept)} preserved)", file=sys.stderr)


if __name__ == "__main__":
    main()
