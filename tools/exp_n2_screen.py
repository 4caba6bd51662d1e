"""N-2 screen at scale: full-exact vs ranked on the authentic case118.

Round-4 VERDICT task 3: the ranked screen lost its wall-time value prop
at every shipped N-1 scale (docs/N1_SCREEN.md round-4b') and its claimed
surviving niche — the SOLVE BUDGET at scales where the solver, not the
dispatch, is scarce — had no measurement. This experiment measures that
niche where it lives: the case118 double-branch-outage screen, C(186,2)
= 17,205 pairs (eval/n2.py — device-built variants, ~8 KB host->device
per 2048-pair chunk).

Protocol (real TPU, one process, warmup dispatch first, min of
--repeats):
  * structural pre-filter (both arms, free): n2_islanding_pairs flags
    every structurally-islanding pair exactly; neither arm solves them;
  * FULL arm: screen_n2 over all non-islanding pairs (fdpf);
  * RANKED arm: screen_n2_ranked — one aware forward per chunk over
    device-built variants + verify only top-k, warm-started by the
    predictions (118-deep-n1 by default: the measured-best ranking
    model, docs/N1_SCREEN.md round-4b);
  * ground truth: the FULL arm's worst set (v-violating or
    solver-non-converged non-structural pairs);
  * report: wall time, AC solves spent, recall@k of the truth set.

Appends rows to docs/N1_SCREEN.json (preserving existing rows).

Usage: python tools/exp_n2_screen.py [--case 118] [--ks 256 512 1024]
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
    ap.add_argument("--case", type=int, default=118)
    ap.add_argument("--checkpoint", default="118-deep-n1")
    ap.add_argument("--ks", type=int, nargs="+", default=[256, 512, 1024])
    ap.add_argument("--chunk", type=int, default=2048)
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--json-out",
                    default=os.path.join(REPO, "docs", "N1_SCREEN.json"))
    args = ap.parse_args()

    import numpy as np

    from gns_tpu.eval.n2 import (
        n2_islanding_pairs,
        n2_pairs,
        screen_n2,
        screen_n2_ranked,
    )
    from gns_tpu.models.pretrained import load_pretrained
    from gns_tpu.utils.cases import load_case

    case = load_case(args.case)
    params, cfg = load_pretrained(args.checkpoint)

    t0 = time.perf_counter()
    pairs_all = n2_pairs(case)
    islanded = n2_islanding_pairs(case)
    t_struct = time.perf_counter() - t0
    pairs = pairs_all[~islanded]
    print(f"case{args.case}: {pairs_all.shape[0]} pairs, "
          f"{int(islanded.sum())} structurally islanding "
          f"(flagged exactly in {t_struct*1e3:.0f} ms), "
          f"{pairs.shape[0]} to solve", flush=True)

    # ---- FULL arm (warmup once, then timed min-of-N) ----
    full = screen_n2(case, pairs, chunk_size=args.chunk)  # warmup+truth
    t_full = []
    for _ in range(args.repeats):
        t0 = time.perf_counter()
        screen_n2(case, pairs, chunk_size=args.chunk)
        t_full.append(time.perf_counter() - t0)
    t_full = min(t_full)
    truth = set(np.flatnonzero(
        (full["v_violations"] > 0) | ~full["converged"]
    ).tolist())
    print(f"full screen: {t_full:.2f} s, {pairs.shape[0]} solves, "
          f"{len(truth)} true worst "
          f"({int((~full['converged']).sum())} solver-non-converged "
          f"non-structural)", flush=True)

    rows = [{
        "row": f"n2_full_screen_case{args.case}",
        "pairs_total": int(pairs_all.shape[0]),
        "structurally_islanding": int(islanded.sum()),
        "pairs_solved": int(pairs.shape[0]),
        "wall_sec": round(t_full, 3),
        "true_worst": len(truth),
        "chunk": args.chunk,
        "note": ("full exact N-2 screen, device-built variants "
                 "(eval/n2.py), fdpf; structural pre-filter shared by "
                 "both arms"),
    }]
    print(json.dumps(rows[0]), flush=True)

    # ---- score/checkpoint ablation (one untimed ranking pass each) ----
    types = np.asarray(case["bus"])[:, 1].astype(int)
    is_pq = types == 1
    ablation = {}
    for ck in dict.fromkeys([args.checkpoint, "118-n1"]):
        try:
            p_ck, c_ck = load_pretrained(ck)
        except Exception:
            continue
        rep0 = screen_n2_ranked(case, p_ck, c_ck, pairs, top_k=0,
                                chunk_size=args.chunk, score="rms")
        pv = rep0["pred_v"]
        depth = ((np.maximum(0.94 - pv, 0) + np.maximum(pv - 1.06, 0))
                 * is_pq[None, :]).sum(axis=1)
        for name, sev in (("rms", rep0["severity"]), ("depth", depth)):
            order = np.argsort(-sev, kind="stable")
            ablation[f"{ck}:{name}"] = {
                str(k): round(
                    len(truth & set(order[:k].tolist())) / len(truth), 3
                )
                for k in args.ks
            }
    rows.append({
        "row": f"n2_score_ablation_case{args.case}",
        "recall_at_k": ablation,
        "recall_ceiling": {str(k): round(min(k / len(truth), 1.0), 3)
                           for k in args.ks},
        "note": ("why screen_n2_ranked defaults to score='depth': at N-2 "
                 "the truth set is violation-defined, and predicted "
                 "violation depth ranks it at the k/|truth| ceiling with "
                 "the deep aware model, while the N-1 rms-deviation "
                 "score and the K4 aware model both fail"),
    })
    print(json.dumps(rows[-1]), flush=True)

    # ---- RANKED arm per k ----
    for k in args.ks:
        rep = screen_n2_ranked(
            case, params, cfg, pairs, top_k=k, chunk_size=args.chunk
        )  # warmup
        t_rank = []
        for _ in range(args.repeats):
            t0 = time.perf_counter()
            rep = screen_n2_ranked(
                case, params, cfg, pairs, top_k=k, chunk_size=args.chunk
            )
            t_rank.append(time.perf_counter() - t0)
        t_rank = min(t_rank)
        found = set(np.flatnonzero(
            np.isin(np.arange(pairs.shape[0]), rep["verified_idx"])
            & ((rep["v_violations"] > 0) | ~rep["converged"])
        ).tolist())
        recall = len(truth & found) / max(len(truth), 1)
        row = {
            "row": f"n2_ranked_screen_case{args.case}_k{k}",
            "checkpoint": args.checkpoint,
            "top_k": k,
            "wall_sec": round(t_rank, 3),
            "solves": int(rep["n_solves"]),
            "solve_budget_frac": round(k / pairs.shape[0], 4),
            "recall_true_worst": round(recall, 3),
            "speedup_vs_full": round(t_full / t_rank, 2),
            "note": ("ranked N-2: one aware forward per chunk over "
                     "device-built variants + verify top-k (warm-started "
                     "by predictions); recall vs the full screen's worst "
                     "set"),
        }
        rows.append(row)
        print(json.dumps(row), flush=True)

    if args.json_out:
        existing = json.load(open(args.json_out))
        keep = [r for r in existing
                if r.get("row") not in {x["row"] for x in rows}]
        json.dump(keep + rows, open(args.json_out, "w"), indent=1)


if __name__ == "__main__":
    main()
