"""Does a DEEP aware model rank contingencies better than the K4 one?

The ranked screen's stage-2 severity score is the aware model's
prediction shift from its own intact-grid prediction
(eval/contingency.screen_n1_ranked). Its recall of true voltage
violations on case118 is bounded by the model's error floor relative
to the outage severity (ROADMAP 9a': the K4 floor ~4e-4 sits ABOVE the
p90 severity 6.7e-5, and even the deep floor ~2e-4 does) — but ranking
needs only ORDER, not absolute accuracy, and the deep aware arm's
floor is ~2.3x lower, so its deviation score has ~2x more
signal-to-noise. This experiment trains the deep aware model (the
exact 118-deep recipe from tools/exp_multi_n1.py, aware arm only),
measures ranked-screen recall against the same full-Newton ground
truth as tools/exp_n1_screen.py, and exports `118-deep-n1` ONLY if it
beats the shipped K4 `118-n1` ranking.

Usage: python tools/exp_deep_ranking.py [--export]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tools"))

ASSET_DIR = os.path.join(REPO, "gns_tpu", "utils", "case_assets")


def ranking_recall(case, params, cfg, true_worst, ks):
    import numpy as np

    from gns_tpu.eval.contingency import screen_n1_ranked

    out = {}
    for k in ks:
        rep = screen_n1_ranked(case, params, cfg, gen_outages=True,
                               top_k=k)
        found = set(np.asarray(rep["worst"]).tolist())
        out[k] = round(len(true_worst & found) / max(len(true_worst), 1),
                       3)
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--grids", type=int, default=1024)
    ap.add_argument("--epochs", type=int, default=400)
    ap.add_argument("--patience", type=int, default=20)
    ap.add_argument("--outage-prob", type=float, default=0.7)
    ap.add_argument("--ks", type=int, nargs="+", default=[16, 32, 64])
    ap.add_argument("--export", action="store_true")
    args = ap.parse_args()

    import numpy as np

    from exp_outage_aware import outaged_set
    from gns_tpu.eval.contingency import screen_n1
    from gns_tpu.models.pretrained import load_pretrained
    from gns_tpu.train.checkpoint import export_torch
    from gns_tpu.train.trainer import train
    from gns_tpu.utils.cases import load_case
    from gns_tpu.utils.config import GNSConfig
    from gns_tpu.utils.prepare import batch_from_cases

    # the exp_multi_n1 118-deep aware recipe, verbatim
    cfg = GNSConfig(
        case_nr=118, K=8, latent_dim=40, hidden_dim=10,
        multiple_phi=True, reference_parity=False, qg_gen_only=True,
        dispatch="setpoint_slack", true_shunts=True, v_anchor=0.1,
        grad_clip=1.0, warmup_steps=300, seed=0, epochs=args.epochs,
        early_stop_patience=args.patience, batch_size=128,
        init_correction_scale=0.1, admittance_inputs=True,
    )
    t0 = time.perf_counter()
    cases = outaged_set(118, args.grids, seed=0, prob=args.outage_prob)
    gen_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    best, hist = train(cfg, batch_from_cases(cases, paper_shunts=False))
    train_s = time.perf_counter() - t0

    case = load_case(118)
    full = screen_n1(case, gen_outages=True)
    true_worst = set(np.asarray(full["worst"]).tolist())

    r_deep = ranking_recall(case, best.params, cfg, true_worst, args.ks)
    p4, c4 = load_pretrained("118-n1")
    r_k4 = ranking_recall(case, p4, c4, true_worst, args.ks)

    wins = sum(r_deep[k] > r_k4[k] for k in args.ks)
    ties = sum(r_deep[k] == r_k4[k] for k in args.ks)
    better = wins > 0 and wins + ties == len(args.ks)
    path = None
    if args.export and better:
        path = os.path.join(ASSET_DIR, "pretrained_c118_K8_L40_H10_n1.pth")
        export_torch(path, best, cfg)

    print(json.dumps({
        "which": "118-deep-n1-ranking",
        "epochs_run": len(hist),
        "gen_sec": round(gen_s, 1), "train_sec": round(train_s, 1),
        "true_worst": len(true_worst),
        "recall_worst_deep": r_deep,
        "recall_worst_k4_n1": r_k4,
        "deep_ranking_better": bool(better),
        "exported": os.path.relpath(path, REPO) if path else None,
    }), flush=True)


if __name__ == "__main__":
    main()
