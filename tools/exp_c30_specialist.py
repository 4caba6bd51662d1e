"""Close the single-case unsupervised case30 gap (ROADMAP #7, round 3).

Round-2 finding: at reference-strength augmentation the authentic IEEE
case30's low-voltage power-flow branches sit close enough that pure-
residual single-case training drifts onto them AS THE RESIDUAL IMPROVES;
the best single-case recipe (setpoint_slack + true_shunts + v_anchor 0.1)
reached v MSE 0.0552 vs NR while the multi-paper GENERALIST reached
0.00905 — cross-case training regularizes against the drift. This
experiment runs the two candidate fixes named in ROADMAP #7:

  * curriculum — train at augmentation scale 0.4 first (the branches are
    far apart there, the high-voltage basin is learned cleanly), then
    continue the SAME state at scale 1.0;
  * warm — initialize from the multi-paper generalist (already on the
    high-voltage branch everywhere) and fine-tune single-case at full
    strength.

Both candidates use the oracle-consistent physics recipe and identical
budgets; evaluation is v MSE vs the NR oracle on the same 64 NR-feasible
held-out grids as round-2's ablations (seed 12345), so numbers are
directly comparable to the 0.0552 baseline. Prints one JSON line per
candidate; --export ships the winner as 30-paper.

Usage: python tools/exp_c30_specialist.py [--export]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

ASSET_DIR = os.path.join(REPO, "gns_tpu", "utils", "case_assets")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--grids", type=int, default=1024)
    ap.add_argument("--epochs", type=int, default=400)
    ap.add_argument("--stage1-epochs", type=int, default=200)
    ap.add_argument("--stage1-scale", type=float, default=0.4)
    ap.add_argument("--patience", type=int, default=20)
    ap.add_argument("--eval-grids", type=int, default=64)
    ap.add_argument("--candidates", nargs="+",
                    default=["curriculum", "warm"])
    ap.add_argument("--lr", type=float, default=None,
                    help="fine-tuning learning rate for the warm "
                         "candidate (default: optimizer default 1e-3; "
                         "a gentler lr keeps the generalist's basin)")
    ap.add_argument("--export", action="store_true",
                    help="export the best candidate (if it beats the "
                         "0.0552 round-2 baseline) as 30-paper")
    args = ap.parse_args()

    import jax
    import numpy as np

    from gns_tpu.eval.harness import compute_metrics, run_gns, run_nr_oracle
    from gns_tpu.models.pretrained import load_pretrained
    from gns_tpu.train.checkpoint import export_torch
    from gns_tpu.train.trainer import init_train_state, train
    from gns_tpu.utils.augment import generate_cases
    from gns_tpu.utils.config import GNSConfig
    from gns_tpu.utils.prepare import batch_from_cases

    cfg = GNSConfig(
        case_nr=30, K=4, latent_dim=20, hidden_dim=10, multiple_phi=True,
        reference_parity=False, qg_gen_only=True,
        dispatch="setpoint_slack", true_shunts=True, v_anchor=0.1,
        seed=0, epochs=args.epochs, early_stop_patience=args.patience,
        batch_size=128,
    )
    held_cases = list(generate_cases(
        30, args.eval_grids, seed=12345, feasible_only=True
    ))[1:]
    nr = run_nr_oracle(held_cases)

    def v_mse_of(params):
        m = compute_metrics(nr, run_gns(params, cfg, held_cases))
        return m["v_mse"]

    data_full = batch_from_cases(
        list(generate_cases(30, args.grids, seed=0, scale=1.0))[1:],
        paper_shunts=False,
    )

    results = {}
    if "curriculum" in args.candidates:
        t0 = time.perf_counter()
        data_mild = batch_from_cases(
            list(generate_cases(
                30, args.grids, seed=0, scale=args.stage1_scale
            ))[1:],
            paper_shunts=False,
        )
        s1, h1 = train(cfg.replace(epochs=args.stage1_epochs), data_mild)
        best, h2 = train(cfg, data_full, state=s1)
        results["curriculum"] = (best, {
            "candidate": "curriculum",
            "stage1": {"scale": args.stage1_scale,
                       "epochs_run": len(h1),
                       "final_residual": round(h1[-1]["final_loss"], 5)},
            "epochs_run": len(h2),
            "train_sec": round(time.perf_counter() - t0, 1),
            "v_mse_vs_nr": round(v_mse_of(best.params), 6),
        })
        print(json.dumps(results["curriculum"][1]), flush=True)

    if "warm" in args.candidates:
        t0 = time.perf_counter()
        wcfg = cfg.replace(learning_rate=args.lr)
        warm_params, _ = load_pretrained("multi-paper")
        state = init_train_state(jax.random.key(0), wcfg)._replace(
            params=warm_params
        )
        best, h = train(wcfg, data_full, state=state)
        results["warm"] = (best, {
            "candidate": "warm (from multi-paper)",
            "lr": args.lr,
            "epochs_run": len(h),
            "train_sec": round(time.perf_counter() - t0, 1),
            "v_mse_vs_nr": round(v_mse_of(best.params), 6),
        })
        print(json.dumps(results["warm"][1]), flush=True)

    if args.export and results:
        name, (best, row) = min(
            results.items(), key=lambda kv: kv[1][1]["v_mse_vs_nr"]
        )
        if row["v_mse_vs_nr"] < 0.0552:
            path = os.path.join(
                ASSET_DIR, "pretrained_c30_K4_L20_H10_paper.pth"
            )
            export_torch(path, best, cfg)
            print(json.dumps({
                "exported": name, "path": os.path.relpath(path, REPO),
                "v_mse_vs_nr": row["v_mse_vs_nr"],
                "beats_round2_baseline": True,
            }), flush=True)
        else:
            print(json.dumps({
                "exported": None,
                "note": "no candidate beat the 0.0552 round-2 baseline",
            }), flush=True)


if __name__ == "__main__":
    main()
