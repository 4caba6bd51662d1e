"""Train the shipped pretrained checkpoints (models/pretrained.py).

One checkpoint per MATPOWER case, all at the reference's stated best
hyperparameters (reference: README.md:16 — K=4, latent 20, hidden 10,
multiple_phi, gamma 0.9), trained on 1024 seeded augmented grids with
reference-parity physics, exported in the reference's own .pth state_dict
layout so both frameworks can load them. Prints one JSON line per case
with the final training residual and held-out evaluation residual.

Usage: python tools/train_pretrained.py [--cases 9 30 118 300] [--epochs 400]
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
    ap.add_argument("--cases", type=int, nargs="+", default=[9, 30, 118, 300])
    ap.add_argument("--grids", type=int, default=1024)
    ap.add_argument("--epochs", type=int, default=400)
    ap.add_argument("--patience", type=int, default=20)
    ap.add_argument("--eval-grids", type=int, default=64)
    ap.add_argument("--physics", choices=["parity", "paper"], default="parity",
                    help="'paper' trains on the textbook AC residual "
                         "(reference_parity=False) with qg_gen_only=True "
                         "(the quirk-Q8 fix: live reactive residual at load "
                         "buses; without it large-case training converges "
                         "to wrong-voltage branches) — saved with a _paper "
                         "filename suffix")
    ap.add_argument("--dispatch", choices=["lambda", "setpoint_slack"],
                    default="lambda",
                    help="paper-mode generator convention (utils/config.py)")
    ap.add_argument("--scale", type=float, default=1.0,
                    help="augmentation strength; case300 needs <=0.5 to "
                         "stay NR-feasible (utils/augment.py)")
    ap.add_argument("--lr", type=float, default=None,
                    help="override the optimizer default learning rate "
                         "(the authentic case118's stiff branches make "
                         "the paper-mode residual scale ~1e6x case14's; "
                         "Adam at the default 1e-3 stalls there)")
    ap.add_argument("--warmup", type=int, default=0,
                    help="linear LR warmup steps (GNSConfig.warmup_steps)")
    ap.add_argument("--grad-clip", type=float, default=0.0,
                    help="global-norm gradient clip (GNSConfig.grad_clip)")
    ap.add_argument("--v-anchor", type=float, default=0.0,
                    help="paper mode: weak (v-1)^2 tie-breaker on free "
                         "buses toward the high-voltage power-flow branch "
                         "(GNSConfig.v_anchor)")
    ap.add_argument("--true-shunts", action="store_true",
                    help="paper mode only: keep each case's true Gs/Bs "
                         "instead of the reference's paper defaults, so "
                         "the residual models the grid the NR oracle "
                         "solves (GNSConfig.true_shunts; required for "
                         "oracle-grade accuracy on shunt-compensated "
                         "grids like the authentic IEEE case30)")
    args = ap.parse_args()

    import jax
    import numpy as np

    from gns_tpu.models.gns import gns_forward_batch
    from gns_tpu.train.checkpoint import export_torch
    from gns_tpu.train.trainer import train
    from gns_tpu.utils.augment import generate_cases
    from gns_tpu.utils.config import GNSConfig
    from gns_tpu.utils.prepare import batch_from_cases, extract_shared_topology

    for case in args.cases:
        paper = args.physics == "paper"
        if args.true_shunts and not paper:
            raise SystemExit(
                "--true-shunts requires --physics paper (parity mode must "
                "keep the reference's shunt convention for bit parity)"
            )
        true_shunts = bool(args.true_shunts and paper)
        cfg = GNSConfig(
            case_nr=case, K=4, latent_dim=20, hidden_dim=10,
            multiple_phi=True, reference_parity=not paper,
            qg_gen_only=paper, dispatch=args.dispatch if paper else "lambda",
            true_shunts=true_shunts,
            v_anchor=args.v_anchor if paper else 0.0,
            learning_rate=args.lr, warmup_steps=args.warmup,
            grad_clip=args.grad_clip,
            seed=0, epochs=args.epochs, early_stop_patience=args.patience,
            batch_size=128,
        )
        data = batch_from_cases(
            list(generate_cases(case, args.grids, seed=0, scale=args.scale))[1:],
            paper_shunts=not true_shunts,
        )
        # Held-out grids FIRST (disjoint seed; paper mode NR-feasibility-
        # filtered so the oracle comparison is defined on every grid): if
        # the case is infeasible at this --scale, fail before burning the
        # training budget, not after.
        held_cases = list(generate_cases(
            case, args.eval_grids, seed=12345, scale=args.scale,
            feasible_only=paper,
        ))[1:]
        held = batch_from_cases(held_cases, paper_shunts=not true_shunts)
        t0 = time.perf_counter()
        best, history = train(cfg, data)
        train_s = time.perf_counter() - t0
        out = gns_forward_batch(
            best.params, cfg, held, method="auto",
            topo=extract_shared_topology(held),
        )
        heldout_residual = float(np.mean(np.asarray(out.last_loss)))

        # Export BEFORE the oracle eval: a failure there must not discard
        # the finished training run.
        suffix = "" if args.physics == "parity" else "_paper"
        path = os.path.join(
            ASSET_DIR, f"pretrained_c{case}_K4_L20_H10{suffix}.pth"
        )
        export_torch(path, best, cfg)

        # Paper-mode checkpoints are accuracy products: also score v MSE
        # against the Newton-Raphson oracle on the held-out grids.
        v_mse = None
        if paper:
            from gns_tpu.eval.harness import (
                compute_metrics,
                run_gns,
                run_nr_oracle,
            )

            nr = run_nr_oracle(held_cases)
            m = compute_metrics(nr, run_gns(best.params, cfg, held_cases))
            v_mse = m["v_mse"]

        print(json.dumps({
            "case": case,
            "epochs_run": len(history),
            "train_sec": round(train_s, 1),
            "final_train_residual": round(history[-1]["final_loss"], 5),
            "best_train_residual": round(
                min(h["final_loss"] for h in history), 5
            ),
            "heldout_residual": round(heldout_residual, 5),
            "v_mse_vs_nr": round(v_mse, 6) if v_mse is not None else None,
            "path": os.path.relpath(path, REPO),
        }), flush=True)


if __name__ == "__main__":
    main()
