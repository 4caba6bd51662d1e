"""Train the two non-standard shipped checkpoints:

  * case300 "deep" variant — the BASELINE config #4 preset (K=8, latent 40,
    hidden 10, multi-phi), case300 only.
  * "multi" — ONE model trained round-robin over all five cases via
    train_multi (per-case buckets + shared topologies), at the reference's
    best hyperparameters. A capability the reference cannot express.

Writes reference-layout .pth assets and prints one JSON line each.
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


def heldout_residual(params, cfg, case, n=64):
    import numpy as np

    from gns_tpu.models.gns import gns_forward_batch
    from gns_tpu.utils.augment import generate_cases
    from gns_tpu.utils.prepare import batch_from_cases, extract_shared_topology

    held = batch_from_cases(list(generate_cases(case, n, seed=424242))[1:])
    out = gns_forward_batch(
        params, cfg.replace(case_nr=case), held, method="auto",
        topo=extract_shared_topology(held),
    )
    return float(np.mean(np.asarray(out.last_loss)))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--which", nargs="+", default=["deep300", "multi"],
                    help="deep300 | multi | multi-paper | multi-sup | "
                         "multi-deep-sup (NR-label fine-tune of "
                         "multi-deep-paper, K8/L40) | "
                         "deep300-paper (K=8/L40 with textbook physics + "
                         "the quirk-Q8 fix at augmentation scale 0.5); "
                         "multi-sup = NR-label fine-tune of multi-paper")
    ap.add_argument("--grids", type=int, default=1024)
    ap.add_argument("--epochs", type=int, default=400)
    ap.add_argument("--patience", type=int, default=20)
    ap.add_argument("--true-shunts", action="store_true",
                    help="paper-mode variants: keep each case's true Gs/Bs "
                         "instead of the reference's paper defaults "
                         "(GNSConfig.true_shunts)")
    ap.add_argument("--dispatch", choices=["lambda", "setpoint_slack"],
                    default="lambda",
                    help="paper-mode generator convention (utils/config.py)")
    ap.add_argument("--v-anchor", type=float, default=0.0,
                    help="paper mode: weak (v-1)^2 high-voltage-branch "
                         "tie-breaker (GNSConfig.v_anchor)")
    ap.add_argument("--grad-clip", type=float, default=None,
                    help="global-norm gradient clip for the paper-mode "
                         "variants (the authentic case118 bucket needs "
                         "it, see train_pretrained.py --grad-clip). "
                         "Default None = off for cold starts, inherited "
                         "from the warm start for the fine-tunes; an "
                         "explicit 0 disables clipping everywhere")
    args = ap.parse_args()
    cold_grad_clip = 0.0 if args.grad_clip is None else args.grad_clip

    from gns_tpu.train.checkpoint import export_torch
    from gns_tpu.train.trainer import train, train_multi
    from gns_tpu.utils.augment import generate_cases
    from gns_tpu.utils.config import GNSConfig
    from gns_tpu.utils.prepare import batch_from_cases

    if "deep300" in args.which:
        cfg = GNSConfig(
            case_nr=300, K=8, latent_dim=40, hidden_dim=10,
            multiple_phi=True, reference_parity=True, seed=0,
            epochs=args.epochs, early_stop_patience=args.patience,
            batch_size=128,
        )
        data = batch_from_cases(list(generate_cases(300, args.grids, seed=0))[1:])
        t0 = time.perf_counter()
        best, history = train(cfg, data)
        path = os.path.join(ASSET_DIR, "pretrained_c300_K8_L40_H10.pth")
        export_torch(path, best, cfg)
        print(json.dumps({
            "which": "deep300", "epochs_run": len(history),
            "train_sec": round(time.perf_counter() - t0, 1),
            "final_train_residual": round(history[-1]["final_loss"], 5),
            "heldout_residual": round(heldout_residual(best.params, cfg, 300), 5),
            "path": os.path.relpath(path, REPO),
        }), flush=True)

    if "deep300-paper" in args.which:
        cfg = GNSConfig(
            case_nr=300, K=8, latent_dim=40, hidden_dim=10,
            multiple_phi=True, reference_parity=False, qg_gen_only=True,
            true_shunts=args.true_shunts, dispatch=args.dispatch,
            v_anchor=args.v_anchor, grad_clip=cold_grad_clip,
            seed=0, epochs=args.epochs, early_stop_patience=args.patience,
            batch_size=128,
        )
        data = batch_from_cases(
            list(generate_cases(300, args.grids, seed=0, scale=0.5))[1:],
            paper_shunts=not cfg.true_shunts,
        )
        t0 = time.perf_counter()
        best, history = train(cfg, data)
        path = os.path.join(ASSET_DIR, "pretrained_c300_K8_L40_H10_paper.pth")
        export_torch(path, best, cfg)
        from gns_tpu.eval.harness import compute_metrics, run_gns, run_nr_oracle

        held_cases = list(generate_cases(
            300, 64, seed=12345, scale=0.5, feasible_only=True))[1:]
        m = compute_metrics(
            run_nr_oracle(held_cases), run_gns(best.params, cfg, held_cases)
        )
        print(json.dumps({
            "which": "deep300-paper", "epochs_run": len(history),
            "train_sec": round(time.perf_counter() - t0, 1),
            "final_train_residual": round(history[-1]["final_loss"], 5),
            "v_mse_vs_nr": round(m["v_mse"], 6),
            "path": os.path.relpath(path, REPO),
        }), flush=True)

    if "multi-paper" in args.which:
        cases = [9, 14, 30, 118, 300]
        scales = {9: 1.0, 14: 1.0, 30: 1.0, 118: 1.0, 300: 0.5}
        cfg = GNSConfig(
            case_nr=0, K=4, latent_dim=20, hidden_dim=10,
            multiple_phi=True, reference_parity=False, qg_gen_only=True,
            true_shunts=args.true_shunts, dispatch=args.dispatch,
            v_anchor=args.v_anchor, grad_clip=cold_grad_clip,
            seed=0, epochs=args.epochs, early_stop_patience=args.patience,
            batch_size=128,
        )
        per = max(8, args.grids // len(cases))
        datasets = [
            batch_from_cases(
                list(generate_cases(c, per, seed=i, scale=scales[c]))[1:],
                paper_shunts=not cfg.true_shunts,
            )
            for i, c in enumerate(cases)
        ]
        t0 = time.perf_counter()
        best, history = train_multi(cfg, datasets)
        path = os.path.join(ASSET_DIR, "pretrained_multi_K4_L20_H10_paper.pth")
        export_torch(path, best, cfg)
        from gns_tpu.eval.harness import compute_metrics, run_gns, run_nr_oracle

        v_mses = {}
        for c in cases:
            held = list(generate_cases(
                c, 32, seed=12345, scale=scales[c], feasible_only=True))[1:]
            m = compute_metrics(
                run_nr_oracle(held),
                run_gns(best.params, cfg.replace(case_nr=c), held),
            )
            v_mses[f"c{c}"] = round(m["v_mse"], 6)
        print(json.dumps({
            "which": "multi-paper", "cases": cases,
            "epochs_run": len(history),
            "train_sec": round(time.perf_counter() - t0, 1),
            "v_mse_vs_nr": v_mses,
            "path": os.path.relpath(path, REPO),
        }), flush=True)

    for sup_key, warm_key, fname in (
        ("multi-sup", "multi-paper", "pretrained_multi_K4_L20_H10_sup.pth"),
        ("multi-deep-sup", "multi-deep-paper",
         "pretrained_multi_K8_L40_H10_sup.pth"),
    ):
      if sup_key not in args.which:
        continue
      if True:
        # Supervised fine-tune of the (multi-/multi-deep-)paper
        # generalist (VERDICT r2 item 7): the generalist is already the
        # most accurate case30 model (cross-case training regularizes
        # against branch drift, ROADMAP #7) and NR-label fine-tuning
        # lifted every specialist — this combines both. Same per-case
        # buckets, NR labels from the float64 oracle. The architecture
        # (K4 or the deep K8/L40) is inherited from the warm start.
        from gns_tpu.eval.harness import compute_metrics, run_gns, run_nr_oracle
        from gns_tpu.models.pretrained import load_pretrained
        from gns_tpu.train.supervised import (
            nr_labels,
            train_supervised_multi,
        )
        from gns_tpu.train.trainer import init_train_state

        import jax

        cases = [9, 14, 30, 118, 300]
        scales = {9: 1.0, 14: 1.0, 30: 1.0, 118: 1.0, 300: 0.5}
        warm_params, wcfg = load_pretrained(warm_key)
        cfg = wcfg.replace(
            epochs=args.epochs, early_stop_patience=args.patience,
            batch_size=128, seed=0,
            # keep the warm start's clip unless the caller overrides:
            # the stiff authentic 118 bucket needs it (CLAUDE.md)
            grad_clip=(wcfg.grad_clip if args.grad_clip is None
                       else args.grad_clip),
        )
        per = max(8, args.grids // len(cases))
        datasets, label_sets = [], []
        for i, c in enumerate(cases):
            cs = list(generate_cases(
                c, per, seed=i, scale=scales[c], feasible_only=True
            ))[1:]
            data = batch_from_cases(cs, paper_shunts=not cfg.true_shunts)
            datasets.append(data)
            label_sets.append(nr_labels(cs, n_pad=data.buses.shape[1]))
        state = init_train_state(jax.random.key(0), cfg)._replace(
            params=warm_params
        )
        t0 = time.perf_counter()
        best, history = train_supervised_multi(
            cfg, datasets, label_sets, state=state
        )
        path = os.path.join(ASSET_DIR, fname)
        export_torch(path, best, cfg)
        v_mses = {}
        for c in cases:
            held = list(generate_cases(
                c, 32, seed=12345, scale=scales[c], feasible_only=True))[1:]
            m = compute_metrics(
                run_nr_oracle(held),
                run_gns(best.params, cfg.replace(case_nr=c), held),
            )
            v_mses[f"c{c}"] = round(m["v_mse"], 6)
        print(json.dumps({
            "which": sup_key, "cases": cases,
            "epochs_run": len(history),
            "train_sec": round(time.perf_counter() - t0, 1),
            "v_mse_vs_nr": v_mses,
            "path": os.path.relpath(path, REPO),
        }), flush=True)

    if "multi" in args.which:
        cases = [9, 14, 30, 118, 300]
        cfg = GNSConfig(
            case_nr=0, K=4, latent_dim=20, hidden_dim=10,
            multiple_phi=True, reference_parity=True, seed=0,
            epochs=args.epochs, early_stop_patience=args.patience,
            batch_size=128,
        )
        per = max(8, args.grids // len(cases))
        datasets = [
            batch_from_cases(list(generate_cases(c, per, seed=i))[1:])
            for i, c in enumerate(cases)
        ]
        t0 = time.perf_counter()
        best, history = train_multi(cfg, datasets)
        path = os.path.join(ASSET_DIR, "pretrained_multi_K4_L20_H10.pth")
        export_torch(path, best, cfg)
        print(json.dumps({
            "which": "multi", "cases": cases, "epochs_run": len(history),
            "train_sec": round(time.perf_counter() - t0, 1),
            "final_group_residuals": [
                round(x, 5) for x in history[-1]["group_losses"]
            ],
            "heldout_residuals": {
                c: round(heldout_residual(best.params, cfg, c, n=32), 5)
                for c in cases
            },
            "path": os.path.relpath(path, REPO),
        }), flush=True)


if __name__ == "__main__":
    main()
