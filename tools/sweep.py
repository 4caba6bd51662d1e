"""Hyperparameter sweep driver: the working version of the grid search the
reference sketches and comments out (reference: GNS/main.py:215-225, which
loops K x latent_dim x hidden_dim x multiple_phi around main()).

Trains one model per config combination with the jitted epoch-scan step,
records best/final physics residuals (and optional held-out v/theta MSE vs
the built-in Newton-Raphson oracle), and writes one CSV row per config via
train.metrics.MetricsLogger (wandb mirroring when WANDB_API_KEY is set —
the reference's hardcoded-key tracking is deliberately not replicated).

Usage:
    python tools/sweep.py --case 14 --K 4 8 --latent 10 20 --hidden 10 \
        --epochs 30 --samples 256 [--eval-samples 64] [--seeds 0 1]

Ranked results print at the end; full rows land in runs/sweep_*.csv.
"""

from __future__ import annotations

import argparse
import itertools
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--case", type=int, default=14)
    p.add_argument("--K", type=int, nargs="+", default=[4])
    p.add_argument("--latent", type=int, nargs="+", default=[20])
    p.add_argument("--hidden", type=int, nargs="+", default=[10])
    p.add_argument("--multiple-phi", type=int, nargs="+", default=[1],
                   choices=[0, 1])
    p.add_argument("--optimizer", nargs="+", default=["adam"])
    p.add_argument("--seeds", type=int, nargs="+", default=[0])
    p.add_argument("--epochs", type=int, default=30)
    p.add_argument("--samples", type=int, default=256)
    p.add_argument("--batch", type=int, default=128)
    p.add_argument("--eval-samples", type=int, default=0,
                   help="held-out grids to score vs the NR oracle (0 = skip)")
    p.add_argument("--compute-dtype", default="bfloat16")
    p.add_argument("--out-dir", default="runs")
    args = p.parse_args()

    from gns_tpu.train.metrics import MetricsLogger
    from gns_tpu.train.trainer import train
    from gns_tpu.utils.augment import generate_cases
    from gns_tpu.utils.config import GNSConfig
    from gns_tpu.utils.prepare import batch_from_cases

    cases = list(generate_cases(
        args.case, args.samples + args.eval_samples, seed=1234
    ))
    data = batch_from_cases(cases[1 : args.samples + 1])
    eval_cases = cases[args.samples + 1 :] if args.eval_samples else []

    nr = None
    if eval_cases:
        from gns_tpu.eval.harness import run_nr_oracle

        nr = run_nr_oracle(eval_cases)

    grid = list(itertools.product(
        args.K, args.latent, args.hidden, args.multiple_phi,
        args.optimizer, args.seeds,
    ))
    print(f"sweep: {len(grid)} configs x {args.epochs} epochs "
          f"on case{args.case} ({args.samples} grids)", flush=True)

    results = []
    logger = MetricsLogger(
        out_dir=args.out_dir, run_name=f"sweep_{int(time.time())}",
        config=vars(args),
    )
    for K, latent, hidden, mphi, opt, seed in grid:
        cfg = GNSConfig(
            case_nr=args.case, K=K, latent_dim=latent, hidden_dim=hidden,
            multiple_phi=bool(mphi), optimizer=opt, seed=seed,
            epochs=args.epochs, batch_size=min(args.batch, args.samples),
            nr_samples=args.samples, compute_dtype=args.compute_dtype,
            reference_parity=False,
        )
        t0 = time.perf_counter()
        best, history = train(cfg, data)
        sec = time.perf_counter() - t0
        best_loss = min(h["final_loss"] for h in history)
        row = {
            "K": K, "latent": latent, "hidden": hidden,
            "multiple_phi": mphi, "optimizer": opt, "seed": seed,
            "best_last_loss": best_loss,
            "final_last_loss": history[-1]["final_loss"],
            "epochs_ran": len(history),
            "train_sec": round(sec, 2),
            "params": sum(
                int(x.size)
                for x in __import__("jax").tree.leaves(best.params)
            ),
        }
        if nr is not None:
            from gns_tpu.eval.harness import compute_metrics, run_gns

            gns = run_gns(best.params, cfg, eval_cases)
            m = compute_metrics(nr, gns)
            row["v_mse"] = m["v_mse"]
            row["theta_centered_mse"] = m["theta_centered_mse"]
        logger.log(row)
        results.append(row)
        print(f"  K={K} L={latent} H={hidden} mphi={mphi} {opt} seed={seed}: "
              f"best {best_loss:.5f} ({len(history)} ep, {sec:.1f}s)"
              + (f", v_mse {row['v_mse']:.5f}" if nr is not None else ""),
              flush=True)
    logger.close()

    key = "v_mse" if nr is not None else "best_last_loss"
    results.sort(key=lambda r: r[key])
    print(f"\nranked by {key}:")
    for r in results[:10]:
        print(f"  {r[key]:.5f}  K={r['K']} L={r['latent']} H={r['hidden']} "
              f"mphi={r['multiple_phi']} {r['optimizer']} seed={r['seed']}")
    print(f"rows: {logger.path}")


if __name__ == "__main__":
    main()
