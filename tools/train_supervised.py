"""Train/fine-tune a GNS checkpoint supervised against Newton-Raphson labels.

The reference never closes the loop between its NR evaluation and its
physics-only training (GNS/main.py:198 vs evaluate.py:25-40); with the
built-in solvers labeling a 1k-grid set costs seconds, so supervision is
cheap. Trains with loss = sup + w_physics * physics (train/supervised.py),
optionally warm-started from a shipped checkpoint, and scores v MSE vs NR
on held-out feasible grids. Prints one JSON line.

Usage:
  python tools/train_supervised.py --case 30 --warm-start 30-paper
  python tools/train_supervised.py --case 300 --scale 0.5 --export
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
    ap.add_argument("--case", type=int, default=30)
    ap.add_argument("--grids", type=int, default=1024)
    ap.add_argument("--epochs", type=int, default=400)
    ap.add_argument("--patience", type=int, default=20)
    ap.add_argument("--eval-grids", type=int, default=64)
    ap.add_argument("--scale", type=float, default=1.0)
    ap.add_argument("--w-physics", type=float, default=0.1)
    ap.add_argument("--grad-clip", type=float, default=0.0,
                    help="global-norm gradient clip (GNSConfig.grad_clip; "
                         "needed on the authentic case118, see "
                         "train_pretrained.py --grad-clip)")
    ap.add_argument("--K", type=int, default=4)
    ap.add_argument("--latent", type=int, default=20)
    ap.add_argument("--hidden", type=int, default=10)
    ap.add_argument("--warm-start", default=None,
                    help="pretrained key to initialize from (e.g. 30-paper)")
    ap.add_argument("--label-backend", choices=["scipy", "batched"],
                    default="scipy")
    ap.add_argument("--true-shunts", action="store_true",
                    help="keep each case's true Gs/Bs in the physics term "
                         "instead of the reference's paper defaults "
                         "(GNSConfig.true_shunts)")
    ap.add_argument("--export", action="store_true",
                    help="export pretrained_c{case}_..._sup.pth")
    args = ap.parse_args()

    import jax

    from gns_tpu.eval.harness import compute_metrics, run_gns, run_nr_oracle
    from gns_tpu.train.supervised import nr_labels, train_supervised
    from gns_tpu.utils.augment import generate_cases
    from gns_tpu.utils.config import GNSConfig
    from gns_tpu.utils.prepare import batch_from_cases

    cfg = GNSConfig(
        case_nr=args.case, K=args.K, latent_dim=args.latent,
        hidden_dim=args.hidden, multiple_phi=True,
        reference_parity=False, qg_gen_only=True,
        true_shunts=args.true_shunts, grad_clip=args.grad_clip,
        seed=0, epochs=args.epochs, early_stop_patience=args.patience,
        batch_size=128,
    )
    t0 = time.perf_counter()
    train_cases = list(generate_cases(
        args.case, args.grids, seed=0, scale=args.scale, feasible_only=True
    ))[1:]
    data = batch_from_cases(train_cases, paper_shunts=not args.true_shunts)
    labels = nr_labels(train_cases, n_pad=data.buses.shape[1],
                       backend=args.label_backend)
    label_s = time.perf_counter() - t0

    state = None
    if args.warm_start:
        from gns_tpu.models.pretrained import load_pretrained
        from gns_tpu.train.trainer import init_train_state

        params, wcfg = load_pretrained(args.warm_start)
        if (wcfg.K, wcfg.latent_dim, wcfg.hidden_dim) != (
            cfg.K, cfg.latent_dim, cfg.hidden_dim
        ):
            raise SystemExit("warm-start checkpoint shape mismatch")
        state = init_train_state(jax.random.key(0), cfg)._replace(
            params=params
        )

    t0 = time.perf_counter()
    best, history = train_supervised(
        cfg, data, labels, w_physics=args.w_physics, state=state
    )
    train_s = time.perf_counter() - t0

    held_cases = list(generate_cases(
        args.case, args.eval_grids, seed=12345, scale=args.scale,
        feasible_only=True,
    ))[1:]
    m = compute_metrics(
        run_nr_oracle(held_cases), run_gns(best.params, cfg, held_cases)
    )

    path = None
    if args.export:
        from gns_tpu.train.checkpoint import export_torch

        path = os.path.join(
            ASSET_DIR,
            f"pretrained_c{args.case}_K{args.K}_L{args.latent}_"
            f"H{args.hidden}_sup.pth",
        )
        export_torch(path, best, cfg)

    print(json.dumps({
        "case": args.case,
        "warm_start": args.warm_start,
        "w_physics": args.w_physics,
        "epochs_run": len(history),
        "label_sec": round(label_s, 1),
        "train_sec": round(train_s, 1),
        "best_sup": round(min(h["sup"] for h in history), 6),
        "v_mse_vs_nr": round(m["v_mse"], 6),
        "v_abs_mean": round(m["v_abs_diff_mean"], 5),
        "theta_centered_mse": round(m["theta_centered_mse"], 6),
        "path": os.path.relpath(path, REPO) if path else None,
    }), flush=True)


if __name__ == "__main__":
    main()
