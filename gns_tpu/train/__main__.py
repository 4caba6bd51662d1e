"""Training CLI: `python -m gns_tpu.train` (reference: GNS/main.py main()).

Unlike the reference (edit-in-place constants), everything is a flag.
"""

from __future__ import annotations

import argparse
import os

import jax


def main():
    p = argparse.ArgumentParser(description="Train a GNS model")
    p.add_argument("--case", type=int, default=14)
    p.add_argument("--cases", type=int, nargs="+", default=None,
                   help="mega-batch mode: train one model on a mix of cases "
                        "(e.g. --cases 9 14 30) padded to a common bucket "
                        "(BASELINE config #5). Overrides --case; grids are "
                        "generated on the fly with --seed.")
    p.add_argument("--K", type=int, default=4)
    p.add_argument("--latent", type=int, default=20)
    p.add_argument("--hidden", type=int, default=10)
    p.add_argument("--gamma", type=float, default=0.9)
    p.add_argument("--multiple-phi", action="store_true", default=True)
    p.add_argument("--single-phi", dest="multiple_phi", action="store_false")
    p.add_argument("--epochs", type=int, default=101)
    p.add_argument("--batch-size", type=int, default=128)
    p.add_argument("--nr-samples", type=int, default=256)
    p.add_argument("--optimizer", choices=["adam", "adagrad"], default="adam")
    p.add_argument("--lr", type=float, default=None)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--data-dir", default=None)
    p.add_argument("--method", default="auto", choices=["auto", "scatter", "onehot", "hybrid", "pallas"])
    p.add_argument("--paper-physics", action="store_true",
                   help="use paper-correct physics instead of reference parity")
    p.add_argument("--qg-gen-only", action="store_true",
                   help="paper mode: reactive generation only at generator "
                        "buses (the quirk-Q8 fix — live load-bus reactive "
                        "residual; required for accurate large-case training)")
    p.add_argument("--dispatch", choices=["lambda", "setpoint_slack"],
                   default="lambda",
                   help="paper-mode generator convention (utils/config.py)")
    p.add_argument("--v-anchor", type=float, default=0.0,
                   help="paper mode: weak (v-1)^2 tie-breaker on free buses "
                        "toward the high-voltage power-flow branch "
                        "(GNSConfig.v_anchor)")
    p.add_argument("--true-shunts", action="store_true",
                   help="paper mode: keep each case's true Gs/Bs instead of "
                        "the reference's paper defaults, so the residual "
                        "models the grid the NR oracle solves "
                        "(GNSConfig.true_shunts; in-memory --cases data "
                        "only — pickle/npz datasets bake the paper shunts "
                        "in at generation time)")
    p.add_argument("--scale", type=float, default=1.0,
                   help="augmentation strength for --cases in-memory data "
                        "(case300 needs <=0.5 to stay NR-solvable)")
    p.add_argument("--out-dir", default="models")
    p.add_argument("--runs-dir", default="runs")
    p.add_argument("--export-torch", action="store_true",
                   help="also write a reference-layout .pth next to the Orbax checkpoint")
    p.add_argument("--resume", default=None, metavar="CKPT",
                   help="resume from an Orbax checkpoint directory "
                        "(params + optimizer state + step counter)")
    p.add_argument("--cpu", action="store_true", help="force the CPU backend")
    args = p.parse_args()

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from gns_tpu.train.checkpoint import checkpoint_name, export_torch, save_checkpoint
    from gns_tpu.train.metrics import MetricsLogger
    from gns_tpu.train.trainer import train
    from gns_tpu.utils.config import GNSConfig
    from gns_tpu.utils.prepare import load_all_grids, load_prepared

    cfg = GNSConfig(
        case_nr=args.case, K=args.K, latent_dim=args.latent,
        hidden_dim=args.hidden, gamma=args.gamma, multiple_phi=args.multiple_phi,
        epochs=args.epochs, batch_size=args.batch_size, nr_samples=args.nr_samples,
        optimizer=args.optimizer, learning_rate=args.lr, seed=args.seed,
        reference_parity=not args.paper_physics,
        qg_gen_only=args.qg_gen_only, dispatch=args.dispatch,
        true_shunts=args.true_shunts, v_anchor=args.v_anchor,
    )
    if args.true_shunts and not args.cases:
        raise SystemExit(
            "--true-shunts needs in-memory data (--cases ...): stored "
            "pickle/npz datasets are prepared with the paper shunts"
        )

    if args.cases:
        # Mixed-case training: one model, one dataset (and bucket) per
        # case — each group keeps its own shapes + shared topology, so
        # nothing pays the largest case's padding (train_multi).
        from gns_tpu.utils.augment import generate_cases
        from gns_tpu.utils.prepare import batch_from_cases

        per = max(1, cfg.nr_samples // len(args.cases))
        datasets = [
            batch_from_cases(
                list(generate_cases(c, per, seed=cfg.seed + i, scale=args.scale))[1:],
                paper_shunts=not cfg.true_shunts,
            )
            for i, c in enumerate(args.cases)
        ]
        print(
            f"mega-batch: {len(datasets)} case groups {args.cases}, "
            f"{per} grids each; devices: {jax.devices()}"
        )
        data = None
    else:
        try:
            data = load_prepared(args.case, cfg.nr_samples, data_dir=args.data_dir)
        except FileNotFoundError:
            data = load_all_grids(args.case, cfg.nr_samples, data_dir=args.data_dir)
        print(f"loaded {data.batch_size} case{args.case} grids; devices: {jax.devices()}")

    name = checkpoint_name(cfg)
    if args.cases:
        # A mixed-case model must not masquerade as a per-case specialist:
        # encode the case list in the filename (c9-14-30, not c14).
        cases_tag = "c" + "-".join(str(c) for c in args.cases)
        name = name.replace(f"_c{cfg.case_nr}_", f"_{cases_tag}_", 1)
    os.makedirs(args.out_dir, exist_ok=True)

    def ckpt_fn(state, epoch, loss):
        save_checkpoint(os.path.join(args.out_dir, name), state)
        if args.export_torch:
            export_torch(os.path.join(args.out_dir, name + ".pth"), state, cfg)

    with MetricsLogger(args.runs_dir, run_name=name, config=vars(args)) as logger:
        def log_fn(row):
            logger.log(row)
            print(
                f"Epoch: {row['epoch']}, Final Loss: {row['final_loss']:.6f}, "
                f"{row['sec']:.2f}s"
            )

        state = None
        if args.resume:
            from gns_tpu.train.checkpoint import load_checkpoint

            state = load_checkpoint(args.resume, cfg)
            print(f"resumed from {args.resume} at step {int(state.step)}")
        if args.cases:
            from gns_tpu.train.trainer import train_multi

            best, history = train_multi(
                cfg, datasets, method=args.method, log_fn=log_fn,
                checkpoint_fn=ckpt_fn, state=state,
            )
        else:
            best, history = train(
                cfg, data, method=args.method, log_fn=log_fn,
                checkpoint_fn=ckpt_fn, state=state,
            )
    print(f"done; best checkpoint in {args.out_dir}/{name}")


if __name__ == "__main__":
    main()
