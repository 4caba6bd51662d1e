"""The case30 deep specialist, by the recipe that fixed the K4 one.

ROADMAP 9a''' measured the COLD-start deep (K=8/L40) case30 at 0.0067 —
better than every cold K4 recipe (0.031-0.055, no branch drift) but
short of the warm-started `30-sup` (0.0061). ROADMAP #7's lesson was
that the case30 specialist only beats the generalist by STARTING from
it (gentle lr 1e-4 keeps the generalist's drift-regularized basin);
this experiment applies exactly that recipe at deep capacity: fine-tune
`multi-deep-paper` (v MSE 0.00745 on case30) on the case30
paper-objective set at a gentle learning rate, and export as
`30-deep-paper` only if it beats the shipped best (30-sup, 0.00606).

Usage: python tools/exp_30_deep.py [--lr 1e-4] [--export]
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
    ap.add_argument("--patience", type=int, default=20)
    ap.add_argument("--eval-grids", type=int, default=64)
    ap.add_argument("--lr", type=float, default=1e-4)
    ap.add_argument("--export", action="store_true")
    args = ap.parse_args()

    import jax

    from gns_tpu.eval.harness import compute_metrics, run_gns, run_nr_oracle
    from gns_tpu.models.pretrained import load_pretrained
    from gns_tpu.train.checkpoint import export_torch
    from gns_tpu.train.trainer import init_train_state, train
    from gns_tpu.utils.augment import generate_cases
    from gns_tpu.utils.config import GNSConfig
    from gns_tpu.utils.prepare import batch_from_cases

    # the deep-paper recipe flags (cf. models/pretrained.py
    # "multi-deep-paper"), case30-bound, at the gentle fine-tune lr
    cfg = GNSConfig(
        case_nr=30, K=8, latent_dim=40, hidden_dim=10, multiple_phi=True,
        reference_parity=False, qg_gen_only=True,
        dispatch="setpoint_slack", true_shunts=True, v_anchor=0.1,
        init_correction_scale=0.1, learning_rate=args.lr,
        seed=0, epochs=args.epochs, early_stop_patience=args.patience,
        batch_size=128,
    )
    held_cases = list(generate_cases(
        30, args.eval_grids, seed=12345, feasible_only=True
    ))[1:]
    nr = run_nr_oracle(held_cases)

    data = batch_from_cases(
        list(generate_cases(30, args.grids, seed=0))[1:],
        paper_shunts=False,
    )
    warm_params, _ = load_pretrained("multi-deep-paper")
    state = init_train_state(jax.random.key(0), cfg)._replace(
        params=warm_params
    )
    t0 = time.perf_counter()
    best, hist = train(cfg, data, state=state)
    train_s = time.perf_counter() - t0
    m = compute_metrics(nr, run_gns(best.params, cfg, held_cases))

    path = None
    if args.export and m["v_mse"] < 0.00606:  # the shipped 30-sup
        path = os.path.join(ASSET_DIR,
                            "pretrained_c30_K8_L40_H10_paper.pth")
        export_torch(path, best, cfg)

    print(json.dumps({
        "which": "30-deep-warm", "lr": args.lr,
        "epochs_run": len(hist),
        "train_sec": round(train_s, 1),
        "v_mse_vs_nr": round(m["v_mse"], 6),
        "theta_centered_mse": round(m["theta_centered_mse"], 6),
        "baselines": {"30-sup": 0.00606, "30-paper": 0.00907,
                      "multi-deep-paper_c30": 0.00745,
                      "cold 30-deep": 0.0067},
        "exported": os.path.relpath(path, REPO) if path else None,
    }), flush=True)


if __name__ == "__main__":
    main()
