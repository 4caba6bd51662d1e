"""Outage-aware GNS: predict POST-contingency states (N-1) directly.

The reference's input schema cannot represent an outage (no status
column, raw impedance features — GNS/utils.py:29-33), so any GNS
prediction for a contingency variant is really a prediction of the
PRE-contingency state (eval/contingency.py). This experiment trains the
first outage-aware variant of the model family:

  * GNSConfig.admittance_inputs=True — the message MLPs see
    (g, b_series, b, tau, shift) instead of raw (r, x, b, tau, shift),
    so an outage encoded as r=x=1e6, b=0 is a well-scaled ZERO feature
    (in raw impedance space it would be off-distribution garbage);
  * training grids are reference-strength augmented case dicts where a
    random single branch is outaged with probability --outage-prob
    (islanding draws rejected by NR-feasibility filtering), encoded the
    same way — the physics residual consumes the raw r/x/b and models
    the outage consistently (admittance ~1e-6).

Evaluation on held-out OUTAGED grids (v MSE vs the NR post-contingency
solution) against the operational blind baseline: the shipped
{case}-paper model fed the intact pre-contingency inputs (the best a
status-blind schema can do). Also reports accuracy on ordinary
(non-outaged) held-out grids to show what the representation costs on
the base task. Prints one JSON line per row; --export ships the
checkpoint as "{case}-n1".

Usage: python tools/exp_outage_aware.py [--case 14] [--export]
"""

from __future__ import annotations

import argparse
import copy
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

ASSET_DIR = os.path.join(REPO, "gns_tpu", "utils", "case_assets")


def apply_random_outage(case, rng, prob):
    """With probability `prob`, outage one random branch (status=0 AND the
    admittance-space encoding r=x=1e6, b=0). Returns (case, outaged?)."""
    if rng.random() >= prob:
        return case, False
    case = copy.deepcopy(case)
    br = case["branch"]
    i = int(rng.integers(br.shape[0]))
    br[i, 10] = 0.0
    br[i, 2] = 1e6
    br[i, 3] = 1e6
    br[i, 4] = 0.0
    return case, True


def outaged_set(case_nr, n, seed, prob, scale=1.0):
    """n NR-feasible augmented grids with random encoded outages
    (rejection-sampled: islanding/diverging draws are discarded)."""
    import numpy as np

    from gns_tpu.eval.newton_raphson import newton_raphson_pf
    from gns_tpu.utils.augment import generate_cases

    rng = np.random.default_rng(seed)
    out = []
    gen_seed = seed
    while len(out) < n:
        batch = list(generate_cases(
            case_nr, max(16, n - len(out)), seed=gen_seed, scale=scale
        ))[1:]
        gen_seed += 1
        for c in batch:
            c2, _ = apply_random_outage(c, rng, prob)
            if newton_raphson_pf(c2).success:
                out.append(c2)
                if len(out) == n:
                    break
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--case", type=int, default=14)
    ap.add_argument("--grids", type=int, default=1024)
    ap.add_argument("--epochs", type=int, default=400)
    ap.add_argument("--patience", type=int, default=20)
    ap.add_argument("--eval-grids", type=int, default=64)
    ap.add_argument("--outage-prob", type=float, default=0.7)
    ap.add_argument("--scale", type=float, default=1.0)
    ap.add_argument("--grad-clip", type=float, default=0.0,
                    help="use 1.0 for case118 (see train_pretrained.py)")
    ap.add_argument("--warmup", type=int, default=0)
    ap.add_argument("--export", action="store_true")
    args = ap.parse_args()

    import numpy as np

    from gns_tpu.eval.harness import compute_metrics, run_gns, run_nr_oracle
    from gns_tpu.models.pretrained import load_pretrained
    from gns_tpu.train.checkpoint import export_torch
    from gns_tpu.train.trainer import train
    from gns_tpu.utils.augment import generate_cases
    from gns_tpu.utils.config import GNSConfig
    from gns_tpu.utils.prepare import batch_from_cases

    cfg = GNSConfig(
        case_nr=args.case, K=4, latent_dim=20, hidden_dim=10,
        multiple_phi=True, reference_parity=False, qg_gen_only=True,
        dispatch="setpoint_slack", true_shunts=True, v_anchor=0.1,
        admittance_inputs=True,
        grad_clip=args.grad_clip, warmup_steps=args.warmup,
        seed=0, epochs=args.epochs, early_stop_patience=args.patience,
        batch_size=128,
    )

    t0 = time.perf_counter()
    train_cases = outaged_set(args.case, args.grids, seed=0,
                              prob=args.outage_prob, scale=args.scale)
    data = batch_from_cases(train_cases, paper_shunts=False)
    gen_s = time.perf_counter() - t0

    t0 = time.perf_counter()
    best, hist = train(cfg, data)
    train_s = time.perf_counter() - t0

    # held-out OUTAGED grids (every grid outaged: the N-1 task itself)
    held_out = outaged_set(args.case, args.eval_grids, seed=999, prob=1.0)
    nr_out = run_nr_oracle(held_out)
    m_aware = compute_metrics(nr_out, run_gns(best.params, cfg, held_out))

    # blind baseline: the shipped paper model sees the INTACT grids
    # (its schema cannot represent the outage) but is scored against the
    # post-contingency NR solution — the operational status quo
    blind_params, blind_cfg = load_pretrained(f"{args.case}-paper")
    # the blind model must see the ORIGINAL pre-outage parameters, so
    # rebuild each outaged draw's intact twin by replaying the same
    # rng/seed/rejection stream as outaged_set(seed=999, prob=1.0) and
    # keeping the UN-outaged case everywhere the outaged one was accepted
    held_intact = []
    rng = np.random.default_rng(999)
    gen_seed = 999
    from gns_tpu.eval.newton_raphson import newton_raphson_pf
    while len(held_intact) < len(held_out):
        batch = list(generate_cases(
            args.case, max(16, len(held_out) - len(held_intact)),
            seed=gen_seed))[1:]
        gen_seed += 1
        for c in batch:
            c2, _ = apply_random_outage(c, rng, 1.0)
            if newton_raphson_pf(c2).success:
                held_intact.append(c)  # the INTACT twin of the outaged draw
                if len(held_intact) == len(held_out):
                    break
    gns_blind = run_gns(blind_params, blind_cfg, held_intact)
    m_blind = compute_metrics(nr_out, gns_blind)

    # ordinary-task cost: both models on non-outaged held-out grids
    held_plain = [c for c in list(generate_cases(
        args.case, args.eval_grids, seed=12345, feasible_only=True))[1:]]
    nr_plain = run_nr_oracle(held_plain)
    m_plain_aware = compute_metrics(
        nr_plain, run_gns(best.params, cfg, held_plain)
    )
    m_plain_blind = compute_metrics(
        nr_plain, run_gns(blind_params, blind_cfg, held_plain)
    )

    print(json.dumps({
        "case": args.case, "outage_prob": args.outage_prob,
        "epochs_run": len(hist),
        "gen_sec": round(gen_s, 1), "train_sec": round(train_s, 1),
        "outaged_v_mse_aware": round(m_aware["v_mse"], 6),
        "outaged_v_mse_blind": round(m_blind["v_mse"], 6),
        "plain_v_mse_aware": round(m_plain_aware["v_mse"], 6),
        "plain_v_mse_blind": round(m_plain_blind["v_mse"], 6),
    }), flush=True)

    if args.export:
        path = os.path.join(
            ASSET_DIR, f"pretrained_c{args.case}_K4_L20_H10_n1.pth"
        )
        export_torch(path, best, cfg)
        print(json.dumps({"exported": os.path.relpath(path, REPO)}),
              flush=True)


if __name__ == "__main__":
    main()
