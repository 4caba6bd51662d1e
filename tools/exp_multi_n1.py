"""The admittance-space GENERALIST (multi-n1) and its warm-started
specialists — growing the outage-aware family (VERDICT round-3 #2,
ROADMAP #9).

Round 3 established two facts that this experiment combines:

  * cross-case training regularizes against the case30 branch-drift trap
    (the multi-paper generalist scores ~0.009 where every cold-start
    case30 specialist landed 0.03-0.5; ROADMAP #7), and the ONLY recipe
    that transfers that basin to a specialist is warm-starting from the
    generalist at a GENTLE lr (1e-4; lr 1e-3 leaves the basin);
  * the outage-aware (admittance_inputs) representation beats the blind
    schema exactly where outage severity exceeds the model's error floor
    (case14 1.76x; ROADMAP #9) — but its case30 result was CONFOUNDED:
    cold-start single-case training fell into the same branch-drift trap
    regardless of representation, and the named fix (warm-start from an
    admittance-space generalist) did not exist.

This tool builds that missing generalist and resolves the confound:

  --which multi-n1  : train ONE admittance-space model round-robin over
      outage-augmented sets of all five cases (outage prob 0.7,
      NR-feasibility-filtered; case300 at scale 0.5 per ROADMAP #6;
      grad_clip 1.0 + warmup because the mix contains the stiff
      authentic case118, CLAUDE.md) -> ships as "multi-n1".
  --which 30-n1     : fine-tune multi-n1 on the case30 outage-augmented
      set at lr 1e-4 (the exact recipe that fixed plain case30)
      -> ships as "30-n1"; evaluated on held-out fully-outaged case30
      grids against the blind 30-paper baseline (the operational status
      quo: intact inputs, scored on the post-contingency NR solution).
  --which 14-n1w/118-n1w : the same gentle warm-start for case14/118,
      reported against the shipped cold-start n1 specialists (exported
      only if better on the outaged task).

Prints one JSON line per trained model. Usage:
  python tools/exp_multi_n1.py --which multi-n1 30-n1 [--export]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

ASSET_DIR = os.path.join(REPO, "gns_tpu", "utils", "case_assets")

from exp_outage_aware import apply_random_outage, outaged_set  # noqa: E402


def _n1_cfg(case_nr: int, args, **over):
    from gns_tpu.utils.config import GNSConfig

    base = dict(
        case_nr=case_nr, K=4, latent_dim=20, hidden_dim=10,
        multiple_phi=True, reference_parity=False, qg_gen_only=True,
        dispatch="setpoint_slack", true_shunts=True, v_anchor=0.1,
        admittance_inputs=True,
        seed=0, epochs=args.epochs, early_stop_patience=args.patience,
        batch_size=128,
    )
    base.update(over)
    return GNSConfig(**base)


def _eval_outaged(params, cfg, case_nr, n, scale=1.0):
    """v MSE vs the post-contingency NR solution on n held-out grids,
    every one outaged (prob=1.0, seed 999 — the exp_outage_aware
    convention so rows are comparable across rounds)."""
    from gns_tpu.eval.harness import compute_metrics, run_gns, run_nr_oracle

    held = outaged_set(case_nr, n, seed=999, prob=1.0, scale=scale)
    nr = run_nr_oracle(held)
    m = compute_metrics(nr, run_gns(params, cfg.replace(case_nr=case_nr), held))
    return m["v_mse"], held, nr


def _eval_plain(params, cfg, case_nr, n, scale=1.0):
    from gns_tpu.eval.harness import compute_metrics, run_gns, run_nr_oracle
    from gns_tpu.utils.augment import generate_cases

    held = list(generate_cases(
        case_nr, n, seed=12345, scale=scale, feasible_only=True))[1:]
    m = compute_metrics(
        run_nr_oracle(held),
        run_gns(params, cfg.replace(case_nr=case_nr), held),
    )
    return m["v_mse"]


def _blind_baseline(case_nr, n, held_out, nr_out):
    """The shipped {case}-paper model fed the INTACT twins of the
    held-out outaged draws (replaying the rejection stream — the
    exp_outage_aware convention), scored on the post-contingency NR."""
    import numpy as np

    from gns_tpu.eval.harness import compute_metrics, run_gns
    from gns_tpu.eval.newton_raphson import newton_raphson_pf
    from gns_tpu.models.pretrained import load_pretrained
    from gns_tpu.utils.augment import generate_cases

    blind_params, blind_cfg = load_pretrained(f"{case_nr}-paper")
    held_intact = []
    rng = np.random.default_rng(999)
    gen_seed = 999
    while len(held_intact) < len(held_out):
        batch = list(generate_cases(
            case_nr, max(16, len(held_out) - len(held_intact)),
            seed=gen_seed))[1:]
        gen_seed += 1
        for c in batch:
            c2, _ = apply_random_outage(c, rng, 1.0)
            if newton_raphson_pf(c2).success:
                held_intact.append(c)
                if len(held_intact) == len(held_out):
                    break
    m = compute_metrics(nr_out, run_gns(blind_params, blind_cfg, held_intact))
    return m["v_mse"]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--which", nargs="+", default=["multi-n1", "30-n1"])
    ap.add_argument("--grids", type=int, default=1024,
                    help="total training grids (multi: split across cases)")
    ap.add_argument("--epochs", type=int, default=400)
    ap.add_argument("--patience", type=int, default=20)
    ap.add_argument("--eval-grids", type=int, default=64)
    ap.add_argument("--outage-prob", type=float, default=0.7)
    ap.add_argument("--ft-lr", type=float, default=1e-4,
                    help="gentle fine-tune lr (the ROADMAP #7 recipe)")
    ap.add_argument("--export", action="store_true")
    args = ap.parse_args()

    import jax

    from gns_tpu.models.pretrained import load_pretrained
    from gns_tpu.train.checkpoint import export_torch
    from gns_tpu.train.trainer import init_train_state, train, train_multi
    from gns_tpu.utils.prepare import batch_from_cases

    cases = [9, 14, 30, 118, 300]
    scales = {9: 1.0, 14: 1.0, 30: 1.0, 118: 1.0, 300: 0.5}

    if "multi-n1" in args.which:
        cfg = _n1_cfg(0, args, grad_clip=1.0, warmup_steps=300)
        per = max(8, args.grids // len(cases))
        t0 = time.perf_counter()
        datasets = [
            batch_from_cases(
                outaged_set(c, per, seed=i, prob=args.outage_prob,
                            scale=scales[c]),
                paper_shunts=False,
            )
            for i, c in enumerate(cases)
        ]
        gen_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        best, history = train_multi(cfg, datasets)
        train_s = time.perf_counter() - t0
        row = {
            "which": "multi-n1", "cases": cases,
            "epochs_run": len(history),
            "gen_sec": round(gen_s, 1), "train_sec": round(train_s, 1),
        }
        for c in cases:
            mse, _, _ = _eval_outaged(
                best.params, cfg, c, args.eval_grids, scale=scales[c]
            )
            row[f"outaged_v_mse_c{c}"] = round(mse, 6)
        if args.export:
            path = os.path.join(ASSET_DIR, "pretrained_multi_K4_L20_H10_n1.pth")
            export_torch(path, best, cfg)
            row["path"] = os.path.relpath(path, REPO)
        print(json.dumps(row), flush=True)

    if "118-deep" in args.which:
        # The case118 floor experiment (round 4): the round-3 negative —
        # "single outages move voltages less than the model error floor"
        # — is a statement about the K4/L20 floor (~4e-4). The deep
        # preset (K=8, latent 40 — the config that cut case300's
        # residual 5x) may push the floor BELOW case118's outage
        # severity (p90 6.7e-5 p.u.^2). Train a deep AWARE model and a
        # deep BLIND baseline at matched capacity, evaluate both on the
        # same fully-outaged held-out set.
        import numpy as np

        from gns_tpu.eval.harness import (
            compute_metrics,
            run_gns,
            run_nr_oracle,
        )
        from gns_tpu.eval.newton_raphson import newton_raphson_pf
        from gns_tpu.utils.augment import generate_cases
        from gns_tpu.utils.config import GNSConfig

        deep = dict(
            case_nr=118, K=8, latent_dim=40, hidden_dim=10,
            multiple_phi=True, reference_parity=False, qg_gen_only=True,
            dispatch="setpoint_slack", true_shunts=True, v_anchor=0.1,
            grad_clip=1.0, warmup_steps=300, seed=0, epochs=args.epochs,
            early_stop_patience=args.patience, batch_size=128,
            # at K=8 on stiff case118 the torch-default init's forward is
            # already NaN (|v| ~ 1e22 after 8 uncontrolled corrections);
            # 0.1 starts near identity with a finite loss (measured scan
            # in the round-4 log: 1.0 -> NaN, 0.1 -> loss ~283, v <= 1.16)
            init_correction_scale=0.1,
        )
        cfg_a = GNSConfig(admittance_inputs=True, **deep)
        cfg_b = GNSConfig(admittance_inputs=False, **deep)

        t0 = time.perf_counter()
        aware_cases = outaged_set(118, args.grids, seed=0,
                                  prob=args.outage_prob)
        blind_cases = list(generate_cases(
            118, args.grids, seed=0, feasible_only=True))[1:]
        gen_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        best_a, hist_a = train(
            cfg_a, batch_from_cases(aware_cases, paper_shunts=False)
        )
        best_b, hist_b = train(
            cfg_b, batch_from_cases(blind_cases, paper_shunts=False)
        )
        train_s = time.perf_counter() - t0

        held_out = outaged_set(118, args.eval_grids, seed=999, prob=1.0)
        nr_out = run_nr_oracle(held_out)
        # intact twins (replaying the rejection stream) for the blind arm
        held_intact = []
        rng = np.random.default_rng(999)
        gen_seed = 999
        while len(held_intact) < len(held_out):
            batch = list(generate_cases(
                118, max(16, len(held_out) - len(held_intact)),
                seed=gen_seed))[1:]
            gen_seed += 1
            for c in batch:
                c2, _ = apply_random_outage(c, rng, 1.0)
                if newton_raphson_pf(c2).success:
                    held_intact.append(c)
                    if len(held_intact) == len(held_out):
                        break
        nr_intact = run_nr_oracle(held_intact)

        g_a = run_gns(best_a.params, cfg_a, held_out)
        g_b = run_gns(best_b.params, cfg_b, held_intact)
        m_a = compute_metrics(nr_out, g_a)
        m_b = compute_metrics(nr_out, g_b)
        # per-grid outage severity (true post-vs-pre state shift) and the
        # severest-quartile split, the exp_outage_aware convention
        ok = nr_out["converged"] & nr_intact["converged"]
        sev = ((nr_out["v"] - nr_intact["v"]) ** 2).mean(axis=1)
        se_a = ((g_a["v"] - nr_out["v"]) ** 2).mean(axis=1)
        se_b = ((g_b["v"] - nr_out["v"]) ** 2).mean(axis=1)
        q = np.quantile(sev[ok], 0.75)
        top = ok & (sev >= q)
        row = {
            "which": "118-deep", "grids": args.grids,
            "epochs_run": [len(hist_a), len(hist_b)],
            "gen_sec": round(gen_s, 1), "train_sec": round(train_s, 1),
            "outaged_v_mse_aware_deep": round(m_a["v_mse"], 6),
            "outaged_v_mse_blind_deep": round(m_b["v_mse"], 6),
            "severe_q_v_mse_aware_deep": round(float(se_a[top].mean()), 6),
            "severe_q_v_mse_blind_deep": round(float(se_b[top].mean()), 6),
            "severity_p90": round(float(np.quantile(sev[ok], 0.9)), 8),
            "plain_v_mse_aware_deep": round(
                _eval_plain(best_a.params, cfg_a, 118, args.eval_grids), 6),
        }
        if args.export and m_a["v_mse"] < m_b["v_mse"]:
            path = os.path.join(
                ASSET_DIR, "pretrained_c118_K8_L40_H10_n1.pth"
            )
            export_torch(path, best_a, cfg_a)
            row["path"] = os.path.relpath(path, REPO)
        print(json.dumps(row), flush=True)

    for tag, case_nr in (("30-n1", 30), ("14-n1w", 14), ("118-n1w", 118)):
        if tag not in args.which:
            continue
        warm_params, wcfg = load_pretrained("multi-n1")
        over = dict(learning_rate=args.ft_lr)
        if case_nr == 118:
            over.update(grad_clip=1.0, warmup_steps=300)
        cfg = _n1_cfg(case_nr, args, **over)
        t0 = time.perf_counter()
        train_cases = outaged_set(
            case_nr, args.grids, seed=0, prob=args.outage_prob,
            scale=scales[case_nr],
        )
        data = batch_from_cases(train_cases, paper_shunts=False)
        gen_s = time.perf_counter() - t0
        state = init_train_state(jax.random.key(0), cfg)._replace(
            params=warm_params
        )
        t0 = time.perf_counter()
        best, history = train(cfg, data, state=state)
        train_s = time.perf_counter() - t0
        mse_aware, held_out, nr_out = _eval_outaged(
            best.params, cfg, case_nr, args.eval_grids,
            scale=scales[case_nr],
        )
        mse_blind = _blind_baseline(
            case_nr, args.eval_grids, held_out, nr_out
        )
        row = {
            "which": tag, "case": case_nr, "ft_lr": args.ft_lr,
            "epochs_run": len(history),
            "gen_sec": round(gen_s, 1), "train_sec": round(train_s, 1),
            "outaged_v_mse_aware": round(mse_aware, 6),
            "outaged_v_mse_blind": round(mse_blind, 6),
            "plain_v_mse_aware": round(
                _eval_plain(best.params, cfg, case_nr, args.eval_grids,
                            scale=scales[case_nr]), 6),
        }
        path = os.path.join(
            ASSET_DIR, f"pretrained_c{case_nr}_K4_L20_H10_n1.pth"
        )
        if args.export:
            # 30-n1 is a NEW checkpoint; 14/118 already ship cold-start
            # n1 specialists — only overwrite when the warm-started one
            # is measurably better on the same outaged eval set
            if tag.endswith("w") and os.path.exists(path):
                from gns_tpu.models.pretrained import load_pretrained as _lp

                old_params, old_cfg = _lp(f"{case_nr}-n1")
                mse_old, _, _ = _eval_outaged(
                    old_params, old_cfg, case_nr, args.eval_grids,
                    scale=scales[case_nr],
                )
                row["outaged_v_mse_shipped_n1"] = round(mse_old, 6)
                if mse_aware >= mse_old:
                    row["export"] = "skipped (shipped n1 is better)"
                    print(json.dumps(row), flush=True)
                    continue
            export_torch(path, best, cfg)
            row["path"] = os.path.relpath(path, REPO)
        print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
