"""Multi-seed accuracy head-to-heads: error bars for ACCURACY.md (round 5).

Round-4 VERDICT task 1: every head-to-head table row was single-seed, and
the one cell the reference wins (case118 protocol-regime v MSE,
ACCURACY.md:68) was explained as "a seed race" without evidence. This tool
re-runs the equal-budget protocol of tools/accuracy_parity.py across many
seeds on BOTH sides and appends per-seed rows to ACCURACY_SEEDS.json, so
the headline claims carry mean +/- std.

Protocol per row (identical to accuracy_parity.py): K=4/L20/H10/multi-phi,
Adam 1e-3, batch 128, 256 train grids, 101 epochs, early-stop patience
applied SYMMETRICALLY (2 = the reference's own rule, GNS/main.py:296-304;
100 = full budget). Both sides train on the same grids and evaluate on the
same 232 held-out grids against the Newton-Raphson oracle. The torch side
runs the reference's native loop (GNS/main.py:274-309) on CPU, pinned to
one thread so it can run in the background; its wall time is therefore NOT
comparable to the ACCURACY.md train-time rows and is flagged as such.

Fully resumable: completed (case, patience, seed, side) rows are skipped,
and in-progress torch training checkpoints itself per epoch.

Usage:
  python tools/accuracy_multiseed.py --side torch   # background, hours
  python tools/accuracy_multiseed.py --side jax     # minutes on the TPU
"""

from __future__ import annotations

import argparse
import fcntl
import json
import os
import pickle
import sys
import time
from contextlib import contextmanager

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
REF_DATA = "/root/reference/data"
OUT = os.path.join(REPO, "ACCURACY_SEEDS.json")

SEEDS = [101, 102, 103, 104, 105]

# (case, patience) regimes in priority order: the disputed cell first.
PLANS = [
    (118, 2),    # the losing cell (ACCURACY.md:68); ref ~82 s/seed
    (118, 100),  # full budget; ref ~980 s/seed
    (30, 2),     # ref ~960 s/seed
    (14, 2),     # ref ~1740 s/seed
]


@contextmanager
def _locked():
    """Both sides run concurrently (torch in the background); serialize the
    read-append-write on the shared JSON."""
    lock = open(OUT + ".lock", "w")
    try:
        fcntl.flock(lock, fcntl.LOCK_EX)
        yield
    finally:
        fcntl.flock(lock, fcntl.LOCK_UN)
        lock.close()


def _load_rows():
    if os.path.exists(OUT):
        with open(OUT) as f:
            return json.load(f)["rows"]
    return []


def _save_rows(rows):
    tmp = OUT + ".tmp"
    with open(tmp, "w") as f:
        json.dump({"rows": rows}, f, indent=2)
    os.replace(tmp, OUT)


def _have(rows, case, patience, seed, side):
    return any(r["case"] == case and r["patience"] == patience
               and r["seed"] == seed and r["side"] == side for r in rows)


def _data_for_case(case, nr_samples=256, eval_samples=232):
    """Same pools as accuracy_parity.py: shipped pickles for case14, the
    seeded (seed=20301) authentic-table pool for case30/118."""
    if case == 14:
        train_cases = None
        cases = []
        for i in range(1001 - eval_samples, 1001):
            with open(f"{REF_DATA}/case14/augmented_case14_{i}.pkl", "rb") as f:
                cases.append(pickle.load(f))
    else:
        from gns_tpu.utils.augment import generate_cases

        pool = list(generate_cases(case, 1000, seed=20301))
        train_cases = pool[1:1 + nr_samples]
        cases = pool[1001 - eval_samples:1001]
    return train_cases, cases


_NR_CACHE = {}


def _nr_for_case(case, cases):
    if case not in _NR_CACHE:
        from gns_tpu.eval.harness import run_nr_oracle

        _NR_CACHE[case] = run_nr_oracle(cases)
        conv = _NR_CACHE[case]["converged"].mean() * 100
        print(f"[nr] case{case}: {conv:.0f}% converged", flush=True)
    return _NR_CACHE[case]


def _metrics_row(nr, v, th, case, patience, seed, side, train_sec, epochs_ran):
    from gns_tpu.eval.harness import compute_metrics

    gns = {"time": np.zeros(v.shape[0], np.float32), "v": v, "theta": th,
           "last_loss": np.zeros(v.shape[0], np.float32),
           "line_flow": np.zeros_like(nr["line_flow"])}
    m = compute_metrics(nr, gns)
    return {"case": case, "patience": patience, "seed": seed, "side": side,
            "v_mse": m["v_mse"], "theta_mse": m["theta_mse"],
            "theta_centered_mse": m["theta_centered_mse"],
            "v_abs_mean": m["v_abs_diff_mean"],
            "theta_abs_mean": m["theta_abs_diff_mean"],
            "train_sec": train_sec, "epochs_ran": epochs_ran}


def run_torch(case, patience, seed, train_cases, cases, nr):
    import torch

    # background-friendly default; wall time NOT comparable either way
    torch.set_num_threads(int(os.environ.get("MS_TORCH_THREADS", "1")))
    from tools.accuracy_parity import eval_reference, train_reference

    resume = f"/tmp/acc_ms_c{case}_p{patience}_s{seed}.pt"
    sd, sec = train_reference(101, 4, 20, 10, True, 256, 128, seed,
                              resume_path=resume, train_cases=train_cases,
                              patience=patience)
    v, th = eval_reference(sd, cases, 4, 20, 10, True)
    return _metrics_row(nr, v, th, case, patience, seed, "reference",
                        sec, None)


def run_jax(case, patience, seed, train_cases, cases, nr):
    from gns_tpu.eval.harness import run_gns
    from gns_tpu.train.trainer import train
    from gns_tpu.utils.config import GNSConfig
    from gns_tpu.utils.prepare import batch_from_cases, load_all_grids

    cfg = GNSConfig(K=4, latent_dim=20, hidden_dim=10, multiple_phi=True,
                    epochs=101, nr_samples=256, seed=seed, case_nr=case,
                    batch_size=128, early_stop_patience=patience,
                    reference_parity=True)
    if case == 14:
        data = load_all_grids(14, 256, data_dir=REF_DATA)
    else:
        data = batch_from_cases(train_cases)
    t0 = time.perf_counter()
    best, history = train(cfg, data)
    sec = time.perf_counter() - t0
    gns = run_gns(best.params, cfg, cases)
    return _metrics_row(nr, gns["v"], gns["theta"], case, patience, seed,
                        "gns_tpu", sec, len(history))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--side", choices=["torch", "jax"], required=True)
    ap.add_argument("--seeds", type=str, default=None,
                    help="comma list; default 101..105")
    ap.add_argument("--plans", type=str, default=None,
                    help="comma list of case:patience, e.g. 118:2,118:100")
    args = ap.parse_args()
    if args.side == "torch":
        # keep the background torch runs off the TPU tunnel entirely: any
        # jax use (augmentation, NR helpers) goes to CPU (CLAUDE.md: must be
        # set in-process before jax initializes)
        import jax

        jax.config.update("jax_platforms", "cpu")
    seeds = [int(s) for s in args.seeds.split(",")] if args.seeds else SEEDS
    plans = ([tuple(int(x) for x in p.split(":"))
              for p in args.plans.split(",")] if args.plans else PLANS)

    for case, patience in plans:
        rows = _load_rows()
        todo = [s for s in seeds
                if not _have(rows, case, patience, s, ("reference" if
                             args.side == "torch" else "gns_tpu"))]
        if not todo:
            print(f"[plan c{case} p{patience}] complete", flush=True)
            continue
        train_cases, cases = _data_for_case(case)
        nr = _nr_for_case(case, cases)
        for seed in todo:
            t0 = time.perf_counter()
            print(f"[plan c{case} p{patience}] seed {seed} "
                  f"({args.side})...", flush=True)
            if args.side == "torch":
                row = run_torch(case, patience, seed, train_cases, cases, nr)
            else:
                row = run_jax(case, patience, seed, train_cases, cases, nr)
            with _locked():
                rows = _load_rows()  # the other side may have appended
                rows.append(row)
                _save_rows(rows)
            print(f"[plan c{case} p{patience}] seed {seed} done in "
                  f"{time.perf_counter()-t0:.0f}s: v_mse {row['v_mse']:.5f} "
                  f"th_c {row['theta_centered_mse']:.5f}", flush=True)


if __name__ == "__main__":
    main()
