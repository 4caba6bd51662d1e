"""Benchmark: training throughput (edges/s) on case300, K=4 — the
BASELINE.json headline metric.

Runs the full jitted training step (forward + backward + optimizer) on a
batch of augmented case300 grids and reports aggregated edge-messages per
second: batch * E * K / step_time. `vs_baseline` compares against the
PyTorch reference measured on this machine's CPU with its native
sequential-sample training loop (tools/bench_reference.py ->
BASELINE_MEASURED.json).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "edges/s", "vs_baseline": N}
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--case", type=int, default=300)
    p.add_argument("--K", type=int, default=4)
    p.add_argument("--latent", type=int, default=20)
    p.add_argument("--hidden", type=int, default=10)
    p.add_argument("--batch", type=int, default=1024)
    p.add_argument("--steps", type=int, default=10)
    p.add_argument("--warmup", type=int, default=3)
    p.add_argument("--method", default="onehot")
    # bf16 MLP compute is the production default on TPU (params/physics stay
    # f32); use --compute-dtype float32 for parity-grade numerics.
    p.add_argument("--compute-dtype", default="bfloat16",
                   choices=["float32", "bfloat16"])
    p.add_argument("--cpu", action="store_true", help="force CPU backend")
    args = p.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    import jax

    from gns_tpu.train.trainer import init_train_state, make_train_step
    from gns_tpu.utils.augment import generate_cases
    from gns_tpu.utils.config import GNSConfig
    from gns_tpu.utils.prepare import batch_from_cases

    cfg = GNSConfig(
        case_nr=args.case, K=args.K, latent_dim=args.latent,
        hidden_dim=args.hidden, multiple_phi=True, batch_size=args.batch,
        compute_dtype=args.compute_dtype,
        reference_parity=(args.compute_dtype == "float32"),
    )
    batch = batch_from_cases(
        list(generate_cases(args.case, args.batch - 1, seed=0))
    )
    n_edges = batch.lines.shape[1]
    batch = jax.device_put(batch)

    state = init_train_state(jax.random.key(0), cfg)
    step = make_train_step(cfg, method=args.method, donate=True)

    for _ in range(args.warmup):
        state, metrics = step(state, batch)
    jax.block_until_ready(metrics["loss"])

    t0 = time.perf_counter()
    for _ in range(args.steps):
        state, metrics = step(state, batch)
    jax.block_until_ready(metrics["loss"])
    dt = (time.perf_counter() - t0) / args.steps

    edges_per_s = args.batch * n_edges * args.K / dt

    vs_baseline = None
    baseline_path = os.path.join(REPO, "BASELINE_MEASURED.json")
    if os.path.exists(baseline_path):
        with open(baseline_path) as f:
            ref = json.load(f)
        if args.case == 300 and args.K == 4:
            vs_baseline = edges_per_s / ref["edges_per_sec"]

    print(
        json.dumps(
            {
                "metric": f"train_edges_per_sec_case{args.case}_K{args.K}_b{args.batch}",
                "value": round(edges_per_s, 1),
                "unit": "edges/s",
                "vs_baseline": round(vs_baseline, 3) if vs_baseline else None,
            }
        )
    )


if __name__ == "__main__":
    main()
