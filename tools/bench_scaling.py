"""Scaling benchmark: edges/s at 1..N devices (dp and gp axes).

BASELINE.json's scaling target is >=80% edges/s efficiency on N >= 2 hosts.
This environment exposes one physical TPU chip, so this harness serves two
roles: (a) on real multi-chip/multi-host hardware it measures true scaling
over ICI/DCN (run as-is — it uses whatever jax.devices() exposes); (b) on
the CPU-simulated mesh it validates that the sharded program's collective
structure is sound and reports the (simulation-only) efficiency curve.

Prints one JSON line per mesh configuration:
  {"devices": n, "mesh": "dp2xgp4", "edges_per_sec": ..., "efficiency": ...}

Usage:
  python tools/bench_scaling.py [--cpu-sim 8] [--case 300] [--batch 64]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu-sim", type=int, default=0,
                    help="simulate N CPU devices (0 = use real devices)")
    ap.add_argument("--case", type=int, default=300)
    ap.add_argument("--K", type=int, default=4)
    ap.add_argument("--latent", type=int, default=20)
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--steps", type=int, default=10)
    ap.add_argument("--gp", type=int, default=1,
                    help="edge-partition axis size (per mesh config)")
    ap.add_argument("--json-out", default=None,
                    help="append results (with run context) to this JSON file")
    args = ap.parse_args()

    if args.cpu_sim:
        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "")
            + f" --xla_force_host_platform_device_count={args.cpu_sim}"
        )
        import jax

        jax.config.update("jax_platforms", "cpu")
    import jax

    from gns_tpu.parallel.mesh import make_mesh
    from gns_tpu.parallel.sharding import (
        make_sharded_train_step,
        replicate,
        shard_batch,
    )
    from gns_tpu.train.trainer import init_train_state
    from gns_tpu.utils.augment import generate_cases
    from gns_tpu.utils.config import GNSConfig
    from gns_tpu.utils.prepare import batch_from_cases, extract_shared_topology

    n_dev = len(jax.devices())
    cfg = GNSConfig(
        case_nr=args.case, K=args.K, latent_dim=args.latent,
        multiple_phi=True, reference_parity=False,
    )
    # pad edges so every gp size divides (416 = lcm-friendly for case300's 411)
    sizes = {300: (304, 416, 72), 118: (120, 192, 56), 30: (32, 48, 8),
             14: (16, 24, 8), 9: (16, 16, 8)}
    pad = sizes.get(args.case)
    base = batch_from_cases(
        list(generate_cases(args.case, args.batch - 1, seed=0)), pad_sizes=pad
    )
    n_edges = base.lines.shape[1]

    results = []
    mesh_cfgs = []
    d = 1
    while d <= n_dev:
        gp = args.gp if d % args.gp == 0 else 1
        mesh_cfgs.append((d // gp, gp))
        d *= 2
    base_rate = None
    for dp, gp in mesh_cfgs:
        if dp * gp > n_dev or args.batch % dp:
            continue
        mesh = make_mesh(dp=dp, gp=gp, devices=jax.devices()[: dp * gp])
        state = replicate(init_train_state(jax.random.key(0), cfg), mesh)
        step = make_sharded_train_step(
            cfg, mesh, method="onehot", topo=extract_shared_topology(base)
        )
        batch = shard_batch(base, mesh)
        state, m = step(state, batch)
        jax.block_until_ready(m["loss"])
        t0 = time.perf_counter()
        for _ in range(args.steps):
            state, m = step(state, batch)
        jax.block_until_ready(m["loss"])
        dt = (time.perf_counter() - t0) / args.steps
        rate = args.batch * n_edges * args.K / dt
        if base_rate is None:
            base_rate = rate / (dp * gp)
        eff = rate / (base_rate * dp * gp)
        results.append({
            "devices": dp * gp, "mesh": f"dp{dp}xgp{gp}",
            "edges_per_sec": round(rate, 1),
            "efficiency": round(eff, 3),
            "simulated": bool(args.cpu_sim),
        })
        print(json.dumps(results[-1]), flush=True)
    if args.json_out:
        doc = {"runs": []}
        if os.path.exists(args.json_out):
            with open(args.json_out) as f:
                doc = json.load(f)
        doc["runs"].append({
            "case": args.case, "K": args.K, "latent": args.latent,
            "batch": args.batch, "gp": args.gp,
            "backend": "cpu-sim" if args.cpu_sim else jax.default_backend(),
            "host_cpus": os.cpu_count(),
            "configs": results,
        })
        with open(args.json_out, "w") as f:
            json.dump(doc, f, indent=2)
    return results


if __name__ == "__main__":
    main()
