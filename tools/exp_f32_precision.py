"""ROADMAP #4 re-measure: f32 parity-path matmul precision HIGH vs HIGHEST.

The parity-grade f32 path forces jax.lax.Precision.HIGHEST (6 bf16
passes) because the TPU MXU's default f32 matmul truncates operands to
bf16 and breaks activation parity (models/gns.py). Precision.HIGH (3
passes) halves the MXU work of every MLP matmul but costs ~1 ulp-level
differences — unusable for bit parity, potentially useful as a fast
non-parity f32 option. An early measurement (pre hybrid-custom-VJP ops)
saw only +2% end-to-end; the op mix changed enough (take-forwards
replaced several 6-pass one-hot matmuls) that the negative may be stale
— this re-measures BOTH precisions in ONE process (cross-process
readings drift ±10-15% on this relay) with the same two-point
RTT-cancelled scan timing as tools/profile_step.py.

Usage: python tools/exp_f32_precision.py [--case 300] [--batch 256]
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
    p = argparse.ArgumentParser()
    p.add_argument("--case", type=int, default=300)
    p.add_argument("--K", type=int, default=4)
    p.add_argument("--batch", type=int, default=256)
    p.add_argument("--inner", type=int, default=64)
    p.add_argument("--repeats", type=int, default=3)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from gns_tpu.models.gns import gns_forward_batch
    from gns_tpu.train.trainer import init_train_state, make_optimizer
    from gns_tpu.utils.augment import generate_cases
    from gns_tpu.utils.config import GNSConfig
    from gns_tpu.utils.prepare import batch_from_cases, extract_shared_topology

    cfg = GNSConfig(
        case_nr=args.case, K=args.K, latent_dim=20, hidden_dim=10,
        multiple_phi=True, batch_size=args.batch,
        compute_dtype="float32", reference_parity=True,
    )
    batch = batch_from_cases(
        list(generate_cases(args.case, args.batch - 1, seed=0))
    )
    n_edges = batch.lines.shape[1]
    topo = extract_shared_topology(batch)
    batch = jax.device_put(batch)
    state = init_train_state(jax.random.key(0), cfg)
    optimizer = make_optimizer(cfg)

    def step_scan(precision):
        def loss_fn(params):
            out = gns_forward_batch(
                params, cfg, batch, method="auto",
                precision=precision, topo=topo,
            )
            return jnp.mean(out.total_loss)

        grad_fn = jax.grad(loss_fn)

        def body(c):
            params, opt_state = c
            g = grad_fn(params)
            import optax

            updates, opt_state = optimizer.update(g, opt_state, params)
            return optax.apply_updates(params, updates), opt_state

        def timed(length):
            run = jax.jit(lambda c: jax.lax.scan(
                lambda c, _: (body(c), 0.0), c, None, length=length
            )[0])
            init = (state.params, optimizer.init(state.params))
            out = run(init)  # compile + warm
            jax.tree_util.tree_map(lambda x: x.block_until_ready(), out)
            best = float("inf")
            for _ in range(args.repeats):
                t0 = time.perf_counter()
                out = run(init)
                # host value fetch = the only honest barrier here
                jax.device_get(jax.tree_util.tree_leaves(out)[0])
                best = min(best, time.perf_counter() - t0)
            return best

        t1, t2 = timed(args.inner), timed(2 * args.inner)
        return (t2 - t1) / args.inner

    results = {}
    for name in ("HIGHEST", "HIGH"):
        per_step = step_scan(getattr(jax.lax.Precision, name))
        results[name] = per_step
        print(json.dumps({
            "precision": name,
            "ms_per_step": round(per_step * 1e3, 3),
            "edges_per_sec": round(args.batch * n_edges * args.K / per_step),
        }), flush=True)
    print(json.dumps({
        "speedup_HIGH_vs_HIGHEST": round(
            results["HIGHEST"] / results["HIGH"], 3
        ),
    }), flush=True)


if __name__ == "__main__":
    main()
