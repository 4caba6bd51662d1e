"""Prewarm the persistent XLA compilation cache for production programs.

First compilation of a train/eval program on the remote TPU costs tens of
seconds to minutes per shape; `import gns_tpu` enables the persistent
cache (/root/.jax_cache, see gns_tpu/__init__.py), so compiling every
production program shape ONCE makes all later runs start in seconds. Run
this after deploying a new build or changing model hyperparameters:

    python tools/prewarm_cache.py                      # all five cases
    python tools/prewarm_cache.py --cases 14 300 --batch 256 --eval-batch 1024

Compiles, per case: the production train step (bf16, fold, hybrid ops,
shared topology, epoch-scan body) and the batched inference step at the
serving batch size. Uses jit(...).lower().compile() — no device steps run.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--cases", type=int, nargs="+", default=[9, 14, 30, 118, 300])
    p.add_argument("--K", type=int, default=4)
    p.add_argument("--latent", type=int, default=20)
    p.add_argument("--hidden", type=int, default=10)
    p.add_argument("--batch", type=int, default=256,
                   help="training batch size to compile for")
    p.add_argument("--eval-batch", type=int, default=1024,
                   help="serving batch size to compile for")
    p.add_argument("--compute-dtype", default="bfloat16")
    p.add_argument("--parity", action="store_true",
                   help="also compile the reference-parity (f32) programs")
    args = p.parse_args()

    import jax

    from gns_tpu.models.gns import gns_forward_batch
    from gns_tpu.train.trainer import (
        init_train_state,
        make_epoch_step,
        make_eval_step,
        stack_epoch,
    )
    from gns_tpu.utils.augment import generate_cases
    from gns_tpu.utils.config import GNSConfig
    from gns_tpu.utils.prepare import batch_from_cases, extract_shared_topology

    def compile_for(cfg, batch_size, label):
        t0 = time.perf_counter()
        batch = batch_from_cases(
            list(generate_cases(cfg.case_nr, batch_size - 1, seed=0))
        )
        topo = extract_shared_topology(batch)
        state = init_train_state(jax.random.key(0), cfg)

        # one-batch epoch scan: the exact program train() dispatches
        # (dense = unpadded single-case batches, the production shape)
        dense = batch.is_dense()
        step = make_epoch_step(cfg, donate=False, topo=topo, dense=dense)
        stacked = stack_epoch(batch, batch_size)
        step.lower(state, stacked).compile()

        ev = make_eval_step(cfg, topo=topo, dense=dense)
        ev.lower(state.params, batch).compile()
        print(f"  {label}: compiled train+eval in "
              f"{time.perf_counter() - t0:.1f}s", flush=True)

    for case in args.cases:
        print(f"case{case}:", flush=True)
        cfg = GNSConfig(
            case_nr=case, K=args.K, latent_dim=args.latent,
            hidden_dim=args.hidden, multiple_phi=True,
            batch_size=args.batch, compute_dtype=args.compute_dtype,
            reference_parity=False,
        )
        compile_for(cfg, args.batch, f"train b{args.batch} {args.compute_dtype}")
        scfg = cfg.replace(reference_parity=True)
        compile_for(scfg, args.eval_batch, f"serve b{args.eval_batch}")
        if args.parity:
            pcfg = cfg.replace(compute_dtype="float32", reference_parity=True)
            compile_for(pcfg, args.batch, "parity f32")
    print("cache warm:", os.environ.get("JAX_COMPILATION_CACHE_DIR",
                                        "~/.jax_cache"))


if __name__ == "__main__":
    main()
