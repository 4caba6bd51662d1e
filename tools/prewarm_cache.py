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

    def compile_solvers(case, chunk):
        """Lower+compile the batched solver cores (NR / fast-decoupled /
        DC) at the production chunk shape without running a solve — the
        base case repeated `chunk` times has exactly the deployed
        shapes."""
        import numpy as np
        import jax.numpy as jnp

        from gns_tpu.eval.dcpf import _dc_core
        from gns_tpu.eval.fdpf import _fdpf_core
        from gns_tpu.eval.nr_batched import (
            _nr_core,
            build_nr_small_stacked,
            stack_cases,
        )
        from gns_tpu.utils.cases import load_case

        t0 = time.perf_counter()
        cases = [load_case(case)] * chunk
        bus, branch, gen, base = stack_cases(cases)
        ns = build_nr_small_stacked(bus, branch, gen, base)
        f = branch[0, :, 0].astype(np.int32) - 1
        t = branch[0, :, 1].astype(np.int32) - 1
        has_status = branch.shape[2] > 10
        a = (jnp.asarray(bus, jnp.float32), jnp.asarray(branch, jnp.float32),
             jnp.asarray(base, jnp.float32), jnp.asarray(ns.p_sched),
             jnp.asarray(ns.q_sched), jnp.asarray(ns.vm0),
             jnp.asarray(ns.va0), jnp.asarray(ns.pvpq), jnp.asarray(ns.pq))
        _nr_core(f, t, (bus.shape, branch.shape), has_status).lower(
            *a, 3e-5, jnp.asarray(20, jnp.int32)).compile()
        _fdpf_core(f, t, (bus.shape, branch.shape), has_status,
                   "XB").lower(*a, 3e-5, jnp.asarray(60, jnp.int32)).compile()
        types = bus[0, :, 1].astype(int)
        slack = int(np.flatnonzero(types == 3)[0])
        nonslack = np.flatnonzero(types != 3).astype(np.int32)
        _dc_core(f, t, (bus.shape, branch.shape), has_status, slack,
                 nonslack).lower(
            a[0], a[1], jnp.asarray(gen, jnp.float32), a[2],
            jnp.asarray(ns.p_sched)).compile()
        print(f"  solvers chunk{chunk}: compiled NR+FDPF+DC in "
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
        compile_solvers(case, args.batch)
    print("cache warm:", os.environ.get("JAX_COMPILATION_CACHE_DIR",
                                        "~/.jax_cache"))


if __name__ == "__main__":
    main()
