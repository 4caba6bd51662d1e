"""Dissect the train step's device time: forward vs backward vs optimizer.

Times each stage as a device-side lax.scan, barriered by host value fetches
(the only trustworthy barrier on this environment's remote-TPU relay — see
bench.py docstring). The fetch round-trip (~33 ms measured) is cancelled by
two-point calibration: scans of `--inner` and `2*--inner` iterations are
timed (min of --repeats each) and the difference divided by --inner.

Stages:
  fwd        loss only (no grad)
  vjp_fwd    jax.vjp forward (forward + residual saves)
  grad       value_and_grad (forward + backward)
  step       value_and_grad + optax update (the full train step)

Usage: python tools/profile_step.py [--case 300] [--K 4] [--batch 256] ...
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
    p.add_argument("--case", type=int, default=300)
    p.add_argument("--K", type=int, default=4)
    p.add_argument("--latent", type=int, default=20)
    p.add_argument("--hidden", type=int, default=10)
    p.add_argument("--batch", type=int, default=256)
    p.add_argument("--inner", type=int, default=128)
    p.add_argument("--repeats", type=int, default=3,
                   help="timed dispatches per scan length; min taken")
    # 'auto' resolves to the production lowering (hybrid custom-VJP ops on
    # TPU) — the default must measure what bench.py/train actually run
    # ('onehot' reads ~1.5 ms vs the production 1.0 ms at the headline
    # config, a phantom 50% regression).
    p.add_argument("--method", default="auto")
    p.add_argument("--compute-dtype", default="bfloat16")
    p.add_argument("--precision", default=None,
                   choices=[None, "HIGH", "HIGHEST"],
                   help="matmul precision override for the f32 path "
                        "(None = parity default: HIGHEST when f32). "
                        "HIGH = 3-pass bf16 passes — faster, breaks bit "
                        "parity (ROADMAP #4 measurement)")
    p.add_argument("--remat", default="auto", choices=["auto", "on", "off"])
    p.add_argument("--unroll", type=int, default=None)
    p.add_argument("--gather", default=None, choices=[None, "take", "onehot"])
    p.add_argument("--fold", default=None, choices=[None, "auto", "on", "off"],
                   help="aggregate-then-project fold (utils/config.py fold_output)")
    p.add_argument("--stages", default="fwd,grad,step")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from gns_tpu.models.gns import gns_forward_batch
    from gns_tpu.train.trainer import init_train_state, make_optimizer
    from gns_tpu.utils.augment import generate_cases
    from gns_tpu.utils.config import GNSConfig
    from gns_tpu.utils.prepare import (
        GridBatch,
        batch_from_cases,
        extract_shared_topology,
    )

    kw = {}
    if args.unroll is not None:
        kw["scan_unroll"] = args.unroll
    if args.gather is not None:
        kw["gather_method"] = args.gather
    if args.fold is not None:
        kw["fold_output"] = args.fold
    cfg = GNSConfig(
        case_nr=args.case, K=args.K, latent_dim=args.latent,
        hidden_dim=args.hidden, multiple_phi=True, batch_size=args.batch,
        compute_dtype=args.compute_dtype, remat={"auto": "auto", "on": True, "off": False}[args.remat],
        reference_parity=(args.compute_dtype == "float32"), **kw,
    )
    batch = batch_from_cases(
        list(generate_cases(args.case, args.batch - 1, seed=0))
    )
    n_edges = batch.lines.shape[1]
    topo = extract_shared_topology(batch)
    batch = jax.device_put(batch)

    state = init_train_state(jax.random.key(0), cfg)
    optimizer = make_optimizer(cfg)

    prec = getattr(jax.lax.Precision, args.precision) if args.precision else None

    def loss_fn(params):
        out = gns_forward_batch(params, cfg, batch, method=args.method,
                                precision=prec, topo=topo)
        return jnp.mean(out.total_loss)

    grad_fn = jax.grad(loss_fn)

    def scan_time(body, init, label):
        """Per-iteration device time of `body`, RTT-cancelled (two-point)."""

        def timed(length):
            run = jax.jit(
                lambda carry: jax.lax.scan(
                    lambda c, _: (body(c), None), carry, None, length=length
                )[0]
            )
            fetch = jax.jit(
                lambda out: jax.tree.leaves(out)[0].ravel()[0]
            )
            _ = jax.device_get(fetch(run(init)))  # compile + warm
            best = float("inf")
            for _i in range(args.repeats):
                t0 = time.perf_counter()
                _ = jax.device_get(fetch(run(init)))
                best = min(best, time.perf_counter() - t0)
            return best

        dt1 = timed(args.inner)
        dt2 = timed(2 * args.inner)
        dt = max(dt2 - dt1, 1e-9) / args.inner
        eps = args.batch * n_edges * args.K / dt
        print(f"{label:10s} {dt*1e3:8.3f} ms/it   {eps:.3e} edges/s")
        return dt

    stages = args.stages.split(",")
    params = state.params

    if "fwd" in stages:
        # Perturb the params by the carried loss so the loss computation is
        # NOT loop-invariant: XLA hoists invariant bodies out of the scan
        # (and folds `p + 0.0 * g` style no-ops through DCE), which silently
        # turns the measurement into pure dispatch latency.
        def fwd_body(c):
            p, acc = c
            p = jax.tree.map(lambda a: a + acc * 1e-30, p)
            return (p, loss_fn(p))
        scan_time(fwd_body, (params, jnp.float32(0)), "fwd")

    if "grad" in stages:
        def grad_body(c):
            p = c
            g = grad_fn(p)
            # fold grads back so iterations depend on each other (scaled so
            # the params stay numerically fixed; 0.0*b would risk folding)
            return jax.tree.map(lambda a, b: a + 1e-30 * b, p, g)
        scan_time(grad_body, params, "grad")

    if "step" in stages:
        def step_body(c):
            p, opt = c
            g = grad_fn(p)
            updates, opt = optimizer.update(g, opt, p)
            return (jax.tree.map(lambda a, u: a + u, p, updates), opt)
        scan_time(step_body, (params, optimizer.init(params)), "step")


if __name__ == "__main__":
    main()
