"""Microbenchmark the train step's building blocks at headline shapes.

Attributes device time between the step's components — edge-MLP chain,
node-MLP chain, phi aggregation (one-hot MXU contraction), bus->edge
gathers, and the fused physics refresh — since the remote-TPU relay hides
the device timeline from jax.profiler (host events only; ROADMAP.md #1).

Each piece is timed as a device-side lax.scan with a data dependency
threaded through the carry so XLA cannot hoist or elide work; timing is
bracketed by host value fetches (see bench.py docstring). The relay's
~0.5 s fetch round-trip is cancelled by two-point calibration: time scans
of `inner` and `2*inner` iterations and report (dt2 - dt1) / inner.

Usage: python tools/micro_bench.py [--case 300] [--batch 256] [--K 4]
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
    p.add_argument("--inner", type=int, default=256)
    p.add_argument("--repeats", type=int, default=3,
                   help="timed dispatches per point; min taken (RTT noise)")
    p.add_argument("--grad", action="store_true",
                   help="also time each piece's backward (rematerialized)")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from gns_tpu.models.blocks import learning_block_apply
    from gns_tpu.models.gns import fuse_step_params, init_gns_params
    from gns_tpu.ops.segment import incidence_matrix
    from gns_tpu.physics.fused import physics_refresh
    from gns_tpu.utils.augment import generate_cases
    from gns_tpu.utils.config import GNSConfig
    from gns_tpu.utils.prepare import batch_from_cases, extract_shared_topology

    cfg = GNSConfig(
        case_nr=args.case, K=args.K, latent_dim=args.latent,
        hidden_dim=args.hidden, multiple_phi=True, batch_size=args.batch,
        compute_dtype="bfloat16", reference_parity=False,
        # pieces below time the explicit (unfolded) phi output layer
        fold_output="off",
    )
    B = args.batch
    batch = batch_from_cases(list(generate_cases(args.case, B - 1, seed=0)))
    topo = extract_shared_topology(batch)
    batch = jax.device_put(batch)
    n, e = batch.buses.shape[1], batch.lines.shape[1]
    lat, hid = cfg.latent_dim, cfg.hidden_dim

    params = init_gns_params(jax.random.key(0), cfg)
    fused = fuse_step_params(params, cfg)
    # step-0 slices, bf16 compute copies
    phi_p = jax.tree.map(lambda x: x[0].astype(jnp.bfloat16), fused["phi_fused"])
    l_p = jax.tree.map(lambda x: x[0].astype(jnp.bfloat16), fused["L_fused"])

    key = jax.random.key(1)
    edge_in = jax.random.normal(key, (B, e, 5 + lat), jnp.bfloat16)
    node_in = jax.random.normal(key, (B, n, 4 + lat + 3 * lat), jnp.bfloat16)
    msgs = jax.random.normal(key, (B, e, 3 * lat), jnp.bfloat16)
    vth = jax.random.normal(key, (B, n, 2), jnp.float32)
    v0 = 1.0 + 0.01 * jax.random.normal(key, (B, n), jnp.float32)
    th0 = 0.01 * jax.random.normal(key, (B, n), jnp.float32)

    A = incidence_matrix(topo.dst, n, jnp.bfloat16)  # (N, E)
    G = A.T  # gather one-hot (E, N)

    slope = cfg.leaky_relu_slope

    def _timed(build, length):
        """min-of-repeats wall time of one program dispatch + value fetch."""
        f = build(length)
        fetch = jax.jit(lambda r: jax.tree.map(lambda a: a.ravel()[0], r))
        _ = jax.device_get(fetch(f()))  # compile + warm fetch path too
        best = float("inf")
        for _i in range(args.repeats):
            t0 = time.perf_counter()
            _ = jax.device_get(fetch(f()))
            best = min(best, time.perf_counter() - t0)
        return best

    def _two_point(build):
        """Two scan lengths cancel the relay's ~0.5 s fetch round-trip."""
        dt1 = _timed(build, args.inner)
        dt2 = _timed(build, 2 * args.inner)
        return max(dt2 - dt1, 1e-9) / args.inner

    def scanner(fn, x):
        def body(c, _):
            return fn(c), None

        def build(length):
            jf = jax.jit(
                lambda x0: jax.lax.scan(body, x0, None, length=length)[0]
            )
            return lambda: jf(x)

        return _two_point(build)

    def scanner_grad(fn, x):
        """Per-iteration time of value_and_grad through the scanned piece.

        The scan body is rematerialized (jax.checkpoint) so residual memory
        stays O(1) in scan length; the reported time therefore includes one
        forward recompute — subtract the piece's forward time to estimate
        the pure-VJP cost, or compare ratios across pieces.
        """
        body = jax.checkpoint(lambda c, _: (fn(c), None))

        def loss(x0, length):
            out = jax.lax.scan(body, x0, None, length=length)[0]
            return sum(
                jnp.sum(leaf.astype(jnp.float32))
                for leaf in jax.tree.leaves(out)
            )

        def build(length):
            jf = jax.jit(lambda x0: jax.grad(lambda z: loss(z, length))(x0))
            return lambda: jf(x)

        return _two_point(build)

    results = {}
    grad_results = {}

    def measure(name, fn, x):
        results[name] = scanner(fn, x)
        if args.grad:
            grad_results[name] = scanner_grad(fn, x)

    # 1) edge-MLP chain on (B*E, 25) -> (B*E, 3L): the phi_fused trio
    def edge_mlp(x):
        out = learning_block_apply(phi_p, x, slope).astype(jnp.bfloat16)
        return out[..., : x.shape[-1]]  # carry keeps the input shape
    measure("edge_mlp (phi_fused)", edge_mlp, edge_in)

    # 2) node-MLP chain (B*N, 84) -> (B*N, 22): L_fused trio
    def node_mlp(x):
        out = learning_block_apply(l_p, x, slope)
        # rebuild an input-shaped carry so the scan has a fixed point
        return jnp.concatenate(
            [out.astype(jnp.bfloat16)] * (node_in.shape[-1] // out.shape[-1] + 1),
            axis=-1)[..., : node_in.shape[-1]]
    measure("node_mlp (L_fused)", node_mlp, node_in)

    # 3) phi aggregation: A(N,E) @ msg(B,E,3L) whole-batch contraction
    def agg(x):
        out = jnp.einsum("ne,bed->bnd", A, x,
                         preferred_element_type=jnp.float32)
        return jnp.einsum("en,bnd->bed", G, out.astype(jnp.bfloat16),
                          preferred_element_type=jnp.bfloat16)
    measure("agg+gather pair (one-hot)", agg, msgs)

    # 4) bus->edge gather alone: G(E,N) @ vth(B,N,2)
    def gth(x):
        y = jnp.einsum("en,bnd->bed", G.astype(jnp.float32), x,
                       precision=jax.lax.Precision.HIGHEST)
        return jnp.einsum("ne,bed->bnd", A.astype(jnp.float32), y,
                          precision=jax.lax.Precision.HIGHEST)
    measure("gather+agg f32 HIGHEST (2col)", gth, vth)

    # 5) fused physics refresh (paper mode, shared topo)
    def phys(c):
        v, th = c
        pg, qg, dp, dq = jax.vmap(
            lambda vv, tt, b, l, g: physics_refresh(
                vv, tt, b, l, g, reference_parity=False, method="onehot",
                topo=topo, gather_method="onehot")
        )(v, th, batch.buses, batch.lines, batch.generators)
        return v + 1e-6 * dp, th + 1e-6 * dq
    measure("physics_refresh", phys, (v0, th0))

    flops = {
        "edge_mlp (phi_fused)": 2 * B * e * ((5 + lat) * 3 * hid + 3 * hid * 3 * hid + 3 * hid * 3 * lat),
        "node_mlp (L_fused)": 2 * B * n * ((4 + 4 * lat) * 3 * hid + 3 * hid * 3 * hid + 3 * hid * (2 + lat)),
        "agg+gather pair (one-hot)": 2 * 2 * B * n * e * 3 * lat,
        "gather+agg f32 HIGHEST (2col)": 2 * 2 * B * n * e * 2,
    }
    print(f"shapes: B={B} N={n} E={e} latent={lat} hidden={hid} K={cfg.K}")
    for name, dt in results.items():
        fl = flops.get(name)
        extra = f"  {fl / dt / 1e12:8.2f} TFLOP/s" if fl else ""
        if name in grad_results:
            g = grad_results[name]
            extra += f"   grad {g * 1e6:9.1f} us/it ({g / dt:4.1f}x fwd)"
        print(f"{name:34s} {dt * 1e6:9.1f} us/it{extra}")
    # context: one full train step has K=4 of each piece (plus opt/loss)
    per_step = sum(results.values()) * cfg.K
    print(f"sum x K={cfg.K}: {per_step * 1e3:.3f} ms (train step measured ~2.05 ms)")
    if grad_results:
        per_step_g = sum(grad_results.values()) * cfg.K
        print(f"grad sum x K={cfg.K}: {per_step_g * 1e3:.3f} ms "
              "(includes one remat forward per piece)")


if __name__ == "__main__":
    main()
