"""Hybrid solver: GNS prediction warm-starts batched Newton-Raphson.

The practical promise of a learned power-flow solver (Donon et al., the
paper behind the reference — GNS/main.py:10) is not replacing Newton-
Raphson but accelerating it: the network's millisecond-scale prediction is
a high-quality initial iterate, and Newton converges quadratically from a
good start. The reference never builds this (its evaluate.py only compares
the two side by side, GNS/evaluate.py:89-148); here it is a first-class
pipeline.

Round-2 measured the two-dispatch pipeline (serve.GNSPredictor ->
host decode -> solve_batched(warm_start=...)) as a wall-time LOSS
(0.58-0.84x): the separate forward dispatch, its host value fetch
(~33 ms relay round-trip), the Python packing/decoding loops, and the
warm-start host seeding all sat OUTSIDE the solve, and together they
outweighed the 1-2 saved Newton iterations.

Round-3 design — ONE fused XLA program per chunk:

    stacked raw case arrays (float32, one host pass shared with the flat
    arm's NR assembly: nr_batched.stack_cases)
      -> in-device grid preparation (the prepare_case column transforms,
         vectorized jnp — GNS/utils.py:17-41 semantics)
      -> GNS batched forward (shared-topology dense lowering, bf16 MXU)
      -> in-device slack-gauge decode (theta - theta_slack + Va_slack)
      -> in-device warm seeding of the free unknowns
      -> in-device dense admittance assembly (nr_batched._assemble_gb —
         the (S, N, N) G/B pair never crosses the ~17 MB/s relay host
         boundary; 184 MB saved per case300 chunk)
      -> the batched full-Newton while_loop (nr_batched._nr_solve)
      -> ONE packed output array -> ONE host fetch (each fetch is a full
         relay round trip; the prediction is only returned when asked)

The hybrid's extra cost vs the flat start is then just the in-program
forward (milliseconds of MXU time; the raw stacks transfer identically in
both arms) — host prep, transfers, dispatch and the fetch barrier are
paid identically. The result is EXACT (same fixed point as a flat start —
Newton's root does not depend on the iterate it starts from; only the
iteration count does). Measured: tools/bench_hybrid.py.
"""

from __future__ import annotations

from typing import Dict, List, Optional

import numpy as np

import jax
import jax.numpy as jnp

from gns_tpu.eval.nr_batched import (
    _assemble_gb,
    _cache_put,
    _nr_core,
    _nr_solve,
    _pack_solution,
    build_nr_small_stacked,
    solve_batched,
    stack_cases,
)
from gns_tpu.serve import GNSPredictor
from gns_tpu.utils.config import GNSConfig
from gns_tpu.utils.prepare import GridTopology

# compiled fused programs, keyed by (cfg, method, shapes, slack, max_iter,
# topology fingerprint) — module-level so repeated hybrid_solve calls (and
# bench warm/timed passes) reuse the program like GNSPredictor does.
# Bounded via nr_batched._cache_put (oldest-entry eviction) so a varied
# long-lived request stream cannot grow it without bound.
_FUSED_CACHE: Dict[tuple, object] = {}


def _prepare_stacked(bus, branch, gen, base, paper_shunts: bool):
    """In-device grid preparation from stacked raw case arrays.

    jnp twin of utils.prepare.prepare_case (reference GNS/utils.py:17-41
    column/unit contract), vectorized over the batch: bus (S,N,Cb),
    branch (S,E,Cc), gen (S,G,Cg), base (S,) — all float32. Lives inside
    the fused hybrid program so the host never materializes the prepared
    tensors.
    """
    inv = 1.0 / base[:, None]
    shunt_g = jnp.ones_like(bus[:, :, 4]) if paper_shunts else bus[:, :, 4]
    shunt_b = -jnp.ones_like(bus[:, :, 5]) if paper_shunts else bus[:, :, 5]
    buses = jnp.stack(
        [bus[:, :, 0], bus[:, :, 1], bus[:, :, 2] * inv, bus[:, :, 3] * inv,
         shunt_g * inv, shunt_b * inv], axis=2,
    )
    tau = jnp.where(branch[:, :, 8] == 0, 1.0, branch[:, :, 8])
    lines = jnp.stack(
        [branch[:, :, 0], branch[:, :, 1], branch[:, :, 2], branch[:, :, 3],
         branch[:, :, 4], tau, jnp.deg2rad(branch[:, :, 9])], axis=2,
    )
    ginv = inv
    pg = gen[:, :, 1] * ginv
    gens = jnp.stack(
        [gen[:, :, 0], gen[:, :, 8] * ginv, gen[:, :, 9] * ginv, pg,
         gen[:, :, 5], gen[:, :, 2] * ginv, pg], axis=2,
    )
    return buses, lines, gens


def _fused_fn(cfg: GNSConfig, method: str, topo: GridTopology,
              slack_idx: int, shapes: tuple,
              has_status: bool, return_pred: bool, solver: str = "nr"):
    key = (
        cfg, method, slack_idx, shapes, has_status, return_pred, solver,
        topo.src.tobytes(), topo.dst.tobytes(), topo.gen_idx.tobytes(),
    )
    fn = _FUSED_CACHE.get(key)
    if fn is not None:
        return fn
    from gns_tpu.models.gns import gns_forward

    paper_shunts = not cfg.true_shunts
    fj = jnp.asarray(topo.src)
    tj = jnp.asarray(topo.dst)
    n_buses = shapes[0][1]
    if solver == "fdpf":
        # fast-decoupled tail (eval/fdpf.py): B'/B'' factored once inside
        # the same fused program, iterations are matvecs — the incidence
        # one-hots for its edge-list mismatch eval are trace-time consts
        inc_f = jax.nn.one_hot(fj, n_buses, dtype=jnp.float32).T
        inc_t = jax.nn.one_hot(tj, n_buses, dtype=jnp.float32).T

    def run(params, bus, branch, gen, base,
            p_sched, q_sched, vm0, va0, pvpq, pq, tol, max_iter):
        buses, lines, gens = _prepare_stacked(
            bus, branch, gen, base, paper_shunts
        )
        fwd = lambda b, l, g: gns_forward(
            params, cfg, b, l, g, method=method, topo=topo
        )
        out = jax.vmap(fwd)(buses, lines, gens)
        # decode into NR's slack-pinned gauge (harness.align_slack_angle,
        # on device): the residual is shift-invariant, the slack angle is
        # a problem INPUT that va0 already carries
        theta = (
            out.theta
            - out.theta[:, slack_idx:slack_idx + 1]
            + va0[:, slack_idx:slack_idx + 1]
        )
        # seed only the free unknowns (cf. solve_batched warm_start):
        # |v| at PQ buses, angles at PV+PQ buses
        v = out.v.astype(vm0.dtype)
        vm_w = vm0.at[:, pq].set(v[:, pq])
        va_w = va0.at[:, pvpq].set(theta.astype(va0.dtype)[:, pvpq])
        # the dense admittance pair is assembled HERE, on device, from the
        # same raw stacks the forward consumed (nr_batched._assemble_gb) —
        # it never crosses the ~17 MB/s host boundary
        if solver == "fdpf":
            from gns_tpu.eval.fdpf import (
                _batched_inverse,
                _branch_parts,
                _build_b_matrices,
                _fdpf_solve,
                _make_injections,
            )

            bp, bpp = _build_b_matrices(
                bus, branch, base, fj, tj, has_status, "XB"
            )
            bp_inv = _batched_inverse(bp[:, pvpq][:, :, pvpq])
            bpp_inv = _batched_inverse(bpp[:, pq][:, :, pq])
            parts = _branch_parts(bus, branch, base, has_status)
            injections = _make_injections(parts, inc_f, inc_t, fj, tj)
            vm, va, conv, it, itg, fmax = _fdpf_solve(
                injections, bp_inv, bpp_inv, p_sched, q_sched,
                vm_w, va_w, pvpq, pq, tol, max_iter,
            )
        else:
            gmat, bmat = _assemble_gb(bus, branch, base, fj, tj, has_status)
            vm, va, conv, it, itg, fmax = _nr_solve(
                gmat, bmat, p_sched, q_sched, vm_w, va_w, pvpq, pq,
                tol=tol, max_iter=max_iter,
            )
        packed = _pack_solution(vm, va, conv, it, itg, fmax)
        if return_pred:
            return packed, v, theta
        return packed

    fn = jax.jit(run)
    _cache_put(_FUSED_CACHE, key, fn)
    return fn


def _hybrid_solve_fused(
    params, cfg: GNSConfig, cases: List[Dict], tol: float, max_iter: int,
    chunk_size: int, method: str = "auto", return_pred: bool = False,
    compact_after: int = 0, solver: str = "nr", mesh=None,
) -> Dict[str, np.ndarray]:
    from gns_tpu.parallel.solver_dp import (
        pad_rows,
        padded_rows,
        put_dp,
        put_repl,
    )

    s = len(cases)
    # dispatch all chunks asynchronously first, fetch afterwards (cf.
    # solve_batched: each fetch is a blocking relay round trip)
    pending = []
    for lo in range(0, s, chunk_size):
        chunk = cases[lo:lo + chunk_size]
        k = len(chunk)
        bus, branch, gen, base = stack_cases(chunk)
        target = chunk_size if (k < chunk_size and s > chunk_size) else k
        target = padded_rows(target, mesh)
        if target > k:
            # pad so every dispatch reuses ONE program (and, under a
            # mesh, so the batch divides the dp axis)
            bus, branch, gen, base = (
                pad_rows(a, target) for a in (bus, branch, gen, base)
            )
        ns = build_nr_small_stacked(bus, branch, gen, base)
        topo = GridTopology(
            src=branch[0, :, 0].astype(np.int32) - 1,
            dst=branch[0, :, 1].astype(np.int32) - 1,
            gen_idx=gen[0, :, 0].astype(np.int32) - 1,
        )
        types = bus[0, :, 1].astype(int)
        slack_idx = int(np.flatnonzero(types == 3)[0])
        if branch.shape[1] < bus.shape[1]:
            raise ValueError(
                "fused hybrid requires E >= N (reference-parity gathers, "
                "SURVEY.md Q2) — true for every shipped IEEE case"
            )
        n = bus.shape[1]
        has_status = branch.shape[2] > 10
        fn = _fused_fn(
            cfg, method, topo, slack_idx,
            shapes=(bus.shape, branch.shape, gen.shape),
            has_status=has_status, return_pred=return_pred, solver=solver,
        )
        # no compaction for the fast-decoupled tail: its iterations are
        # two matvecs, so the per-grid exit's extra round trip never pays
        k1 = (
            compact_after
            if solver == "nr" and 0 < compact_after < max_iter
            else max_iter
        )
        out = fn(
            put_repl(mesh, params),
            put_dp(mesh, bus.astype(np.float32)),
            put_dp(mesh, branch.astype(np.float32)),
            put_dp(mesh, gen.astype(np.float32)),
            put_dp(mesh, base.astype(np.float32)),
            put_dp(mesh, ns.p_sched), put_dp(mesh, ns.q_sched),
            put_dp(mesh, ns.vm0), put_dp(mesh, ns.va0),
            put_repl(mesh, jnp.asarray(ns.pvpq)),
            put_repl(mesh, jnp.asarray(ns.pq)), tol,
            jnp.asarray(k1, jnp.int32),
        )
        pending.append(
            (out, k, bus, branch, base, ns, topo, has_status, k1)
        )

    vms, vas, convs, its, itgs, fms = [], [], [], [], [], []
    pv, pth = [], []
    for out, k, bus, branch, base, ns, topo, has_status, k1 in pending:
        n = bus.shape[1]
        packed = np.array(out[0] if return_pred else out)
        it_chunk = int(packed[0, 2 * n + 1])
        bad = np.flatnonzero(packed[:, 2 * n] < 0.5)
        if k1 < max_iter and bad.size:
            # stragglers continue in a compact power-of-2 sub-batch (no
            # forward needed — cf. solve_batched's compact_after)
            sub = max(8, 1 << int(np.ceil(np.log2(bad.size))))
            sel = np.concatenate([bad, np.repeat(bad[:1], sub - bad.size)])
            core2 = _nr_core(
                topo.src, topo.dst,
                ((sub,) + bus.shape[1:], (sub,) + branch.shape[1:]),
                has_status,
            )
            p2 = np.asarray(core2(
                jnp.asarray(bus[sel], jnp.float32),
                jnp.asarray(branch[sel], jnp.float32),
                jnp.asarray(base[sel], jnp.float32),
                jnp.asarray(ns.p_sched[sel]), jnp.asarray(ns.q_sched[sel]),
                jnp.asarray(packed[sel, :n], jnp.float32),
                jnp.asarray(packed[sel, n:2 * n], jnp.float32),
                jnp.asarray(ns.pvpq), jnp.asarray(ns.pq), tol,
                jnp.asarray(max_iter - k1, jnp.int32),
            ))[:bad.size]
            packed[bad, :2 * n] = p2[:, :2 * n]
            packed[bad, 2 * n] = p2[:, 2 * n]
            packed[bad, 2 * n + 2] = k1 + p2[:, 2 * n + 2]
            packed[bad, 2 * n + 3] = p2[:, 2 * n + 3]
            it_chunk += int(p2[0, 2 * n + 1])
        vms.append(packed[:k, :n])
        vas.append(packed[:k, n:2 * n])
        convs.append(packed[:k, 2 * n] > 0.5)
        its.append(it_chunk)
        itgs.append(packed[:k, 2 * n + 2].astype(np.int32))
        fms.append(packed[:k, 2 * n + 3])
        if return_pred:
            pv.append(np.asarray(out[1])[:k])
            pth.append(np.asarray(out[2])[:k])
    conv_all = np.concatenate(convs)
    mismatch = np.concatenate(fms).astype(np.float32)
    res = {
        "v": np.concatenate(vms).astype(np.float32),
        "theta_deg": np.rad2deg(np.concatenate(vas)).astype(np.float32),
        "converged": conv_all,
        "iterations": max(its),
        "iterations_per_chunk": its,
        "iterations_per_grid": np.concatenate(itgs),
        "mismatch": mismatch,
        "stalled": conv_all & (mismatch >= tol),
    }
    if return_pred:
        res["gns_v"] = np.concatenate(pv).astype(np.float32)
        res["gns_theta_deg"] = np.rad2deg(
            np.concatenate(pth)
        ).astype(np.float32)
    return res


def hybrid_solve(
    params,
    cfg: GNSConfig,
    cases: List[Dict],
    tol: float = 3e-5,
    max_iter: int = 20,
    chunk_size: int = 256,
    predictor: Optional[GNSPredictor] = None,
    return_prediction: bool = False,
    fallback_flat: bool = True,
    fused: bool = True,
    compact_after=0,
    solver: str = "nr",
    mesh=None,
) -> Dict[str, np.ndarray]:
    """Solve `cases` exactly, warm-started by the GNS prediction.

    Returns the solve_batched dict ({"v", "theta_deg", "converged",
    "iterations", "iterations_per_chunk"}); "iterations" counts the warm
    attempt only — when the flat-start fallback fires, its re-solve cost
    is reported separately as "fallback_iterations" (sequential work on
    top of the warm attempt). With return_prediction=True it also carries
    the raw network guess under "gns_v"/"gns_theta_deg" so callers can
    report how far the prediction was from the solved fixed point.

    fused=True (default): forward + gauge decode + warm seeding + the
    Newton while_loop run as ONE jitted program per chunk (see module
    docstring) — the wall-time path. Passing `predictor` selects the
    two-dispatch pipeline instead (reuses an existing GNSPredictor's
    compiled programs; the round-2 measured-slower path, kept for
    API compatibility and as the A/B baseline).

    compact_after: per-grid convergence exit, forwarded to the Newton
    stage (see nr_batched.solve_batched; "auto" resolves against the
    measured dispatch RTT via resolve_compact_after) — after that many
    lock-step
    iterations the converged majority stops paying Jacobian builds and
    the stragglers continue in a compact power-of-2 sub-batch. Default 0
    (lock-step): on this relay the split's extra dispatch+fetch round
    trip usually outweighs the saved Jacobian builds — a measured
    negative (docs/HYBRID_BENCH_R3.json "best_vs_best"); it only pays
    when the warm start collapses the ENTIRE chunk below k (zero
    stragglers, so no second dispatch fires), and then only marginally.
    On local hardware (no ~33 ms round trips) the tradeoff tilts back
    toward compaction for the large cases.

    solver: the exact-solve tail after the warm seeding — "nr" (default;
    the batched full-Newton while_loop) or "fdpf" (the fast-decoupled
    B'-/B''-factored-once loop, eval/fdpf.py, fused into the same
    program; ~Nx cheaper per iteration, geometric convergence — pass a
    larger max_iter, e.g. 60). Both gate on the true AC mismatch and
    reach the same fixed point; the flat-start FALLBACK always uses full
    Newton, so robustness is identical. Measured A/B:
    docs/FDPF_BENCH.json "gns" rows.

    fallback_flat: Newton is only locally convergent — a bad prediction
    can leave the basin of attraction on grids a flat start solves
    (observed on strongly perturbed case30 grids with noise-level-0.1
    starts). Any grid the warm solve fails is re-solved from the flat
    start and spliced in, so the hybrid is never LESS robust than plain
    NR; "fallback_grids" reports how many needed it (0 in the measured
    benches with shipped checkpoints).
    """
    from gns_tpu.eval.nr_batched import resolve_compact_after

    if solver not in ("nr", "fdpf"):
        raise ValueError(f"solver must be nr|fdpf, got {solver!r}")
    compact_after = resolve_compact_after(compact_after)
    if fused and predictor is None:
        out = _hybrid_solve_fused(
            params, cfg, cases, tol, max_iter, chunk_size,
            return_pred=return_prediction, compact_after=compact_after,
            solver=solver, mesh=mesh,
        )
    else:
        if predictor is None:
            predictor = GNSPredictor(
                params, cfg, batch_size=max(len(cases), 1), align_slack=True
            )
        pred = predictor.predict(cases)
        if solver == "fdpf":
            from gns_tpu.eval.fdpf import solve_batched_fdpf as _solve
        else:
            _solve = solve_batched
        out = _solve(
            cases,
            tol=tol,
            max_iter=max_iter,
            chunk_size=chunk_size,
            warm_start=(pred["v"], pred["theta"]),
            mesh=mesh,
        )
        if return_prediction:
            out["gns_v"] = pred["v"]
            out["gns_theta_deg"] = np.rad2deg(pred["theta"]).astype(
                np.float32
            )
    if fallback_flat and not out["converged"].all():
        bad = np.flatnonzero(~out["converged"])
        flat = solve_batched(
            [cases[i] for i in bad],
            tol=tol, max_iter=max_iter, chunk_size=chunk_size, mesh=mesh,
        )
        out["v"][bad] = flat["v"]
        out["theta_deg"][bad] = flat["theta_deg"]
        out["converged"][bad] = flat["converged"]
        if "mismatch" in out:
            out["mismatch"][bad] = flat["mismatch"]
            out["stalled"][bad] = flat["stalled"]
        # per-grid sequential depth for fallback grids = the failed warm
        # attempt (max_iter) PLUS the fallback's own count, so the
        # diagnostic consumed by bench_hybrid and the compaction heuristic
        # reflects what those grids actually cost
        out["iterations_per_grid"] = np.asarray(
            out["iterations_per_grid"]
        ).copy()
        out["iterations_per_grid"][bad] += flat["iterations_per_grid"]
        # the fallback re-solve is SEQUENTIAL work on top of the warm
        # attempt, not an alternative to it: report it separately so the
        # hybrid's cost is never understated when the fallback fires
        out["fallback_iterations"] = flat["iterations"]
        out["fallback_grids"] = bad.size
    else:
        out["fallback_grids"] = 0
        out["fallback_iterations"] = 0
    return out
