"""Batched fast-decoupled AC power flow (Stott-Alsac) on the accelerator.

Full Newton (`eval.nr_batched`) pays, EVERY iteration, a dense (S, M, M)
Jacobian build plus an O(M^3) batched LU factorization (M = #unknowns,
~2N). The fast-decoupled method (Stott & Alsac 1974; pypower's fdpf/makeB)
replaces the Jacobian blocks with two CONSTANT susceptance matrices:

  B'  — the P-theta half-step operator (network with line charging, bus
        shunts and off-nominal tap ratios removed; the XB scheme also
        drops series resistance),
  B'' — the Q-V half-step operator (network with phase shifters removed;
        the BX scheme drops series resistance here instead),

which depend only on the branch parameters — NOT on the iterate — so they
are factored ONCE per solve. On a batched shared-topology set that
one-time cost is a single batched-LU inverse, and every subsequent
iteration costs only

  * an edge-list mismatch evaluation — O(S*E) elementwise plus one
    (N, 2E) incidence contraction, instead of the dense O(S*N^2)
    trig-kernel build the Newton iteration pays, and
  * two batched matvecs against the precomputed inverses, O(S*M^2),

i.e. pure MXU/VPU work with no factorization and no dense (S, N, N)
intermediates in the loop. Per-iteration cost drops by roughly a factor
of N relative to Newton; the price is linear (geometric) instead of
quadratic convergence — more, much cheaper, iterations. The fixed point
is IDENTICAL (convergence is gated on the true AC mismatch, not on the
decoupled operators; B'/B'' only shape the update direction), so this is
an exact solver with the same contract as `solve_batched`.

Where it pays (measured, docs/FDPF_BENCH.json): warm-started and
iteration-dominated regimes — N-1 screening, hot time-series re-solves,
GNS-seeded solves — where Newton's per-iteration O(M^3) dominates wall
time. Where it does not: grids whose r/x ratios break the decoupling
assumption converge slowly or not at all (the classical limitation); any
non-converged grid should be (and, via `eval.solve.solve_ac`, is)
re-solved with full Newton, so robustness is never worse than NR alone.

The reference has no solver at all beyond calling pypower's runpf one
grid at a time (GNS/evaluate.py:25-40); this module is the second native
batched solver family next to nr_batched, sharing its packing, caching
and warm-start conventions.

Everything is float32 real arithmetic (the relay implements neither
complex linalg nor jnp.linalg.solve lowerings; lax.linalg.lu /
triangular_solve are native — see nr_batched's module docstring). The
f32 inverse of a stiff B' is inexact, which only degrades the update
direction (slower geometric rate), never the answer: the mismatch gate
is computed from the raw branch parameters.
"""

from __future__ import annotations

from typing import Dict, List

import numpy as np

import jax
import jax.numpy as jnp

from gns_tpu.eval.nr_batched import (
    _STALL_TOL,
    _assemble_gb,
    _cache_put,
    _pack_solution,
    build_nr_small_stacked,
    stack_cases,
)


def _branch_parts(bus, branch, base, has_status: bool):
    """Per-branch admittance components for the edge-list mismatch eval.

    The same MATPOWER-convention formulas as `nr_batched._assemble_gb`,
    returned as (S, E) component arrays (yff/yft/ytf/ytt real+imag) plus
    the (S, N) bus shunt conductance/susceptance — WITHOUT scattering
    into a dense (S, N, N) matrix, because the mismatch evaluation only
    ever needs the per-branch terms.
    """
    r, x, bc0 = branch[:, :, 2], branch[:, :, 3], branch[:, :, 4]
    status = branch[:, :, 10] if has_status else jnp.ones_like(r)
    denom = r * r + x * x
    ys_re = status * r / denom
    ys_im = -status * x / denom
    bc = status * bc0
    tau = jnp.where(branch[:, :, 8] == 0, 1.0, branch[:, :, 8])
    shift = jnp.deg2rad(branch[:, :, 9])
    ct, st = jnp.cos(shift), jnp.sin(shift)
    tau2 = tau * tau

    ytt_re, ytt_im = ys_re, ys_im + bc / 2.0
    yff_re, yff_im = ytt_re / tau2, ytt_im / tau2
    yft_re = -(ys_re * ct - ys_im * st) / tau
    yft_im = -(ys_re * st + ys_im * ct) / tau
    ytf_re = -(ys_re * ct + ys_im * st) / tau
    ytf_im = -(ys_im * ct - ys_re * st) / tau

    gsh = bus[:, :, 4] / base[:, None]
    bsh = bus[:, :, 5] / base[:, None]
    return (yff_re, yff_im, yft_re, yft_im,
            ytf_re, ytf_im, ytt_re, ytt_im, gsh, bsh)


def _make_injections(parts, inc_f, inc_t, f, t):
    """Closure computing bus P/Q injections from (vm, va) via the edge
    list: per-branch complex flows S_f = V_f (y_ff V_f + y_ft V_t)*,
    S_t = V_t (y_tf V_f + y_tt V_t)* expanded in real arithmetic, then
    one (N, E) incidence contraction per side — O(S*E) work, no dense
    (S, N, N) intermediate. Verified against the dense trig-kernel
    injections of `nr_batched._nr_solve` (tests/test_fdpf.py)."""
    (yff_re, yff_im, yft_re, yft_im,
     ytf_re, ytf_im, ytt_re, ytt_im, gsh, bsh) = parts
    # The (N, E) incidence contraction is a real MXU matmul, and the TPU's
    # default matmul precision is bf16 — which puts an ~8e-3 absolute
    # error on the injections (measured) and caps the attainable mismatch
    # floor three orders above tol. HIGHEST forces the f32-accurate
    # passes; the contraction is tiny (N*E), so the cost is irrelevant.
    # (The Newton solver's "snk,sk->sn" batched matvec never hits the MXU,
    # which is why nr_batched needs no such pin.)
    hi = jax.lax.Precision.HIGHEST

    def injections(vm, va):
        dva = va[:, f] - va[:, t]
        c, s = jnp.cos(dva), jnp.sin(dva)
        vf, vt = vm[:, f], vm[:, t]
        vf2, vt2, vfvt = vf * vf, vt * vt, vf * vt
        # from-side: V_f V_t* = vfvt e^{+j dva}; conj(yft) = g - jb
        pf = vf2 * yff_re + vfvt * (yft_re * c + yft_im * s)
        qf = -vf2 * yff_im + vfvt * (yft_re * s - yft_im * c)
        # to-side: V_t V_f* = vfvt e^{-j dva}
        pt = vt2 * ytt_re + vfvt * (ytf_re * c - ytf_im * s)
        qt = -vt2 * ytt_im - vfvt * (ytf_re * s + ytf_im * c)
        vm2 = vm * vm
        p = (jnp.einsum("ne,se->sn", inc_f, pf, precision=hi)
             + jnp.einsum("ne,se->sn", inc_t, pt, precision=hi)
             + vm2 * gsh)
        q = (jnp.einsum("ne,se->sn", inc_f, qf, precision=hi)
             + jnp.einsum("ne,se->sn", inc_t, qt, precision=hi)
             - vm2 * bsh)
        return p, q

    return injections


def _batched_inverse(mat):
    """Explicit batched inverse via native LU + two triangular solves
    against the identity (jnp.linalg.inv/solve lowerings are not
    implemented on the relay; these primitives are). The inverse is
    applied as one batched matvec per half-iteration — cheaper per
    iteration than repeated triangular solves and MXU-shaped."""
    s, m = mat.shape[0], mat.shape[1]
    lu, _, perm = jax.lax.linalg.lu(mat)
    rhs = jnp.broadcast_to(jnp.eye(m, dtype=mat.dtype), (s, m, m))
    rhs = jnp.take_along_axis(rhs, perm[:, :, None], axis=1)
    y = jax.lax.linalg.triangular_solve(
        lu, rhs, left_side=True, lower=True, unit_diagonal=True
    )
    return jax.lax.linalg.triangular_solve(
        lu, y, left_side=True, lower=False
    )


def _build_b_matrices(bus, branch, base, fj, tj, has_status: bool,
                      alg: str):
    """B' and B'' per pypower/MATPOWER makeB semantics, assembled on
    device by reusing `_assemble_gb` on modified branch/bus stacks:

      B'  = -Im Ybus(charging=0, tap ratio=1, bus shunts=0
                     [, r=0 if XB]; phase shift kept)
      B'' = -Im Ybus(phase shift=0 [, r=0 if BX]; shunts/taps kept)
    """
    bp_branch = branch.at[:, :, 4].set(0.0).at[:, :, 8].set(1.0)
    if alg == "XB":
        bp_branch = bp_branch.at[:, :, 2].set(0.0)
    bp_bus = bus.at[:, :, 5].set(0.0)
    _, bp_bmat = _assemble_gb(bp_bus, bp_branch, base, fj, tj, has_status)

    bpp_branch = branch.at[:, :, 9].set(0.0)
    if alg == "BX":
        bpp_branch = bpp_branch.at[:, :, 2].set(0.0)
    _, bpp_bmat = _assemble_gb(bus, bpp_branch, base, fj, tj, has_status)
    return -bp_bmat, -bpp_bmat


def _fdpf_solve(injections, bp_inv, bpp_inv, p_sched, q_sched, vm0, va0,
                pvpq, pq, tol, max_iter):
    """The fast-decoupled while_loop: alternating P-theta / Q-V
    half-steps with per-grid freezing and the same stalled-at-floor
    acceptance contract as `_nr_solve` (a slightly stricter 0.95
    progress factor — fast-decoupled convergence is geometric, so
    "still shrinking" looks different from Newton's quadratic drops)."""
    n_pvpq = pvpq.shape[0]
    stall_cap = jnp.minimum(_STALL_TOL, 10.0 * tol)
    # Pin the B-inverse application too: measured a no-op today (the
    # batched matvec lowers off the MXU, iteration counts identical at
    # default precision — lock-step counts are set by the worst straggler
    # in the batch, which grows with batch size), but if a future XLA
    # lowers "smk,sk->sm" onto the MXU at bf16 the update directions
    # would silently degrade. HIGHEST costs S*M^2 flops — noise.
    hi = jax.lax.Precision.HIGHEST

    def f_of(p, q):
        return jnp.concatenate(
            [(p - p_sched)[:, pvpq], (q - q_sched)[:, pq]], axis=1
        )

    def cond(state):
        vm, va, p, q, conv, it, itg, fprev = state
        return jnp.logical_and(it < max_iter, ~jnp.all(conv))

    def body(state):
        vm, va, p, q, conv, it, itg, fprev = state
        # P half-step: B' dtheta = dP / Vm  (pypower fdpf conventions)
        fp = (p - p_sched)[:, pvpq] / vm[:, pvpq]
        dva = jnp.einsum("smk,sk->sm", bp_inv, fp, precision=hi)
        va = va.at[:, pvpq].add(-jnp.where(conv[:, None], 0.0, dva))
        p, q = injections(vm, va)
        # Q half-step: B'' dVm = dQ / Vm
        fq = (q - q_sched)[:, pq] / vm[:, pq]
        dvm = jnp.einsum("smk,sk->sm", bpp_inv, fq, precision=hi)
        vm = vm.at[:, pq].add(-jnp.where(conv[:, None], 0.0, dvm))
        p, q = injections(vm, va)

        fmax = jnp.max(jnp.abs(f_of(p, q)), axis=1)
        now = jnp.logical_or(
            fmax < tol,
            jnp.logical_and(fmax < stall_cap, fmax > 0.95 * fprev),
        )
        itg = jnp.where(now & ~conv, it + 1, itg)
        conv = jnp.logical_or(conv, now)
        return vm, va, p, q, conv, it + 1, itg, fmax

    p0, q0 = injections(vm0, va0)
    fmax0 = jnp.max(jnp.abs(f_of(p0, q0)), axis=1)
    conv0 = fmax0 < tol
    it0 = jnp.asarray(0, jnp.int32)
    itg0 = jnp.zeros(vm0.shape[0], jnp.int32)
    vm, va, _, _, conv, it, itg, fmax = jax.lax.while_loop(
        cond, body, (vm0, va0, p0, q0, conv0, it0, itg0, fmax0)
    )
    itg = jnp.where(conv, itg, it)
    return vm, va, conv, it, itg, fmax


_FDPF_CACHE: Dict[tuple, object] = {}


def _fdpf_core(f: np.ndarray, t: np.ndarray, shapes: tuple,
               has_status: bool, alg: str):
    """Jitted end-to-end program: device-side B'/B'' assembly + one-time
    batched inverses + the fast-decoupled while_loop + packed output —
    cached per (topology, shapes, alg) exactly like `_nr_core`."""
    key = (f.tobytes(), t.tobytes(), shapes, has_status, alg)
    fn = _FDPF_CACHE.get(key)
    if fn is not None:
        return fn
    fj = jnp.asarray(f)
    tj = jnp.asarray(t)
    n = shapes[0][1]
    inc_f = jax.nn.one_hot(fj, n, dtype=jnp.float32).T  # (N, E)
    inc_t = jax.nn.one_hot(tj, n, dtype=jnp.float32).T

    def run(bus, branch, base, p_sched, q_sched, vm0, va0, pvpq, pq, tol,
            max_iter):
        bp, bpp = _build_b_matrices(bus, branch, base, fj, tj,
                                    has_status, alg)
        bp_inv = _batched_inverse(bp[:, pvpq][:, :, pvpq])
        bpp_inv = _batched_inverse(bpp[:, pq][:, :, pq])
        parts = _branch_parts(bus, branch, base, has_status)
        injections = _make_injections(parts, inc_f, inc_t, fj, tj)
        vm, va, conv, it, itg, fmax = _fdpf_solve(
            injections, bp_inv, bpp_inv, p_sched, q_sched, vm0, va0,
            pvpq, pq, tol, max_iter,
        )
        return _pack_solution(vm, va, conv, it, itg, fmax)

    fn = jax.jit(run)
    _cache_put(_FDPF_CACHE, key, fn)
    return fn


def calc_injections(cases: List[Dict]):
    """Bus P/Q injections (p.u.) at each case's stored voltage profile,
    via the edge-list evaluation — the test hook that pins the edge-list
    formulation against the dense trig-kernel path."""
    bus, branch, gen, base = stack_cases(cases)
    f = branch[0, :, 0].astype(np.int32) - 1
    t = branch[0, :, 1].astype(np.int32) - 1
    has_status = branch.shape[2] > 10
    n = bus.shape[1]
    inc_f = jax.nn.one_hot(jnp.asarray(f), n, dtype=jnp.float32).T
    inc_t = jax.nn.one_hot(jnp.asarray(t), n, dtype=jnp.float32).T
    busj = jnp.asarray(bus, jnp.float32)
    branchj = jnp.asarray(branch, jnp.float32)
    basej = jnp.asarray(base, jnp.float32)
    parts = _branch_parts(busj, branchj, basej, has_status)
    inj = _make_injections(parts, inc_f, inc_t, jnp.asarray(f),
                           jnp.asarray(t))
    vm = jnp.asarray(bus[:, :, 7], jnp.float32)
    va = jnp.deg2rad(jnp.asarray(bus[:, :, 8], jnp.float32))
    p, q = inj(vm, va)
    return np.asarray(p), np.asarray(q)


def solve_batched_fdpf(
    cases: List[Dict],
    tol: float = 3e-5,
    max_iter: int = 60,
    chunk_size: int = 256,
    warm_start=None,
    alg: str = "XB",
    mesh=None,
) -> Dict:
    """Fast-decoupled twin of `nr_batched.solve_batched`: same inputs,
    same result schema ({"v", "theta_deg", "converged", "iterations",
    "iterations_per_grid", "mismatch", "stalled", ...}), same warm-start
    seeding semantics (PQ magnitudes + PV/PQ angles only), same
    chunked async-dispatch/one-packed-fetch driver.

    max_iter counts P/Q half-step PAIRS and defaults higher than
    Newton's (60 vs 20): convergence is geometric, so the solver takes
    more — far cheaper — iterations. There is no compact_after: a
    fast-decoupled iteration costs two matvecs, so the per-grid exit's
    extra round trip can never pay.

    alg: "XB" (default; series resistance dropped from B') or "BX"
    (dropped from B'' instead) — the two classical Stott-Alsac variants;
    both gate on the true mismatch and give the same fixed point.

    Non-converged grids keep their last iterate, flagged False — on
    grids whose r/x ratios defeat the decoupling, re-solve with full
    Newton (`solve_ac(..., method="auto")` does exactly that).

    mesh: optional Mesh with a "dp" axis — shard each chunk's batch axis
    across devices (parallel/solver_dp.py; identical fixed points, see
    nr_batched.solve_batched's mesh note).
    """
    from gns_tpu.parallel.solver_dp import (
        pad_rows,
        padded_rows,
        put_dp,
        put_repl,
    )

    if alg not in ("XB", "BX"):
        raise ValueError(f"alg must be XB|BX, got {alg!r}")
    pending = []
    for lo in range(0, len(cases), chunk_size):
        bus, branch, gen, base = stack_cases(cases[lo:lo + chunk_size])
        ns = build_nr_small_stacked(bus, branch, gen, base)
        vm0, va0 = ns.vm0, ns.va0
        if warm_start is not None:
            wv = np.asarray(warm_start[0][lo:lo + chunk_size], np.float32)
            wth = np.asarray(warm_start[1][lo:lo + chunk_size], np.float32)
            vm0, va0 = vm0.copy(), va0.copy()
            vm0[:, ns.pq] = wv[:, ns.pq]
            va0[:, ns.pvpq] = wth[:, ns.pvpq]
        f = branch[0, :, 0].astype(np.int32) - 1
        t = branch[0, :, 1].astype(np.int32) - 1
        has_status = branch.shape[2] > 10
        k = bus.shape[0]
        p_sched, q_sched = ns.p_sched, ns.q_sched
        if mesh is not None:
            target = padded_rows(k, mesh)
            bus, branch, base = (pad_rows(a, target)
                                 for a in (bus, branch, base))
            p_sched, q_sched, vm0, va0 = (
                pad_rows(a, target) for a in (p_sched, q_sched, vm0, va0)
            )
        core = _fdpf_core(f, t, (bus.shape, branch.shape), has_status, alg)
        dev = core(
            put_dp(mesh, bus.astype(np.float32)),
            put_dp(mesh, branch.astype(np.float32)),
            put_dp(mesh, base.astype(np.float32)),
            put_dp(mesh, p_sched), put_dp(mesh, q_sched),
            put_dp(mesh, vm0), put_dp(mesh, va0),
            put_repl(mesh, jnp.asarray(ns.pvpq)),
            put_repl(mesh, jnp.asarray(ns.pq)), tol,
            jnp.asarray(max_iter, jnp.int32),
        )
        pending.append((dev, k, bus.shape[1]))

    vms, vas, convs, its, itgs, fms = [], [], [], [], [], []
    for dev, k, n in pending:
        packed = np.array(dev)[:k]
        vms.append(packed[:, :n])
        vas.append(packed[:, n:2 * n])
        convs.append(packed[:, 2 * n] > 0.5)
        its.append(int(packed[0, 2 * n + 1]))
        itgs.append(packed[:, 2 * n + 2].astype(np.int32))
        fms.append(packed[:, 2 * n + 3])
    conv_all = np.concatenate(convs)
    mismatch = np.concatenate(fms).astype(np.float32)
    return {
        "v": np.concatenate(vms).astype(np.float32),
        "theta_deg": np.rad2deg(np.concatenate(vas)).astype(np.float32),
        "converged": conv_all,
        "iterations": max(its),
        "iterations_per_chunk": its,
        "iterations_per_grid": np.concatenate(itgs),
        "mismatch": mismatch,
        "stalled": conv_all & (mismatch >= tol),
        "method": "fdpf",
    }
