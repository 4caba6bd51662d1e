"""Batched Newton-Raphson AC power flow on the accelerator.

The reference's oracle solves grids ONE AT A TIME with pypower's runpf
(reference: GNS/evaluate.py:25-40, ~ms per grid on CPU, sequential loop over
1024 grids). Augmented grids of one case share their topology (bus types,
branch endpoints — the augmentation perturbs only electrical parameters,
GNS/augment_grids.py:28-54), so the whole evaluation set can be solved as a
single batched program: dense per-grid G/B admittance matrices, the batched
polar Jacobian in its real H/N/J/L block form, and a batched LU solve —
thousands of Newton solves per dispatch instead of one.

The dense admittance matrices are assembled ON DEVICE from the raw
float32 case stacks (`_assemble_gb`, static endpoint indices): on the
remote relay (~17 MB/s host<->device, ~33 ms per round trip) the case300
(S=256, N=300) G/B pair is 184 MB of transfer and ~3.3 s of host
complex128 assembly, while the raw stacks are ~10 MB. All solve outputs
come back as ONE packed array -> one fetch round trip.

Everything is REAL float32 by design: the axon TPU relay implements neither
complex arithmetic nor jnp.linalg.solve's lowering, but the underlying
lax.linalg.lu / triangular_solve primitives are native (QR too, measured
~8x slower at case300 sizes), and the polar power-flow Jacobian has
well-known real closed forms (the same identities pypower's dSbus_dV
expands to):

  P_m = V_m sum_k V_k (G_mk cos th_mk + B_mk sin th_mk)
  Q_m = V_m sum_k V_k (G_mk sin th_mk - B_mk cos th_mk)
  H = dP/dth: off-diag  V_m V_k (G sin - B cos);  diag -Q_m - B_mm V_m^2
  N = dP/dV:  off-diag  V_m (G cos + B sin);      diag  P_m/V_m + G_mm V_m
  J = dQ/dth: off-diag -V_m V_k (G cos + B sin);  diag  P_m - G_mm V_m^2
  L = dQ/dV:  off-diag  V_m (G sin - B cos);      diag  Q_m/V_m - B_mm V_m

Numerics: float32's attainable mismatch floor is ~1e-5 p.u. (vs the scipy
float64 oracle's 1e-8), which is 2-3 orders below the GNS model errors this
oracle measures. For parity-grade ground truth keep `eval.newton_raphson`
(scipy, float64); this module is the throughput path: fast evaluation
sweeps, dataset feasibility filtering, and a standalone batched solver.

Shapes are static per (case, chunk-size): jit compiles once per bucket.
"""

from __future__ import annotations

import threading
from typing import Dict, List, NamedTuple

import numpy as np

import jax
import jax.numpy as jnp


class NRBatch(NamedTuple):
    """Host-prepared batched NR problem (one shared-topology case set)."""

    gmat: np.ndarray  # (S, N, N) float32 dense conductance matrix
    bmat: np.ndarray  # (S, N, N) float32 dense susceptance matrix
    p_sched: np.ndarray  # (S, N) float32 scheduled net active injection, p.u.
    q_sched: np.ndarray  # (S, N) float32 scheduled net reactive injection
    vm0: np.ndarray  # (S, N) float32 initial |v| (gen buses at vg)
    va0: np.ndarray  # (S, N) float32 initial angle, radians
    pvpq: np.ndarray  # (M1,) int32 PV+PQ bus indices (shared across batch)
    pq: np.ndarray  # (M2,) int32 PQ bus indices


def stack_cases(cases: List[Dict]):
    """Stack shared-topology case dicts into (bus, branch, gen, base) arrays.

    One pass over the Python dicts — everything downstream (NR assembly,
    GNS grid preparation in eval/hybrid.py) is vectorized numpy over these
    stacks, so the per-case Python cost is paid exactly once. Validates
    the shared-topology contract (identical bus types, branch endpoints,
    generator buses, consecutive 1..N numbering).
    """
    bus0 = np.asarray(cases[0]["bus"], np.float64)
    br0 = np.asarray(cases[0]["branch"], np.float64)
    gen0 = np.asarray(cases[0]["gen"], np.float64)
    n, e, ng = bus0.shape[0], br0.shape[0], gen0.shape[0]
    if not np.array_equal(bus0[:, 0].astype(int), np.arange(1, n + 1)):
        raise ValueError("batched NR requires consecutive 1..N bus ids")
    s = len(cases)

    bus = np.empty((s, n, bus0.shape[1]), np.float64)
    branch = np.empty((s, e, br0.shape[1]), np.float64)
    gen = np.empty((s, ng, gen0.shape[1]), np.float64)
    base = np.empty((s,), np.float64)
    for i, case in enumerate(cases):
        bus[i] = np.asarray(case["bus"], np.float64)
        branch[i] = np.asarray(case["branch"], np.float64)
        gen[i] = np.asarray(case["gen"], np.float64)
        base[i] = case["baseMVA"]

    types = bus0[:, 1].astype(int)
    if not (bus[:, :, 1].astype(int) == types).all():
        raise ValueError("batched NR requires identical bus types")
    f = br0[:, 0].astype(np.int64) - 1
    t = br0[:, 1].astype(np.int64) - 1
    if not (
        (branch[:, :, 0].astype(np.int64) - 1 == f).all()
        and (branch[:, :, 1].astype(np.int64) - 1 == t).all()
    ):
        raise ValueError("batched NR requires identical branch endpoints")
    return bus, branch, gen, base


def build_nr_batch(cases: List[Dict]) -> NRBatch:
    """Pack pypower-style case dicts into one batched problem.

    All cases must share bus types, branch endpoints, and consecutive
    1..N bus numbering (true for any augmented set of one base case).
    Raises if they do not. The whole assembly is vectorized numpy over
    the batch — one fused `np.add.at` builds every dense Ybus at once
    (the per-case scipy path costs more than the device solve it feeds).
    """
    return build_nr_batch_stacked(*stack_cases(cases))


def build_nr_batch_stacked(bus, branch, gen, base) -> NRBatch:
    """Vectorized NR assembly from stack_cases output (no Python loop)."""
    s, n = bus.shape[:2]
    e, ng = branch.shape[1], gen.shape[1]
    br0, gen0 = branch[0], gen[0]
    types = bus[0, :, 1].astype(int)
    pv = np.flatnonzero(types == 2)
    pq = np.flatnonzero(types == 1)
    pvpq = np.concatenate([pv, pq]).astype(np.int32)
    f = br0[:, 0].astype(np.int64) - 1
    t = br0[:, 1].astype(np.int64) - 1

    # --- vectorized Ybus (MATPOWER conventions, cf. newton_raphson.make_ybus)
    status = branch[:, :, 10] if br0.shape[1] > 10 else np.ones((s, e))
    ys = status / (branch[:, :, 2] + 1j * branch[:, :, 3])
    bc = status * branch[:, :, 4]
    tap = np.where(branch[:, :, 8] == 0, 1.0, branch[:, :, 8]) * np.exp(
        1j * np.deg2rad(branch[:, :, 9])
    )
    ytt = ys + 1j * bc / 2.0
    yff = ytt / (tap * np.conj(tap))
    yft = -ys / np.conj(tap)
    ytf = -ys / tap
    ysh = (bus[:, :, 4] + 1j * bus[:, :, 5]) / base[:, None]

    ybus = np.zeros((s, n, n), np.complex128)
    flat = ybus.reshape(s, n * n)
    np.add.at(flat, (slice(None), f * n + t), yft)
    np.add.at(flat, (slice(None), t * n + f), ytf)
    np.add.at(flat, (slice(None), f * n + f), yff)
    np.add.at(flat, (slice(None), t * n + t), ytt)
    flat[:, np.arange(n) * n + np.arange(n)] += ysh

    # --- scheduled injections and initial voltage
    gbus = gen0[:, 0].astype(np.int64) - 1
    if not (gen[:, :, 0].astype(np.int64) - 1 == gbus).all():
        raise ValueError("batched NR requires identical generator buses")
    gstat = gen[:, :, 7] if gen0.shape[1] > 7 else np.ones((s, ng))
    pg = np.zeros((s, n))
    qg = np.zeros((s, n))
    np.add.at(pg, (slice(None), gbus), gen[:, :, 1] * gstat)
    np.add.at(qg, (slice(None), gbus), gen[:, :, 2] * gstat)
    p_sched = (pg - bus[:, :, 2]) / base[:, None]
    q_sched = (qg - bus[:, :, 3]) / base[:, None]

    vm0 = bus[:, :, 7].copy()
    # in-service generator set-points win (runpf semantics); batched
    # scatter of vg where gstat > 0
    rows = np.repeat(np.arange(s), ng)
    cols = np.tile(gbus, s)
    on = (gstat > 0).ravel()
    vm0[rows[on], cols[on]] = (gen[:, :, 5]).ravel()[on]
    va0 = np.deg2rad(bus[:, :, 8])

    return NRBatch(
        ybus.real.astype(np.float32), ybus.imag.astype(np.float32),
        p_sched.astype(np.float32), q_sched.astype(np.float32),
        vm0.astype(np.float32), va0.astype(np.float32),
        pvpq, pq.astype(np.int32),
    )


class NRSmall(NamedTuple):
    """The cheap-to-transfer NR inputs: everything EXCEPT the dense G/B
    admittance matrices, which are assembled on device (`_assemble_gb`)
    from the raw branch/bus stacks. Measured rationale: on the remote
    relay (~17 MB/s host<->device), the (S, N, N) float32 G/B pair for
    case300 at S=256 is 184 MB (~10 s of transfer) and its host-side
    complex128 assembly costs another ~3.3 s — while the raw stacks it is
    computed from are ~10 MB. The admittance matrix never touches the
    host."""

    p_sched: np.ndarray  # (S, N) float32
    q_sched: np.ndarray  # (S, N)
    vm0: np.ndarray  # (S, N)
    va0: np.ndarray  # (S, N)
    pvpq: np.ndarray  # (M1,) int32
    pq: np.ndarray  # (M2,) int32


def build_nr_small_stacked(bus, branch, gen, base) -> NRSmall:
    """Scheduled injections, initial voltage, bus-type index sets — the
    host-side part of the batched problem (vectorized, no Ybus)."""
    s, n = bus.shape[:2]
    ng = gen.shape[1]
    gen0 = gen[0]
    types = bus[0, :, 1].astype(int)
    pv = np.flatnonzero(types == 2)
    pq = np.flatnonzero(types == 1)
    pvpq = np.concatenate([pv, pq]).astype(np.int32)

    gbus = gen0[:, 0].astype(np.int64) - 1
    if not (gen[:, :, 0].astype(np.int64) - 1 == gbus).all():
        raise ValueError("batched NR requires identical generator buses")
    gstat = gen[:, :, 7] if gen0.shape[1] > 7 else np.ones((s, ng))
    pg = np.zeros((s, n))
    qg = np.zeros((s, n))
    np.add.at(pg, (slice(None), gbus), gen[:, :, 1] * gstat)
    np.add.at(qg, (slice(None), gbus), gen[:, :, 2] * gstat)
    p_sched = (pg - bus[:, :, 2]) / base[:, None]
    q_sched = (qg - bus[:, :, 3]) / base[:, None]

    vm0 = bus[:, :, 7].copy()
    rows = np.repeat(np.arange(s), ng)
    cols = np.tile(gbus, s)
    on = (gstat > 0).ravel()
    vm0[rows[on], cols[on]] = (gen[:, :, 5]).ravel()[on]
    va0 = np.deg2rad(bus[:, :, 8])
    return NRSmall(
        p_sched.astype(np.float32), q_sched.astype(np.float32),
        vm0.astype(np.float32), va0.astype(np.float32),
        pvpq, pq.astype(np.int32),
    )


def _assemble_gb(bus, branch, base, f, t, has_status: bool):
    """Device-side dense G/B admittance assembly (inside jit).

    Real-arithmetic twin of the host complex path in
    `build_nr_batch_stacked` (MATPOWER conventions): branch series
    admittance ys = status/(r+jx), charging b, complex tap tau*e^{j
    shift}, plus bus shunts — scatter-added into (S, N, N) via the STATIC
    endpoint index arrays `f`/`t` (the shared topology; augmentation
    never changes endpoints, GNS/augment_grids.py:28-54). bus/branch are
    the raw float32 case stacks; nothing dense ever crosses the host
    boundary.
    """
    s, n = bus.shape[:2]
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
    # yft = -ys / conj(tap) = -ys * e^{j shift} / tau
    yft_re = -(ys_re * ct - ys_im * st) / tau
    yft_im = -(ys_re * st + ys_im * ct) / tau
    # ytf = -ys / tap = -ys * e^{-j shift} / tau
    ytf_re = -(ys_re * ct + ys_im * st) / tau
    ytf_im = -(ys_im * ct - ys_re * st) / tau

    ysh_re = bus[:, :, 4] / base[:, None]
    ysh_im = bus[:, :, 5] / base[:, None]

    idx = jnp.arange(n)

    def scatter(ff, ft, tf, tt, sh):
        m = jnp.zeros((s, n, n), jnp.float32)
        m = m.at[:, f, t].add(ft)
        m = m.at[:, t, f].add(tf)
        m = m.at[:, f, f].add(ff)
        m = m.at[:, t, t].add(tt)
        return m.at[:, idx, idx].add(sh)

    gmat = scatter(yff_re, yft_re, ytf_re, ytt_re, ysh_re)
    bmat = scatter(yff_im, yft_im, ytf_im, ytt_im, ysh_im)
    return gmat, bmat


# jitted end-to-end cores, keyed by (endpoint topology, shapes, max_iter)
# — module-level so every solve_batched / bench call reuses the program.
# Bounded: a long-lived serving process over a varied solve_mixed stream
# accumulates one compiled program per distinct (topology, chunk shape);
# evicting the oldest entry past the cap keeps steady-state memory flat
# (the XLA executable itself persists in the on-disk compilation cache, so
# re-admission after eviction costs a cache load, not a recompile).
_CORE_CACHE: Dict[tuple, object] = {}
_CACHE_CAP = 64

# The screens and solve_mixed dispatch groups on a thread pool
# (contingency.py), so the module-level program caches are touched
# concurrently. Reads (`cache.get`) are GIL-atomic and a duplicate trace
# is only wasted work (last-writer-wins on identical programs), but the
# eviction loop iterates while popping — serialize all inserts.
_CACHE_LOCK = threading.Lock()


def _cache_put(cache: Dict[tuple, object], key: tuple, fn) -> None:
    """Insert with oldest-entry eviction past _CACHE_CAP (dicts preserve
    insertion order; good enough for the one-program-per-topology serving
    contract without an LRU dependency). Thread-safe: see _CACHE_LOCK."""
    with _CACHE_LOCK:
        while len(cache) >= _CACHE_CAP:
            cache.pop(next(iter(cache)))
        cache[key] = fn


def _pack_solution(vm, va, conv, it, itg, fmax):
    """[vm | va | conv | iters | iters_per_grid | mismatch] -> (S, 2N+4)
    float32. ONE packed output -> ONE host fetch (each fetch is a full
    relay round trip)."""
    return jnp.concatenate(
        [vm, va, conv[:, None].astype(jnp.float32),
         jnp.broadcast_to(it.astype(jnp.float32), (vm.shape[0], 1)),
         itg[:, None].astype(jnp.float32),
         fmax[:, None].astype(jnp.float32)],
        axis=1,
    )


def _nr_core(f: np.ndarray, t: np.ndarray, shapes: tuple, has_status: bool):
    key = (f.tobytes(), t.tobytes(), shapes, has_status)
    fn = _CORE_CACHE.get(key)
    if fn is not None:
        return fn
    fj = jnp.asarray(f)
    tj = jnp.asarray(t)

    def run(bus, branch, base, p_sched, q_sched, vm0, va0, pvpq, pq, tol,
            max_iter):
        gmat, bmat = _assemble_gb(bus, branch, base, fj, tj, has_status)
        vm, va, conv, it, itg, fmax = _nr_solve(
            gmat, bmat, p_sched, q_sched, vm0, va0, pvpq, pq,
            tol=tol, max_iter=max_iter,
        )
        return _pack_solution(vm, va, conv, it, itg, fmax)

    fn = jax.jit(run)
    _cache_put(_CORE_CACHE, key, fn)
    return fn


# Stalled-at-floor acceptance cap: a grid whose mismatch is below
# min(_STALL_TOL, 10*tol) (0.03 MW on a 100 MVA base at the default tol —
# 2-3 orders under GNS model error) and no longer making Newton progress
# is accepted as converged at its float32-attainable iterate. Scaling with
# tol keeps the contract honest for strict callers: at tol=1e-6 the cap is
# 1e-5, so a grid stalled at 3e-4 is REPORTED non-converged rather than
# silently accepted. Stall-accepted grids (converged with final mismatch
# >= tol) are distinguishable via solve_batched's "stalled" mask. See the
# gate comment in _nr_solve's body.
_STALL_TOL = 3e-4


@jax.jit
def _nr_solve(gmat, bmat, p_sched, q_sched, vm0, va0, pvpq, pq,
              tol: float = 3e-5, max_iter: int = 20):
    """Batched full-Newton polar power flow, real arithmetic + LU solve.

    max_iter is a TRACED bound (the while_loop condition is dynamic
    anyway), so one compiled program serves every iteration budget — the
    compaction path re-enters with a remaining-budget bound without
    recompiling.

    Returns (vm, va, conv, iters, iters_per_grid, mismatch) —
    iters_per_grid is the iteration at which each grid first met tol
    (== iters for stragglers), the per-grid diagnostic behind
    bench_hybrid's distribution rows and the compaction heuristic;
    mismatch is each grid's final max |f| (p.u.), which lets callers
    separate tol-converged grids from stall-accepted ones."""
    n = vm0.shape[1]
    n_pvpq = pvpq.shape[0]
    eye = jnp.eye(n, dtype=vm0.dtype)

    def trig_terms(vm, va):
        # cos/sin(th_m - th_k) as rank-1 combinations; A1/A2 are the
        # G cos + B sin / G sin - B cos kernels of every formula above.
        c, s = jnp.cos(va), jnp.sin(va)
        cosmk = c[:, :, None] * c[:, None, :] + s[:, :, None] * s[:, None, :]
        sinmk = s[:, :, None] * c[:, None, :] - c[:, :, None] * s[:, None, :]
        a1 = gmat * cosmk + bmat * sinmk
        a2 = gmat * sinmk - bmat * cosmk
        p = vm * jnp.einsum("snk,sk->sn", a1, vm)
        q = vm * jnp.einsum("snk,sk->sn", a2, vm)
        return a1, a2, p, q

    def f_of(p, q):
        return jnp.concatenate(
            [(p - p_sched)[:, pvpq], (q - q_sched)[:, pq]], axis=1
        )

    def cond(state):
        vm, va, conv, it, itg, fprev = state
        return jnp.logical_and(it < max_iter, ~jnp.all(conv))

    def body(state):
        vm, va, conv, it, itg, fprev = state
        a1, a2, p, q = trig_terms(vm, va)
        f = f_of(p, q)

        vv = vm[:, :, None] * vm[:, None, :]
        g_diag = jnp.einsum("snn->sn", gmat)
        b_diag = jnp.einsum("snn->sn", bmat)
        vm_safe = jnp.maximum(vm, 1e-12)

        def with_diag(mat, d):
            # off-diagonal of `mat`, closed-form diagonal `d`
            return mat * (1.0 - eye) + eye * d[:, :, None]

        h = with_diag(vv * a2, -q - b_diag * vm * vm)
        nmat = with_diag(vm[:, :, None] * a1, p / vm_safe + g_diag * vm)
        jmat = with_diag(-vv * a1, p - g_diag * vm * vm)
        lmat = with_diag(vm[:, :, None] * a2, q / vm_safe - b_diag * vm)

        jac = jnp.concatenate(
            [
                jnp.concatenate([h[:, pvpq][:, :, pvpq],
                                 nmat[:, pvpq][:, :, pq]], axis=2),
                jnp.concatenate([jmat[:, pq][:, :, pvpq],
                                 lmat[:, pq][:, :, pq]], axis=2),
            ],
            axis=1,
        )
        # Batched LU + two triangular solves. (jnp.linalg.solve's lowering
        # is unimplemented on the axon TPU relay, but the underlying
        # lax.linalg.lu / triangular_solve primitives are native; QR also
        # works but measured ~8x slower at case300 sizes.)
        lu, _, perm = jax.lax.linalg.lu(jac)
        rhs = jnp.take_along_axis(f, perm, axis=1)[..., None]
        y = jax.lax.linalg.triangular_solve(
            lu, rhs, left_side=True, lower=True, unit_diagonal=True
        )
        dx = jax.lax.linalg.triangular_solve(
            lu, y, left_side=True, lower=False
        )[..., 0]

        # frozen grids (already converged) stop moving
        upd = jnp.where(conv[:, None], 0.0, dx)
        va = va.at[:, pvpq].add(-upd[:, :n_pvpq])
        vm = vm.at[:, pq].add(-upd[:, n_pvpq:])

        _, _, p, q = trig_terms(vm, va)
        fmax = jnp.max(jnp.abs(f_of(p, q)), axis=1)
        # Convergence gate: below tol, OR stalled at the float32 mismatch
        # floor. The floor scales with the largest |V_m V_k Y_mk| products
        # being cancelled — the authentic IEEE case118's stiff 345 kV
        # branches (x down to 0.00405 -> |y| ~ 250 p.u.) put it at
        # ~2.5e-5, above a 3e-5 tol for some draws. A grid whose mismatch
        # is small (< min(_STALL_TOL, 10*tol) — the cap scales with the
        # caller's tol so strict tolerances are not silently relaxed) and
        # no longer making Newton progress (not shrinking by 30%/iteration
        # — in the quadratic regime it shrinks by orders of magnitude) has
        # reached its f32-attainable iterate; more lock-step iterations
        # cannot improve it and only gate the rest of the batch.
        stall_cap = jnp.minimum(_STALL_TOL, 10.0 * tol)
        now = jnp.logical_or(
            fmax < tol,
            jnp.logical_and(fmax < stall_cap, fmax > 0.7 * fprev),
        )
        itg = jnp.where(now & ~conv, it + 1, itg)
        conv = jnp.logical_or(conv, now)
        return vm, va, conv, it + 1, itg, fmax

    _, _, p0, q0 = trig_terms(vm0, va0)
    fmax0 = jnp.max(jnp.abs(f_of(p0, q0)), axis=1)
    conv0 = fmax0 < tol
    it0 = jnp.asarray(0, jnp.int32)
    itg0 = jnp.zeros(vm0.shape[0], jnp.int32)
    # seed the progress tracker with the INITIAL mismatch so (a) the first
    # stall test compares against it and (b) a batch that converges before
    # the loop runs still reports a real final mismatch
    vm, va, conv, it, itg, fmax = jax.lax.while_loop(
        cond, body, (vm0, va0, conv0, it0, itg0, fmax0)
    )
    # stragglers that never met tol carry the full iteration count
    itg = jnp.where(conv, itg, it)
    return vm, va, conv, it, itg, fmax


# --- dispatch round-trip measurement & compact_after="auto" resolution.
# The per-grid convergence exit (compact_after) costs one extra
# fetch+dispatch round trip per chunk; whether that pays depends entirely
# on the deployment's dispatch RTT: ~70 ms on this remote relay (a
# measured NEGATIVE in ordinary regimes, docs/HYBRID_BENCH_R3.json) vs
# sub-ms on local TPU hardware (where the saved Jacobian builds win for
# the large cases). "auto" measures the actual round trip once per
# backend and picks the side of the break-even the caller is really on.
_RTT_CACHE: Dict[str, float] = {}
_COMPACT_RTT_BREAKEVEN = 5e-3  # seconds; relay ~33 ms >> this >> local ~0.1 ms


def measured_dispatch_rtt() -> float:
    """Min-of-3 wall time of a trivial dispatch + host value fetch —
    the per-round-trip cost every extra device hop pays on this backend
    (cached per backend; ~33 ms on the remote relay, ~0.1 ms locally)."""
    import time

    key = jax.default_backend()
    rtt = _RTT_CACHE.get(key)
    if rtt is not None:
        return rtt
    fn = jax.jit(lambda a: a + 1.0)
    x = jnp.zeros(8, jnp.float32)
    np.asarray(fn(x))  # compile + warm
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(fn(x))
        best = min(best, time.perf_counter() - t0)
    _RTT_CACHE[key] = best
    return best


def resolve_compact_after(compact_after, rtt_breakeven: float = None) -> int:
    """Resolve compact_after="auto" against the measured dispatch RTT:
    lock-step (0) when a round trip costs more than `rtt_breakeven`
    (default _COMPACT_RTT_BREAKEVEN = 5 ms — the relay regime), the
    per-grid exit (3) when round trips are cheap (local hardware).
    Integers pass through unchanged."""
    if compact_after != "auto":
        return int(compact_after)
    cap = _COMPACT_RTT_BREAKEVEN if rtt_breakeven is None else rtt_breakeven
    return 0 if measured_dispatch_rtt() > cap else 3


def solve_mixed(
    cases: List[Dict],
    tol: float = 3e-5,
    max_iter: int = 20,
    chunk_size: int = 256,
    compact_after: int = 0,
    method: str = "nr",
    mesh=None,
) -> Dict:
    """Solve a HETEROGENEOUS case list: group by topology, batch per group.

    `solve_batched` requires one shared topology (the augmented-set
    contract); a production request stream mixes cases. This wrapper
    groups by the full topology signature (bus count/types, branch
    endpoints, generator buses), solves each group as one batched
    program, and reassembles results in the original order. Arrays are
    padded to the largest bus count with NaN; "n_bus" carries each
    case's real size. One compiled program per distinct topology — a
    steady stream over a fixed case mix reuses them all.

    method: "nr" (default — the historical behavior) or "fdpf"/"auto",
    routed through `eval.solve.solve_ac` per group (the fast-decoupled
    solver with full-Newton flat-start fallback — 1.7-3.2x per group on
    cases >= 30 buses, docs/FDPF_BENCH.json).
    """
    sigs: Dict[bytes, list] = {}
    keys = []
    for i, case in enumerate(cases):
        bus = np.asarray(case["bus"])
        br = np.asarray(case["branch"])
        gen = np.asarray(case["gen"])
        sig = b"|".join([
            bus[:, 1].astype(np.int8).tobytes(),
            br[:, :2].astype(np.int32).tobytes(),
            gen[:, 0].astype(np.int32).tobytes(),
        ])
        sigs.setdefault(sig, []).append(i)
        keys.append(sig)
    n_max = max(np.asarray(c["bus"]).shape[0] for c in cases)
    s = len(cases)
    v = np.full((s, n_max), np.nan, np.float32)
    th = np.full((s, n_max), np.nan, np.float32)
    conv = np.zeros(s, bool)
    itg = np.zeros(s, np.int32)
    n_bus = np.zeros(s, np.int32)
    mismatch = np.zeros(s, np.float32)
    stalled = np.zeros(s, bool)
    iterations = 0

    def _solve(idx):
        if method == "nr":
            return solve_batched(
                [cases[i] for i in idx], tol=tol, max_iter=max_iter,
                chunk_size=chunk_size, compact_after=compact_after,
                mesh=mesh,
            )
        from gns_tpu.eval.solve import solve_ac

        return solve_ac(
            [cases[i] for i in idx], warm_start="flat", method=method,
            tol=tol, max_iter=max_iter, chunk_size=chunk_size,
            compact_after=compact_after, mesh=mesh,
        )

    # topology groups are independent programs; on a high-RTT relay each
    # costs a blocking fetch round trip — overlap them on a small thread
    # pool exactly like the N-1 screens (eval/contingency.py)
    groups = list(sigs.values())
    if len(groups) == 1:
        results = [_solve(groups[0])]
    else:
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=min(8, len(groups))) as ex:
            results = list(ex.map(_solve, groups))
    for idx, sub in zip(groups, results):
        n = sub["v"].shape[1]
        ii = np.asarray(idx)
        v[ii, :n] = sub["v"]
        th[ii, :n] = sub["theta_deg"]
        conv[ii] = sub["converged"]
        itg[ii] = sub["iterations_per_grid"]
        mismatch[ii] = sub["mismatch"]
        stalled[ii] = sub["stalled"]
        n_bus[ii] = n
        iterations = max(iterations, sub["iterations"])
    return {
        "v": v, "theta_deg": th, "converged": conv,
        "iterations": iterations, "iterations_per_grid": itg,
        "mismatch": mismatch, "stalled": stalled,
        "n_bus": n_bus, "n_groups": len(sigs),
    }


def solve_batched(
    cases: List[Dict],
    tol: float = 3e-5,
    max_iter: int = 20,
    chunk_size: int = 256,
    warm_start=None,
    compact_after=0,
    mesh=None,
) -> Dict:
    """Solve every case; returns {"v", "theta_deg", "converged",
    "iterations", "iterations_per_grid", "mismatch", "stalled", ...}.
    "stalled" marks grids accepted at the float32 mismatch floor (final
    mismatch in [tol, min(3e-4, 10*tol)) with Newton progress stalled)
    rather than strictly below tol — converged=True is the union.

    Chunks the batch so the dense (chunk, N, N) G/B matrices stay small
    (case300 at 256 grids is ~184 MB). Non-converged grids keep their last
    iterate, flagged False — callers filter exactly as with the scipy oracle
    (harness.compute_metrics drops them).

    compact_after: per-grid convergence exit. 0 (default) = pure
    lock-step. "auto" = measured-RTT resolution (resolve_compact_after:
    lock-step on a high-latency relay, 3 on local hardware).
    k > 0 = after k full-batch iterations, grids that already
    met tol stop paying Jacobian builds: the unconverged stragglers are
    repacked into a power-of-2 sub-batch that continues from its current
    iterates with the remaining budget. Costs one extra fetch + dispatch
    round trip per chunk (~70 ms on this relay) — a measured NEGATIVE in
    most ordinary regimes (docs/HYBRID_BENCH_R3.json best_vs_best), but
    a measured 1.35x WIN when the batch contains members that NEVER
    converge (islanded N-1 variants, eval/contingency.py): lock-step
    would spin the whole batch to max_iter on their account, the exit
    quarantines them into a small sub-batch. "iterations" then reports
    k1 + the sub-batch's count (an upper bound on any grid's sequential
    depth).

    warm_start: optional (v (S, N), theta_rad (S, N)) initial guess — e.g.
    a GNS prediction (eval/hybrid.py). Only the free unknowns are seeded:
    |v| at PQ buses and angles at PV+PQ buses; PV-bus magnitudes stay at
    their set-points and the slack stays at the case's (input) Va, exactly
    like the flat start. The solved fixed point is unchanged (Newton's
    root does not depend on the start); only the iteration count does.

    tol default 3e-5: safely above the float32 mismatch floor (~1e-5 on
    the largest cases) so solvable grids are not flagged non-converged by
    rounding, while Newton's quadratic convergence means the accepted
    iterate is the same one a 1e-5 gate would accept (the last step drops
    the mismatch from ~1e-3 straight to the floor) — v agreement with the
    float64 oracle stays ~1e-6 p.u. (tested).

    mesh: optional jax.sharding.Mesh with a "dp" axis — shards each
    chunk's batch axis across the mesh (parallel/solver_dp.py): the SAME
    jitted core compiles to an SPMD program solving S/n_dp grids per
    device, with the only collective being the while_loop's
    "all converged" all-reduce. Identical fixed points to the unsharded
    run (tests/test_solver_dp.py); chunks are padded to a dp multiple by
    repeating the last grid and trimmed after the fetch. The compaction
    sub-batch re-solve (compact_after) stays unsharded — it is by
    construction a small straggler set.
    """
    from gns_tpu.parallel.solver_dp import (
        pad_rows,
        padded_rows,
        put_dp,
        put_repl,
    )

    compact_after = resolve_compact_after(compact_after)
    # Two-phase over chunks: dispatch everything asynchronously first,
    # fetch afterwards — chunk i+1's host packing and device solve overlap
    # chunk i's (each fetch is a blocking relay round trip).
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
        core = _nr_core(f, t, (bus.shape, branch.shape), has_status)
        k1 = compact_after if 0 < compact_after < max_iter else max_iter
        dev = core(
            put_dp(mesh, bus.astype(np.float32)),
            put_dp(mesh, branch.astype(np.float32)),
            put_dp(mesh, base.astype(np.float32)),
            put_dp(mesh, p_sched), put_dp(mesh, q_sched),
            put_dp(mesh, vm0), put_dp(mesh, va0),
            put_repl(mesh, jnp.asarray(ns.pvpq)),
            put_repl(mesh, jnp.asarray(ns.pq)), tol,
            jnp.asarray(k1, jnp.int32),
        )
        pending.append((dev, k, bus, branch, base, ns, f, t, has_status, k1))

    vms, vas, convs, its, itgs, fms = [], [], [], [], [], []
    for dev, k, bus, branch, base, ns, f, t, has_status, k1 in pending:
        n = bus.shape[1]
        packed = np.array(dev)[:k]
        it_chunk = int(packed[0, 2 * n + 1])
        bad = np.flatnonzero(packed[:, 2 * n] < 0.5)
        if k1 < max_iter and bad.size:
            # Per-grid convergence exit: the lock-step while_loop is gated
            # by the WORST grid in the chunk — after k1 iterations the
            # converged majority stops paying Jacobian builds; the
            # stragglers are repacked into a power-of-2 sub-batch (bounded
            # program-shape count) and continue from their CURRENT
            # iterates with the remaining budget. One extra fetch + one
            # extra dispatch round trip — worth it when a full-batch
            # iteration costs more than that (the large cases).
            sub = max(8, 1 << int(np.ceil(np.log2(bad.size))))
            sel = np.concatenate([bad, np.repeat(bad[:1], sub - bad.size)])
            core2 = _nr_core(
                f, t, ((sub,) + bus.shape[1:], (sub,) + branch.shape[1:]),
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
        vms.append(packed[:, :n])
        vas.append(packed[:, n:2 * n])
        convs.append(packed[:, 2 * n] > 0.5)
        its.append(it_chunk)
        itgs.append(packed[:, 2 * n + 2].astype(np.int32))
        fms.append(packed[:, 2 * n + 3])
    conv_all = np.concatenate(convs)
    mismatch = np.concatenate(fms).astype(np.float32)
    return {
        "v": np.concatenate(vms).astype(np.float32),
        "theta_deg": np.rad2deg(np.concatenate(vas)).astype(np.float32),
        "converged": conv_all,
        "iterations": max(its),
        # per-chunk counts so callers (bench_hybrid, hybrid_solve) can
        # audit where the lock-step while_loop spent its iterations
        "iterations_per_chunk": its,
        # iteration at which each grid individually met tol
        "iterations_per_grid": np.concatenate(itgs),
        # each grid's final max |f| (p.u.) — lets callers separate
        # tol-converged grids from stall-accepted ones ("stalled" below)
        "mismatch": mismatch,
        "stalled": conv_all & (mismatch >= tol),
    }
