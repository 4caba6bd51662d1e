"""Batched Newton-Raphson AC power flow on the accelerator.

The reference's oracle solves grids ONE AT A TIME with pypower's runpf
(reference: GNS/evaluate.py:25-40, ~ms per grid on CPU, sequential loop over
1024 grids). Augmented grids of one case share their topology (bus types,
branch endpoints — the augmentation perturbs only electrical parameters,
GNS/augment_grids.py:28-54), so the whole evaluation set can be solved as a
single batched program: dense per-grid G/B admittance matrices, the batched
polar Jacobian in its real H/N/J/L block form, and a batched LU solve —
thousands of Newton solves per dispatch instead of one.

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

from functools import partial
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


@partial(jax.jit, static_argnames=("max_iter",))
def _nr_solve(gmat, bmat, p_sched, q_sched, vm0, va0, pvpq, pq,
              tol: float = 3e-5, max_iter: int = 20):
    """Batched full-Newton polar power flow, real arithmetic + LU solve.

    Returns (vm, va, conv, iters)."""
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
        vm, va, conv, it = state
        return jnp.logical_and(it < max_iter, ~jnp.all(conv))

    def body(state):
        vm, va, conv, it = state
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
        conv = jnp.logical_or(
            conv, jnp.max(jnp.abs(f_of(p, q)), axis=1) < tol
        )
        return vm, va, conv, it + 1

    _, _, p0, q0 = trig_terms(vm0, va0)
    conv0 = jnp.max(jnp.abs(f_of(p0, q0)), axis=1) < tol
    it0 = jnp.asarray(0, jnp.int32)
    vm, va, conv, it = jax.lax.while_loop(cond, body, (vm0, va0, conv0, it0))
    return vm, va, conv, it


def solve_batched(
    cases: List[Dict],
    tol: float = 3e-5,
    max_iter: int = 20,
    chunk_size: int = 256,
    warm_start=None,
) -> Dict:
    """Solve every case; returns {"v", "theta_deg", "converged", "iterations"}.

    Chunks the batch so the dense (chunk, N, N) G/B matrices stay small
    (case300 at 256 grids is ~184 MB). Non-converged grids keep their last
    iterate, flagged False — callers filter exactly as with the scipy oracle
    (harness.compute_metrics drops them).

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
    """
    vms, vas, convs, its = [], [], [], []
    for lo in range(0, len(cases), chunk_size):
        nb = build_nr_batch(cases[lo:lo + chunk_size])
        if warm_start is not None:
            wv = np.asarray(warm_start[0][lo:lo + chunk_size], np.float32)
            wth = np.asarray(warm_start[1][lo:lo + chunk_size], np.float32)
            vm0, va0 = nb.vm0.copy(), nb.va0.copy()
            vm0[:, nb.pq] = wv[:, nb.pq]
            va0[:, nb.pvpq] = wth[:, nb.pvpq]
            nb = nb._replace(vm0=vm0, va0=va0)
        vm, va, conv, it = _nr_solve(
            jnp.asarray(nb.gmat), jnp.asarray(nb.bmat),
            jnp.asarray(nb.p_sched), jnp.asarray(nb.q_sched),
            jnp.asarray(nb.vm0), jnp.asarray(nb.va0),
            jnp.asarray(nb.pvpq), jnp.asarray(nb.pq),
            tol=tol, max_iter=max_iter,
        )
        vms.append(np.asarray(vm))
        vas.append(np.asarray(va))
        convs.append(np.asarray(conv))
        its.append(int(it))
    return {
        "v": np.concatenate(vms).astype(np.float32),
        "theta_deg": np.rad2deg(np.concatenate(vas)).astype(np.float32),
        "converged": np.concatenate(convs),
        "iterations": max(its),
        # per-chunk counts so callers (bench_hybrid, hybrid_solve) can
        # audit where the lock-step while_loop spent its iterations
        "iterations_per_chunk": its,
    }
