"""Batched Newton-Raphson AC power flow on the accelerator.

The reference's oracle solves grids ONE AT A TIME with pypower's runpf
(reference: GNS/evaluate.py:25-40, ~ms per grid on CPU, sequential loop over
1024 grids). Augmented grids of one case share their topology (bus types,
branch endpoints — the augmentation perturbs only electrical parameters,
GNS/augment_grids.py:28-54), so the whole evaluation set can be solved as a
single batched program: dense per-grid Ybus, batched polar Jacobian, and a
batched LU solve (`jnp.linalg.solve`) that maps onto the MXU — thousands of
Newton solves per dispatch instead of one.

Numerics: the device solve runs in float32/complex64 (TPU-native); the
attainable mismatch floor is ~1e-5 p.u. (vs the scipy float64 oracle's
1e-8), which is 2-3 orders below the GNS model errors this oracle measures.
For parity-grade ground truth keep `eval.newton_raphson` (scipy, float64);
this module is the throughput path: fast evaluation sweeps, dataset
feasibility filtering, and a standalone batched solver.

Shapes are static per (case, batch-size): jit compiles once per bucket.
"""

from __future__ import annotations

from functools import partial
from typing import Dict, List, NamedTuple

import numpy as np

import jax
import jax.numpy as jnp


class NRBatch(NamedTuple):
    """Host-prepared batched NR problem (one shared-topology case set)."""

    ybus: np.ndarray  # (S, N, N) complex64 dense bus admittance
    sbus: np.ndarray  # (S, N) complex64 scheduled net injections, p.u.
    vm0: np.ndarray  # (S, N) float32 initial |v| (gen buses at vg)
    va0: np.ndarray  # (S, N) float32 initial angle, radians
    pvpq: np.ndarray  # (M1,) int32 PV+PQ bus indices (shared across batch)
    pq: np.ndarray  # (M2,) int32 PQ bus indices


def build_nr_batch(cases: List[Dict]) -> NRBatch:
    """Pack pypower-style case dicts into one batched problem.

    All cases must share bus types and branch endpoints (true for any
    augmented set of one base case). Raises if they do not.
    """
    from gns_tpu.eval.newton_raphson import make_ybus

    bus0 = np.asarray(cases[0]["bus"], np.float64)
    types = bus0[:, 1].astype(int)
    pv = np.flatnonzero(types == 2)
    pq = np.flatnonzero(types == 1)
    pvpq = np.concatenate([pv, pq]).astype(np.int32)

    n = bus0.shape[0]
    s = len(cases)
    ybus = np.empty((s, n, n), np.complex64)
    sbus = np.empty((s, n), np.complex64)
    vm0 = np.empty((s, n), np.float32)
    va0 = np.empty((s, n), np.float32)
    for i, case in enumerate(cases):
        bus = np.asarray(case["bus"], np.float64)
        gen = np.asarray(case["gen"], np.float64)
        if not np.array_equal(bus[:, 1].astype(int), types):
            raise ValueError("batched NR requires identical bus types")
        yb, bus_index, _ = make_ybus(case)
        ybus[i] = yb.toarray()
        gstat = gen[:, 7] if gen.shape[1] > 7 else np.ones(gen.shape[0])
        gbus = np.array([bus_index[int(x)] for x in gen[:, 0]])
        pg = np.zeros(n)
        qg = np.zeros(n)
        np.add.at(pg, gbus, gen[:, 1] * gstat)
        np.add.at(qg, gbus, gen[:, 2] * gstat)
        base = case["baseMVA"]
        sbus[i] = ((pg - bus[:, 2]) + 1j * (qg - bus[:, 3])) / base
        vm = bus[:, 7].copy()
        vm[gbus[gstat > 0]] = gen[gstat > 0, 5]
        vm0[i] = vm
        va0[i] = np.deg2rad(bus[:, 8])
    return NRBatch(ybus, sbus, vm0, va0, pvpq, pq.astype(np.int32))


@partial(jax.jit, static_argnames=("max_iter",))
def _nr_solve(ybus, sbus, vm0, va0, pvpq, pq, tol: float = 1e-5,
              max_iter: int = 20):
    """Batched full-Newton polar power flow. Returns (vm, va, conv, iters)."""
    n_pvpq = pvpq.shape[0]

    def mismatch(vm, va):
        v = vm * jnp.exp(1j * va)
        i_bus = jnp.einsum("snm,sm->sn", ybus, v)
        mis = v * jnp.conj(i_bus) - sbus
        f = jnp.concatenate(
            [jnp.real(mis[:, pvpq]), jnp.imag(mis[:, pq])], axis=1
        )
        return f, v, i_bus

    def cond(state):
        vm, va, conv, it = state
        return jnp.logical_and(it < max_iter, ~jnp.all(conv))

    def body(state):
        vm, va, conv, it = state
        f, v, i_bus = mismatch(vm, va)

        # Polar Jacobian, dense batched (pypower dSbus_dV identities):
        #   dS/dVa = j V (conj(diag(I) - Ybus diag(V)))
        #   dS/dVm = diag(V) conj(Ybus diag(Vnorm)) + conj(diag(I)) diag(Vnorm)
        vnorm = v / jnp.maximum(vm, 1e-12)
        yv = ybus * v[:, None, :]  # (S,N,N): Y_mk V_k
        ds_dva = 1j * v[:, :, None] * jnp.conj(
            jnp.eye(v.shape[1], dtype=v.dtype) * i_bus[:, :, None] - yv
        )
        yvn = ybus * vnorm[:, None, :]
        ds_dvm = v[:, :, None] * jnp.conj(yvn)
        diag_term = jnp.conj(i_bus) * vnorm
        ds_dvm = ds_dvm + jnp.eye(v.shape[1], dtype=v.dtype) * diag_term[:, :, None]

        j11 = jnp.real(ds_dva[:, pvpq][:, :, pvpq])
        j12 = jnp.real(ds_dvm[:, pvpq][:, :, pq])
        j21 = jnp.imag(ds_dva[:, pq][:, :, pvpq])
        j22 = jnp.imag(ds_dvm[:, pq][:, :, pq])
        jac = jnp.concatenate(
            [
                jnp.concatenate([j11, j12], axis=2),
                jnp.concatenate([j21, j22], axis=2),
            ],
            axis=1,
        )
        dx = jnp.linalg.solve(jac, f[..., None])[..., 0]

        # frozen grids (already converged) stop moving
        upd = jnp.where(conv[:, None], 0.0, dx)
        va = va.at[:, pvpq].add(-upd[:, :n_pvpq])
        vm = vm.at[:, pq].add(-upd[:, n_pvpq:])

        f_new, _, _ = mismatch(vm, va)
        conv = jnp.logical_or(conv, jnp.max(jnp.abs(f_new), axis=1) < tol)
        return vm, va, conv, it + 1

    f0, _, _ = mismatch(vm0, va0)
    conv0 = jnp.max(jnp.abs(f0), axis=1) < tol
    it0 = jnp.asarray(0, jnp.int32)
    vm, va, conv, it = jax.lax.while_loop(cond, body, (vm0, va0, conv0, it0))
    return vm, va, conv, it


def solve_batched(
    cases: List[Dict],
    tol: float = 1e-5,
    max_iter: int = 20,
    chunk_size: int = 256,
) -> Dict:
    """Solve every case; returns {"v", "theta_deg", "converged", "iterations"}.

    Chunks the batch so the dense (chunk, N, N) Ybus stays small (case300 at
    256 grids is ~184 MB complex64). Non-converged grids keep their last
    iterate, flagged False — callers filter exactly as with the scipy oracle
    (harness.compute_metrics drops them).
    """
    vms, vas, convs, its = [], [], [], []
    for lo in range(0, len(cases), chunk_size):
        nb = build_nr_batch(cases[lo:lo + chunk_size])
        vm, va, conv, it = _nr_solve(
            jnp.asarray(nb.ybus), jnp.asarray(nb.sbus), jnp.asarray(nb.vm0),
            jnp.asarray(nb.va0), jnp.asarray(nb.pvpq), jnp.asarray(nb.pq),
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
    }
