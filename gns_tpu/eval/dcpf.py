"""Batched DC power flow on the accelerator.

The linearized (DC) approximation — flat voltage magnitudes, small
angles, lossless branches — reduces power flow to ONE batched linear
solve: B_dc theta = P. It is the industry-standard screening tier below
the exact solvers (`nr_batched`, `fdpf`), and the natural third rung of
the framework's solver ladder:

    GNS forward      ~us/grid   learned approximation
    DC power flow    one solve  linear approximation (this module)
    fast-decoupled   matvec loop  exact
    full Newton      LU loop      exact

MATPOWER/pypower `makeBdc` conventions: per-branch susceptance
b = status / (x * tau) (resistance and charging ignored), phase-shift
injections Pf_inj = -b * shift moved to the bus side, bus-shunt Gs
consumed at flat voltage. Everything assembles ON DEVICE from the raw
float32 case stacks (cf. nr_batched._assemble_gb's rationale: the relay
host boundary is ~17 MB/s) and solves via the native batched
LU + triangular-solve primitives. One packed output -> one fetch.

The DC solution is approximate BY DESIGN (no |v|, no losses, no
reactive flows) — typical transmission-grid angle errors are a few
degrees and branch-flow errors a few percent; callers needing exact
states use `solve_ac`. Returns per-branch MW flows, the quantity DC
screening ranks on (see eval/contingency.py's LODF ranking).

The reference has nothing at this tier (its evaluate.py calls pypower's
AC runpf per grid, GNS/evaluate.py:25-40).
"""

from __future__ import annotations

from typing import Dict, List

import numpy as np

import jax
import jax.numpy as jnp

from gns_tpu.eval.nr_batched import _cache_put, stack_cases

_DC_CACHE: Dict[tuple, object] = {}


def _dc_core(f: np.ndarray, t: np.ndarray, shapes: tuple,
             has_status: bool, slack: int, nonslack: np.ndarray):
    key = (f.tobytes(), t.tobytes(), shapes, has_status, slack,
           nonslack.tobytes())
    fn = _DC_CACHE.get(key)
    if fn is not None:
        return fn
    fj = jnp.asarray(f)
    tj = jnp.asarray(t)
    ns = jnp.asarray(nonslack)
    n = shapes[0][1]

    def run(bus, branch, gen, base, p_sched):
        s = bus.shape[0]
        x = branch[:, :, 3]
        status = branch[:, :, 10] if has_status else jnp.ones_like(x)
        tau = jnp.where(branch[:, :, 8] == 0, 1.0, branch[:, :, 8])
        b = status / (x * tau)  # (S, E) series susceptance, 1/(x*tau)
        shift = jnp.deg2rad(branch[:, :, 9])

        bmat = jnp.zeros((s, n, n), jnp.float32)
        bmat = bmat.at[:, fj, tj].add(-b)
        bmat = bmat.at[:, tj, fj].add(-b)
        bmat = bmat.at[:, fj, fj].add(b)
        bmat = bmat.at[:, tj, tj].add(b)

        # phase-shift injections (makeBdc): Pf_inj = -b * shift at the
        # from bus, +b * shift at the to bus; bus Gs consumed at |v|=1
        p_inj = jnp.zeros((s, n), jnp.float32)
        p_inj = p_inj.at[:, fj].add(-b * shift)
        p_inj = p_inj.at[:, tj].add(b * shift)
        rhs = (p_sched - p_inj - bus[:, :, 4] / base[:, None])[:, ns]

        bred = bmat[:, ns][:, :, ns]
        lu, _, perm = jax.lax.linalg.lu(bred)
        r = jnp.take_along_axis(rhs, perm, axis=1)[..., None]
        y = jax.lax.linalg.triangular_solve(
            lu, r, left_side=True, lower=True, unit_diagonal=True
        )
        th_ns = jax.lax.linalg.triangular_solve(
            lu, y, left_side=True, lower=False
        )[..., 0]
        theta = jnp.zeros((s, n), jnp.float32).at[:, ns].set(th_ns)
        # slack keeps the case's reference angle; shift everything
        va_slack = jnp.deg2rad(bus[:, slack, 8])
        theta = theta + va_slack[:, None]
        # per-branch DC flow, from-side MW: b * (th_f - th_t - shift)
        pf = b * (theta[:, fj] - theta[:, tj] - shift) * base[:, None]
        return jnp.concatenate([theta, pf], axis=1)

    fn = jax.jit(run)
    _cache_put(_DC_CACHE, key, fn)
    return fn


def solve_batched_dc(cases: List[Dict], chunk_size: int = 1024,
                     mesh=None) -> Dict:
    """DC power flow for a shared-topology case list, one batched solve.

    Returns {"theta_deg" (S, N), "pf_mw" (S, E) from-side branch flows,
    "p_slack_mw" (S,) slack injection}. No iteration, no convergence
    question (the linear system is singular only for islanded grids,
    which surface as non-finite angles — check np.isfinite if the input
    may contain islands). Magnitudes are the DC assumption's flat
    profile; use solve_ac for exact states.

    mesh: optional Mesh with a "dp" axis — shard each chunk's batch axis
    across devices (parallel/solver_dp.py; the batched linear solves are
    per-grid, so the SPMD program needs no collectives at all).
    """
    from gns_tpu.parallel.solver_dp import pad_rows, padded_rows, put_dp

    outs_th, outs_pf, outs_sl = [], [], []
    for lo in range(0, len(cases), chunk_size):
        bus, branch, gen, base = stack_cases(cases[lo:lo + chunk_size])
        k = bus.shape[0]
        if mesh is not None:
            target = padded_rows(k, mesh)
            bus, branch, gen, base = (
                pad_rows(a, target) for a in (bus, branch, gen, base)
            )
        s, n = bus.shape[:2]
        types = bus[0, :, 1].astype(int)
        slack = int(np.flatnonzero(types == 3)[0])
        nonslack = np.flatnonzero(types != 3).astype(np.int32)
        gen0 = gen[0]
        ng = gen.shape[1]
        gbus = gen0[:, 0].astype(np.int64) - 1
        gstat = gen[:, :, 7] if gen0.shape[1] > 7 else np.ones((s, ng))
        pg = np.zeros((s, n))
        np.add.at(pg, (slice(None), gbus), gen[:, :, 1] * gstat)
        p_sched = ((pg - bus[:, :, 2]) / base[:, None]).astype(np.float32)

        f = branch[0, :, 0].astype(np.int32) - 1
        t = branch[0, :, 1].astype(np.int32) - 1
        has_status = branch.shape[2] > 10
        core = _dc_core(f, t, (bus.shape, branch.shape), has_status,
                        slack, nonslack)
        packed = np.asarray(core(
            put_dp(mesh, bus.astype(np.float32)),
            put_dp(mesh, branch.astype(np.float32)),
            put_dp(mesh, gen.astype(np.float32)),
            put_dp(mesh, base.astype(np.float32)),
            put_dp(mesh, p_sched),
        ))[:k]
        theta = packed[:, :n]
        pf = packed[:, n:]
        # slack balances the (lossless) system: its injection is total
        # load minus the other generators, recovered from the flows
        inc = np.zeros((n, len(f)), np.float32)
        np.add.at(inc, (f, np.arange(len(f))), 1.0)
        np.add.at(inc, (t, np.arange(len(t))), -1.0)
        p_slack = (pf @ inc[slack]) + bus[:k, slack, 2] + bus[:k, slack, 4]
        outs_th.append(np.rad2deg(theta))
        outs_pf.append(pf)
        outs_sl.append(p_slack)
    return {
        "theta_deg": np.concatenate(outs_th).astype(np.float32),
        "pf_mw": np.concatenate(outs_pf).astype(np.float32),
        "p_slack_mw": np.concatenate(outs_sl).astype(np.float32),
    }


def lodf_matrix(case: Dict):
    """Line Outage Distribution Factors of `case` (numpy, float64).

    The classical linear screening operator: post-outage DC flow on
    branch l when branch k trips is f_l + LODF[l, k] * f_k — every
    branch outage's full flow redistribution from ONE factorization,
    zero additional solves. Built from the injection-shift (PTDF)
    matrix: S = B_f * inv(B_bus) (slack column zero),
    PTDF_br[l, k] = S[l, f_k] - S[l, t_k],
    LODF[l, k] = PTDF_br[l, k] / (1 - PTDF_br[k, k]), LODF[k, k] = -1.
    A bridge branch has PTDF_br[k, k] -> 1: its column is returned as
    +/-inf — islanding, exactly what `contingency.find_bridges` flags
    structurally.
    """
    bus = np.asarray(case["bus"], np.float64)
    br = np.asarray(case["branch"], np.float64)
    n, e = bus.shape[0], br.shape[0]
    f = br[:, 0].astype(np.int64) - 1
    t = br[:, 1].astype(np.int64) - 1
    status = br[:, 10] if br.shape[1] > 10 else np.ones(e)
    tau = np.where(br[:, 8] == 0, 1.0, br[:, 8])
    b = status / (br[:, 3] * tau)
    types = bus[:, 1].astype(int)
    ns = np.flatnonzero(types != 3)

    bbus = np.zeros((n, n))
    np.add.at(bbus, (f, t), -b)
    np.add.at(bbus, (t, f), -b)
    np.add.at(bbus, (f, f), b)
    np.add.at(bbus, (t, t), b)
    bf = np.zeros((e, n))
    bf[np.arange(e), f] += b
    bf[np.arange(e), t] -= b

    s = np.zeros((e, n))
    s[:, ns] = np.linalg.solve(bbus[np.ix_(ns, ns)].T, bf[:, ns].T).T
    ptdf_br = s[:, f] - s[:, t]  # (E, E)
    denom = 1.0 - np.diag(ptdf_br)
    # Islanding authority is the STRUCTURAL bridge set (Tarjan; the same
    # one the screens use), not the numeric |1 - self-PTDF| residual: a
    # legitimately near-radial but non-bridge branch (e.g. paralleled by
    # a very high-impedance path) has self-PTDF ~ 1 without islanding,
    # and flagging it would report +inf severity for a solvable outage.
    # The numeric test stays as a sanity check — a structural bridge's
    # self-PTDF must be 1 up to float64 rounding (measured ~1e-7 on
    # case118's radial spurs; tests/test_dcpf.py asserts set equality on
    # the shipped tables).
    from gns_tpu.eval.contingency import find_bridges

    bridge = np.zeros(e, bool)
    bridge[find_bridges(case)] = True
    near_one = np.abs(denom) < 1e-6
    if (bridge & ~near_one).any():
        raise AssertionError(
            "structural bridge with self-PTDF far from 1 — inconsistent "
            f"branch data? rows {np.flatnonzero(bridge & ~near_one)}"
        )
    with np.errstate(divide="ignore", invalid="ignore"):
        lodf = ptdf_br / np.where(bridge, 0.0, denom)[None, :]
    lodf[:, bridge] = np.inf
    lodf[np.arange(e), np.arange(e)] = -1.0
    return lodf


def dc_outage_severity(case: Dict) -> Dict[str, np.ndarray]:
    """Classical DC screening scores for every single-branch outage.

    One DC base solve + the LODF closed form gives every outage's full
    post-contingency flow pattern; severity scores (per branch outage,
    +inf for bridges):
      "max_shift_mw"  — largest absolute flow change on any surviving
                        branch (how hard the outage redistributes),
      "overload_mw"   — largest post-outage loading above rateA (0 when
                        the table carries no rates — the shipped IEEE
                        tables mostly do not, which is exactly why a
                        voltage-blind DC screen underranks there; see
                        docs/N1_SCREEN.md round-4b).
    """
    dc = solve_batched_dc([case])
    f0 = dc["pf_mw"][0].astype(np.float64)
    lodf = lodf_matrix(case)
    e = f0.shape[0]
    with np.errstate(invalid="ignore"):
        post = f0[:, None] + lodf * f0[None, :]  # post[l, k]
    post[np.arange(e), np.arange(e)] = 0.0
    shift = np.abs(post - f0[:, None])
    shift[np.arange(e), np.arange(e)] = 0.0
    max_shift = shift.max(axis=0)
    br = np.asarray(case["branch"], np.float64)
    rate = br[:, 5] if br.shape[1] > 5 else np.zeros(e)
    rated = rate > 0
    overload = np.zeros(e)
    if rated.any():
        overload = np.maximum(
            np.abs(post[rated]) - rate[rated, None], 0.0
        ).max(axis=0)
    bridges = ~np.isfinite(lodf).all(axis=0)
    max_shift[bridges] = np.inf
    overload[bridges] = np.inf
    return {"max_shift_mw": max_shift, "overload_mw": overload,
            "islanded": bridges}
