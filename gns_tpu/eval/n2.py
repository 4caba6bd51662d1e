"""N-2 (double branch outage) screening — device-built variants.

The N-1 screen materializes each variant as a case dict (fine for C ~ E
contingencies). An N-2 screen is C(E, 2) pairs — 17,205 for the
authentic case118 — and at that scale the host-side variant stacks
become the bottleneck: ~300 MB of branch tables whose rows differ from
the base case ONLY in two status zeros, shipped over a ~17 MB/s relay.

The TPU-native design ships the base case ONCE plus an (S, 2) int32
outage-pair array per chunk, and builds every variant INSIDE the jitted
program: broadcast the base branch table to (S, E, C) and scatter zeros
into the status column at the two outaged rows. Everything downstream —
B'/B'' assembly, the fast-decoupled or Newton while_loop, the packed
single-fetch output — is exactly the shared solver machinery
(eval/fdpf.py, eval/nr_batched.py). Per-chunk host->device traffic
drops from ~20 MB to ~8 KB.

Structural islanding is EXACT at N-2 too, on the host, for free:
pair (a, b) islands the network iff a is a bridge of the base graph, b
is a bridge of the base graph, or b is a bridge of the graph with a
removed — E runs of the O(N+E) Tarjan search (`n2_islanding_pairs`),
milliseconds at case118 scale. The full screen needs no pre-filter
(islanded pairs report non-converged exactly like N-1), but the ranked
screen uses the structural set to skip verification of hopeless pairs,
and the experiment uses it to cross-check the solver's verdicts.

The reference has no contingency surface at all (its evaluate.py
re-solves base grids one at a time, GNS/evaluate.py:25-40).

Usage:
    from gns_tpu.eval.n2 import n2_pairs, screen_n2, screen_n2_ranked
    pairs = n2_pairs(case)                      # all C(E,2) pairs
    rep = screen_n2(case, pairs)                # full exact screen
    rep = screen_n2_ranked(case, params, cfg, pairs, top_k=256)
"""

from __future__ import annotations

from typing import Dict, Optional

import numpy as np

import jax
import jax.numpy as jnp

from gns_tpu.eval.nr_batched import (
    _cache_put,
    _nr_solve,
    _pack_solution,
    build_nr_small_stacked,
    stack_cases,
)
from gns_tpu.utils.config import GNSConfig

_N2_CACHE: Dict[tuple, object] = {}


def n2_pairs(case: Dict, in_service_only: bool = True) -> np.ndarray:
    """All unordered branch index pairs (P, 2) int32 of `case`
    (C(E, 2); pairs involving out-of-service branches dropped unless
    in_service_only=False — outaging a dead branch is a no-op)."""
    br = np.asarray(case["branch"], np.float64)
    e = br.shape[0]
    rows = np.arange(e)
    if in_service_only and br.shape[1] > 10:
        rows = rows[br[:, 10] > 0]
    a, b = np.triu_indices(rows.size, k=1)
    return np.stack([rows[a], rows[b]], axis=1).astype(np.int32)


def n2_islanding_pairs(case: Dict,
                       pairs: Optional[np.ndarray] = None) -> np.ndarray:
    """(P,) bool aligned with `pairs` (default n2_pairs(case)): True
    where the pair STRUCTURALLY islands the network. Exact, host-side,
    <= E Tarjan runs: (a, b) islands iff a or b is a base-graph bridge,
    or b bridges the graph with a removed (computed once per distinct a).

    Note this is the STRUCTURAL verdict, which can differ from solver
    convergence on one degenerate class: an island whose injections
    balance exactly (e.g. case14 pair (4-7, 7-9): buses {7, 8} island
    with zero load and a Pg=0 condenser) has zero mismatch at an
    indeterminate angle — Newton may report it "converged" at a
    singular Jacobian while fast-decoupled NaNs. The screens report
    BOTH signals; "worst" unions them.
    """
    from gns_tpu.eval.contingency import find_bridges

    if pairs is None:
        pairs = n2_pairs(case)
    pairs = np.asarray(pairs, np.int64)
    base_bridges = set(find_bridges(case).tolist())
    br = np.asarray(case["branch"], np.float64)
    # bridges of G - a, for every distinct first element (reuse
    # find_bridges on a status-masked copy; O(E * (N + E)) total —
    # milliseconds at E=186)
    cond_bridges = {}
    for a in np.unique(pairs[:, 0]):
        a = int(a)
        if a in base_bridges:
            continue  # already islanding alone
        va = dict(case)
        vb = br.copy()
        vb[a, 10] = 0.0
        va["branch"] = vb
        cond_bridges[a] = set(find_bridges(va).tolist())
    out = np.zeros(pairs.shape[0], bool)
    for i, (a, b) in enumerate(pairs):
        a, b = int(a), int(b)
        if a in base_bridges or b in base_bridges:
            out[i] = True
        else:
            out[i] = b in cond_bridges[a]
    return out


def n2_branch_loading(case: Dict, pairs: np.ndarray, v: np.ndarray,
                      theta_deg: np.ndarray,
                      chunk: int = 4096) -> np.ndarray:
    """(P, E) max(|S_f|, |S_t|) MVA loadings at N-2 solved states.

    The N-2 twin of `contingency.ac_branch_loading`, without
    materializing per-variant branch tables: the base case's complex
    branch admittances are computed once and the two outaged rows are
    zeroed per pair (an outage only changes the status factor). NaN
    states (non-converged pairs) propagate NaN.
    """
    br = np.asarray(case["branch"], np.float64)
    e = br.shape[0]
    f = br[:, 0].astype(np.int64) - 1
    t = br[:, 1].astype(np.int64) - 1
    status = br[:, 10] if br.shape[1] > 10 else np.ones(e)
    ys = status / (br[:, 2] + 1j * br[:, 3])
    bc = status * br[:, 4]
    tap = np.where(br[:, 8] == 0, 1.0, br[:, 8]) * np.exp(
        1j * np.deg2rad(br[:, 9])
    )
    ytt = ys + 1j * bc / 2.0
    yff = ytt / (tap * np.conj(tap))
    yft = -ys / np.conj(tap)
    ytf = -ys / tap
    base = float(case["baseMVA"])

    p = pairs.shape[0]
    out = np.empty((p, e), np.float64)
    for lo in range(0, p, chunk):
        pr = pairs[lo:lo + chunk]
        k = pr.shape[0]
        rows = np.arange(k)[:, None]
        live = np.ones((k, e), np.float64)
        live[rows, pr] = 0.0  # the per-pair status zeros
        vc = v[lo:lo + chunk].astype(np.float64) * np.exp(
            1j * np.deg2rad(theta_deg[lo:lo + chunk].astype(np.float64))
        )
        vf, vt = vc[:, f], vc[:, t]
        sf = vf * np.conj(live * (yff[None] * vf + yft[None] * vt))
        st = vt * np.conj(live * (ytf[None] * vf + ytt[None] * vt))
        out[lo:lo + chunk] = np.maximum(np.abs(sf), np.abs(st)) * base
    return out


def _n2_core(f: np.ndarray, t: np.ndarray, shapes: tuple,
             has_status: bool, method: str, n_pairs_axis: int):
    """Jitted N-2 core: (base bus/branch/..., pairs (S, 2)) -> packed
    solutions. The (S, E, C) variant branch stack is built in-program:
    broadcast + scatter status zeros at the two outaged rows."""
    key = ("n2", f.tobytes(), t.tobytes(), shapes, has_status, method,
           n_pairs_axis)
    fn = _N2_CACHE.get(key)
    if fn is not None:
        return fn
    fj = jnp.asarray(f)
    tj = jnp.asarray(t)
    n = shapes[0][0]
    e = shapes[1][0]
    if method == "fdpf":
        inc_f = jax.nn.one_hot(fj, n, dtype=jnp.float32).T
        inc_t = jax.nn.one_hot(tj, n, dtype=jnp.float32).T

    def run(bus, branch, base, p_sched, q_sched, vm0, va0, pvpq, pq,
            pairs, tol, max_iter):
        s = pairs.shape[0]
        # device-built variants: broadcast the base branch table and
        # zero the status column at the outaged rows (status col 10 —
        # the N-1 variant semantics, eval/contingency.n1_variants)
        branch_s = jnp.broadcast_to(branch, (s, e, branch.shape[1]))
        rows = jnp.arange(s)
        branch_s = branch_s.at[rows[:, None], pairs, 10].set(0.0)
        bus_s = jnp.broadcast_to(bus, (s, n, bus.shape[1]))
        base_s = jnp.broadcast_to(base, (s,))
        p_s = jnp.broadcast_to(p_sched, (s, n))
        q_s = jnp.broadcast_to(q_sched, (s, n))
        vm_s = jnp.broadcast_to(vm0, (s, n))
        va_s = jnp.broadcast_to(va0, (s, n))
        if method == "fdpf":
            from gns_tpu.eval.fdpf import (
                _batched_inverse,
                _branch_parts,
                _build_b_matrices,
                _fdpf_solve,
                _make_injections,
            )

            bp, bpp = _build_b_matrices(
                bus_s, branch_s, base_s, fj, tj, has_status, "XB"
            )
            bp_inv = _batched_inverse(bp[:, pvpq][:, :, pvpq])
            bpp_inv = _batched_inverse(bpp[:, pq][:, :, pq])
            parts = _branch_parts(bus_s, branch_s, base_s, has_status)
            injections = _make_injections(parts, inc_f, inc_t, fj, tj)
            vm, va, conv, it, itg, fmax = _fdpf_solve(
                injections, bp_inv, bpp_inv, p_s, q_s, vm_s, va_s,
                pvpq, pq, tol, max_iter,
            )
        else:
            from gns_tpu.eval.nr_batched import _assemble_gb

            gmat, bmat = _assemble_gb(bus_s, branch_s, base_s, fj, tj,
                                      has_status)
            vm, va, conv, it, itg, fmax = _nr_solve(
                gmat, bmat, p_s, q_s, vm_s, va_s, pvpq, pq,
                tol=tol, max_iter=max_iter,
            )
        return _pack_solution(vm, va, conv, it, itg, fmax)

    fn = jax.jit(run)
    _cache_put(_N2_CACHE, key, fn)
    return fn


def screen_n2(
    case: Dict,
    pairs: Optional[np.ndarray] = None,
    tol: float = 3e-5,
    max_iter: int = 20,
    fdpf_max_iter: int = 60,
    chunk_size: int = 2048,
    method: str = "auto",
    warm_start=None,
    v_limits=(0.94, 1.06),
    mesh=None,
) -> Dict:
    """Exact screen of double branch outages; variants built on device.

    pairs: (P, 2) int32 branch-row pairs (default: every in-service
    C(E, 2) pair). method "auto"/"fdpf" = the fast-decoupled loop (the
    measured-faster solver family, docs/FDPF_BENCH.json), "nr" = full
    Newton. warm_start: optional (v (P, N), theta_rad (P, N)) per-pair
    initial iterates (e.g. ranked-screen predictions) — seeded on the
    free unknowns exactly like solve_batched.

    A non-converged pair is the islanding/divergence signal, exactly as
    in screen_n1 — structurally-islanding pairs (n2_islanding_pairs)
    CANNOT converge from any start, so unlike the N-1 screen no Newton
    rescue is attempted here by default on non-structural failures;
    pass method="nr" for the most robust arm. Chunks of `chunk_size`
    pairs dispatch asynchronously and fetch once each (~8 KB up per
    chunk: the pair indices; the base case ships once per chunk shape).

    Returns {"pairs", "converged", "v", "theta_deg",
    "v_violations", "iterations_per_grid", "mismatch", "worst"}.
    """
    from gns_tpu.parallel.solver_dp import (
        pad_rows,
        padded_rows,
        put_dp,
        put_repl,
    )

    if pairs is None:
        pairs = n2_pairs(case)
    pairs = np.asarray(pairs, np.int32)
    if method == "auto":
        method = "fdpf"
    if method not in ("nr", "fdpf"):
        raise ValueError(f"method must be auto|nr|fdpf, got {method!r}")
    budget = fdpf_max_iter if method == "fdpf" else max_iter

    bus, branch, gen, base = stack_cases([case])
    ns = build_nr_small_stacked(bus, branch, gen, base)
    f = branch[0, :, 0].astype(np.int32) - 1
    t = branch[0, :, 1].astype(np.int32) - 1
    has_status = branch.shape[2] > 10
    if not has_status:
        raise ValueError("N-2 screen requires a branch status column")
    n = bus.shape[1]

    base_args = (
        jnp.asarray(bus[0], jnp.float32), jnp.asarray(branch[0], jnp.float32),
        jnp.asarray(base[0], jnp.float32),
        jnp.asarray(ns.p_sched[0]), jnp.asarray(ns.q_sched[0]),
    )
    pvpq_j = put_repl(mesh, jnp.asarray(ns.pvpq))
    pq_j = put_repl(mesh, jnp.asarray(ns.pq))
    if mesh is not None:
        base_args = tuple(put_repl(mesh, a) for a in base_args)

    pending = []
    for lo in range(0, pairs.shape[0], chunk_size):
        chunk = pairs[lo:lo + chunk_size]
        k = chunk.shape[0]
        target = chunk_size if pairs.shape[0] > chunk_size else k
        target = padded_rows(target, mesh)
        chunk = pad_rows(chunk, target)
        if warm_start is not None:
            # per-pair warm iterates break the broadcast economy; seed
            # the free unknowns host-side and ship the (S, N) arrays
            wv = pad_rows(
                np.asarray(warm_start[0][lo:lo + k], np.float32), target
            )
            wth = pad_rows(
                np.asarray(warm_start[1][lo:lo + k], np.float32), target
            )
            vm0 = np.broadcast_to(ns.vm0[0], (target, n)).copy()
            va0 = np.broadcast_to(ns.va0[0], (target, n)).copy()
            vm0[:, ns.pq] = wv[:, ns.pq]
            va0[:, ns.pvpq] = wth[:, ns.pvpq]
            vm_in = put_dp(mesh, vm0)
            va_in = put_dp(mesh, va0)
            shapes = ((n, bus.shape[2]), (branch.shape[1], branch.shape[2]),
                      "warm")
        else:
            vm_in = put_repl(mesh, jnp.asarray(ns.vm0[0]))
            va_in = put_repl(mesh, jnp.asarray(ns.va0[0]))
            shapes = ((n, bus.shape[2]), (branch.shape[1], branch.shape[2]),
                      "flat")
        core = _n2_core(f, t, shapes, has_status, method, target)
        dev = core(
            *base_args, vm_in, va_in, pvpq_j, pq_j,
            put_dp(mesh, chunk), tol, jnp.asarray(budget, jnp.int32),
        )
        pending.append((dev, k))

    vms, vas, convs, itgs, fms = [], [], [], [], []
    for dev, k in pending:
        packed = np.array(dev)[:k]
        vms.append(packed[:, :n])
        vas.append(packed[:, n:2 * n])
        convs.append(packed[:, 2 * n] > 0.5)
        itgs.append(packed[:, 2 * n + 2].astype(np.int32))
        fms.append(packed[:, 2 * n + 3])
    conv = np.concatenate(convs)
    v = np.concatenate(vms).astype(np.float32)
    theta = np.rad2deg(np.concatenate(vas)).astype(np.float32)
    v[~conv] = np.nan
    theta[~conv] = np.nan

    lo_v, hi_v = v_limits
    types = bus[0, :, 1].astype(int)
    is_pq = types == 1  # branch outages never change bus types
    with np.errstate(invalid="ignore"):
        viol = np.where(
            conv, (((v < lo_v) | (v > hi_v)) & is_pq[None, :]).sum(axis=1), 0
        ).astype(np.int32)
    # MVA-limit screening, exactly like screen_n1 (round 5): exact AC
    # loadings at the solved states vs each branch's published rateA —
    # live on the cases whose tables carry real limits (case9/case30);
    # unrated branches (incl. 9900 placeholders) never count
    rate = np.asarray(case["branch"], np.float64)[:, 5]
    rated = (rate > 0) & (rate < 9000.0)
    if rated.any():
        loading = n2_branch_loading(case, pairs, v, theta)
        with np.errstate(invalid="ignore"):
            over = rated[None, :] & (loading > rate[None, :])
            frac = np.where(rated[None, :], loading / np.where(
                rated, rate, 1.0)[None, :], 0.0)
        nan_rows = np.isnan(loading).any(axis=1)
        fl_viol = np.where(nan_rows, 0, over.sum(axis=1)).astype(np.int32)
        max_frac = np.where(nan_rows, np.nan,
                            frac.max(axis=1)).astype(np.float32)
    else:
        fl_viol = np.zeros(pairs.shape[0], np.int32)
        max_frac = np.where(conv, 0.0, np.nan).astype(np.float32)
    # structural islanding is reported alongside solver convergence:
    # the two differ exactly on balanced islands (see n2_islanding_pairs)
    islanded = n2_islanding_pairs(case, pairs)
    return {
        "pairs": pairs,
        "converged": conv,
        "islanded": islanded,
        "v": v,
        "theta_deg": theta,
        "v_violations": viol,
        "flow_violations": fl_viol,
        "max_loading_frac": max_frac,
        "iterations_per_grid": np.concatenate(itgs),
        "mismatch": np.concatenate(fms).astype(np.float32),
        "worst": np.flatnonzero(
            islanded | ~conv | (viol > 0) | (fl_viol > 0)
        ),
        "method": method,
    }


def _n2_rank_core(cfg: GNSConfig, topo_key: tuple, slack_idx: int,
                  shapes: tuple, chunk: int):
    """Jitted ranked-stage forward: base PREPARED tensors + pairs ->
    (severity, pred v, pred theta) for device-built outage-encoded
    variants. The outage encoding is the aware representation
    (r=x=1e6, b=0 — a zero in admittance space, ROADMAP #9) applied to
    the PREPARED line features (cols 2/3/4 = r/x/b, utils/prepare.py)."""
    key = ("n2rank", cfg, topo_key, slack_idx, shapes, chunk)
    fn = _N2_CACHE.get(key)
    if fn is not None:
        return fn
    from gns_tpu.models.gns import gns_forward
    from gns_tpu.utils.prepare import GridTopology

    topo = GridTopology(
        src=np.frombuffer(topo_key[0], np.int32),
        dst=np.frombuffer(topo_key[1], np.int32),
        gen_idx=np.frombuffer(topo_key[2], np.int32),
    )

    def run(params, buses, lines, gens, pairs, va_slack):
        s = pairs.shape[0]
        e = lines.shape[0]
        lines_s = jnp.broadcast_to(lines, (s, e, lines.shape[1]))
        rows = jnp.arange(s)[:, None]
        lines_s = lines_s.at[rows, pairs, 2].set(1e6)
        lines_s = lines_s.at[rows, pairs, 3].set(1e6)
        lines_s = lines_s.at[rows, pairs, 4].set(0.0)
        buses_s = jnp.broadcast_to(buses, (s,) + buses.shape)
        gens_s = jnp.broadcast_to(gens, (s,) + gens.shape)
        fwd = lambda b, l, g: gns_forward(
            params, cfg, b, l, g, method="auto", topo=topo
        )
        out = jax.vmap(fwd)(buses_s, lines_s, gens_s)
        # intact-grid prediction: the bias-cancelling severity reference
        # (cf. screen_n1_ranked stage 2)
        base_out = gns_forward(params, cfg, buses, lines, gens,
                               method="auto", topo=topo)
        sev = jnp.sqrt(((out.v - base_out.v[None, :]) ** 2).mean(axis=1))
        theta = (
            out.theta
            - out.theta[:, slack_idx:slack_idx + 1]
            + va_slack
        )
        return sev, out.v, theta

    fn = jax.jit(run)
    _cache_put(_N2_CACHE, key, fn)
    return fn


def screen_n2_ranked(
    case: Dict,
    params,
    cfg: GNSConfig,
    pairs: Optional[np.ndarray] = None,
    top_k: int = 256,
    tol: float = 3e-5,
    max_iter: int = 20,
    fdpf_max_iter: int = 60,
    chunk_size: int = 2048,
    method: str = "auto",
    v_limits=(0.94, 1.06),
    score: str = "depth",
    mesh=None,
) -> Dict:
    """Ranked N-2 screen: structural islanding exact, ONE aware forward
    per chunk over device-built variants, verify only top_k pairs.

    The solve-budget product (docs/N1_SCREEN.md round-4b'): at C(E, 2)
    scale the full exact screen solves P ~ 17k power flows; this screen
    solves `top_k` of them plus P cheap forwards, and flags every
    structurally-islanding pair exactly for free (n2_islanding_pairs).
    Requires an outage-AWARE checkpoint (GNSConfig.admittance_inputs,
    the `*-n1`/`*-deep-n1` family) — a blind model cannot rank.

    score: the severity ordering. "depth" (default) ranks by PREDICTED
    violation depth (sum over PQ buses of the predicted excursion past
    v_limits) — measured on the case118 N-2 truth set (1788 violating
    pairs of 15502): PERFECT precision at k=256 (recall 0.143 = the
    k/|truth| ceiling) with 118-deep-n1, vs 0.017 for "rms". "rms" is
    the N-1 screen's bias-cancelled deviation-from-intact score — right
    when truth is defined by CHANGE (the N-1 regime, where most
    variants violate nothing); wrong at N-2 where truth is defined by
    VIOLATION and deviation is ubiquitous. The deep checkpoint is
    load-bearing either way: the K4 aware model's error floor swamps
    both scores at N-2 (recall@256 0.011).

    Returns {"pairs", "islanded" (structural), "severity", "order",
    "verified_idx", "converged"/"v"/"theta_deg"/"v_violations" (verified
    subset; NaN/0 elsewhere), "worst", "n_solves"}.
    """
    from gns_tpu.utils.prepare import prepare_case

    if pairs is None:
        pairs = n2_pairs(case)
    pairs = np.asarray(pairs, np.int32)
    p = pairs.shape[0]

    # stage 1: exact structural islanding
    islanded = n2_islanding_pairs(case, pairs)

    # stage 2: chunked aware forwards over device-built variants
    buses, lines, gens = prepare_case(
        case, paper_shunts=not cfg.true_shunts
    )
    types = np.asarray(case["bus"])[:, 1].astype(int)
    slack_idx = int(np.flatnonzero(types == 3)[0])
    va_slack = np.deg2rad(
        np.asarray(case["bus"], np.float64)[slack_idx, 8]
    ).astype(np.float32)
    topo_key = (
        (lines[:, 0].astype(np.int32) - 1).tobytes(),
        (lines[:, 1].astype(np.int32) - 1).tobytes(),
        (gens[:, 0].astype(np.int32) - 1).tobytes(),
    )
    sev = np.zeros(p, np.float64)
    pv = np.zeros((p, buses.shape[0]), np.float32)
    pth = np.zeros((p, buses.shape[0]), np.float32)
    pend = []
    for lo in range(0, p, chunk_size):
        chunk = pairs[lo:lo + chunk_size]
        k = chunk.shape[0]
        target = chunk_size if p > chunk_size else k
        if k < target:
            chunk = np.concatenate(
                [chunk, np.repeat(chunk[-1:], target - k, 0)]
            )
        core = _n2_rank_core(
            cfg, topo_key, slack_idx,
            (buses.shape, lines.shape, gens.shape), target,
        )
        out = core(params, jnp.asarray(buses), jnp.asarray(lines),
                   jnp.asarray(gens), jnp.asarray(chunk),
                   jnp.asarray(va_slack)[None])
        pend.append((out, lo, k))
    for (s_dev, v_dev, th_dev), lo, k in pend:
        sev[lo:lo + k] = np.asarray(s_dev)[:k]
        pv[lo:lo + k] = np.asarray(v_dev)[:k]
        pth[lo:lo + k] = np.asarray(th_dev)[:k]
    if score == "depth":
        lo_v, hi_v = v_limits
        types = np.asarray(case["bus"])[:, 1].astype(int)
        is_pq = types == 1
        sev = (
            (np.maximum(lo_v - pv, 0.0) + np.maximum(pv - hi_v, 0.0))
            * is_pq[None, :]
        ).sum(axis=1).astype(np.float64)
    elif score != "rms":
        raise ValueError(f"score must be depth|rms, got {score!r}")
    sev[islanded] = np.inf
    order = np.argsort(-sev, kind="stable").astype(np.int64)

    # stage 3: verify top_k rankable pairs, warm-started by predictions
    rankable = order[~islanded[order]]
    top_k = min(top_k, rankable.size)
    verified_idx = np.sort(rankable[:top_k])
    n = buses.shape[0]
    conv = np.zeros(p, bool)
    v = np.full((p, n), np.nan, np.float32)
    theta = np.full((p, n), np.nan, np.float32)
    viol = np.zeros(p, np.int32)
    fl_viol = np.zeros(p, np.int32)
    if top_k:
        sub = screen_n2(
            case, pairs[verified_idx], tol=tol, max_iter=max_iter,
            fdpf_max_iter=fdpf_max_iter, chunk_size=chunk_size,
            method=method, v_limits=v_limits, mesh=mesh,
            warm_start=(pv[verified_idx], pth[verified_idx]),
        )
        conv[verified_idx] = sub["converged"]
        v[verified_idx] = sub["v"]
        theta[verified_idx] = sub["theta_deg"]
        viol[verified_idx] = sub["v_violations"]
        fl_viol[verified_idx] = sub["flow_violations"]
    worst = np.flatnonzero(
        islanded
        | (np.isin(np.arange(p), verified_idx)
           & (~conv | (viol > 0) | (fl_viol > 0)))
    )
    return {
        "pairs": pairs,
        "islanded": islanded,
        "severity": sev,
        "order": order,
        "verified_idx": verified_idx,
        "converged": conv,
        "v": v,
        "theta_deg": theta,
        "v_violations": viol,
        "flow_violations": fl_viol,
        "pred_v": pv,
        "pred_theta": pth,
        "worst": worst,
        "n_solves": int(top_k),
    }
