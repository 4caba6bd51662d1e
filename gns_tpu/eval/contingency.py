"""N-1 contingency screening: every single-outage variant in one dispatch.

The operational workload behind power-flow speed (the reason the paper
frames the GNS as an NR accelerator, GNS/main.py:10): after any change,
re-solve the system with each element knocked out and check the
post-contingency state. The reference has no such surface; here it falls
out of the batched solver's design: an outage only zeroes the branch (or
generator) STATUS column, leaving the endpoint index arrays untouched —
so N-1 variants of one case share topology and solve as ONE batched
Newton program per bus-type group (`eval/nr_batched.py`: on-device
admittance assembly, packed single-fetch outputs), optionally
warm-started by the GNS prediction through the fused hybrid
(`eval/hybrid.py`). Branch outages never change bus types (one
dispatch); gen outages that strip a bus of its last in-service generator
convert it PV -> PQ (pypower bustypes semantics) and solve as their own
small groups.

Islanding is handled honestly: removing a bridge branch disconnects part
of the network, the Jacobian goes singular, and the solve reports that
contingency as non-converged — exactly the "needs operator attention"
flag a screen must raise (no silent NaNs; tested).

Measured (one TPU v5e over the relay, min of 3, compact_after=3): the
FULL N-1 screen of the authentic IEEE case118 — 186 branch + 53 gen
outages — runs in ~0.4 s (~600 contingencies/s, 230/239 solvable; the 9
non-converged are genuine islanding cases). warm="base" (seed every
variant with the pre-contingency solution) cuts per-grid iterations
3.0 -> 2.2 on case30 at wall-time parity on this relay — the savings
materialize fully on local hardware where the extra base solve and
seeding transfer are microseconds.

Usage:
    from gns_tpu.eval.contingency import screen_n1
    rep = screen_n1(case)                      # flat-start Newton
    rep = screen_n1(case, params=p, cfg=c)     # GNS-warm-started
    rep["converged"], rep["v_min"], rep["v_violations"]
"""

from __future__ import annotations

import copy
from typing import Dict, List, Optional, Sequence

import numpy as np

from gns_tpu.utils.config import GNSConfig


def n1_variants(
    case: Dict,
    branch_outages: bool = True,
    gen_outages: bool = False,
    encode_impedance: bool = False,
    gen_pq_conversion: bool = True,
) -> List[Dict]:
    """All single-outage variants of `case` (shared-topology by design).

    Each variant zeroes one status column — branch col 10 / gen col 7 —
    so endpoint/generator index arrays are identical across the set and
    the batched solver's shared-topology contract holds. Outages of the
    slack generator are skipped (no reference bus, the problem is
    undefined). Each variant dict carries an "outage" key
    ("branch", i) / ("gen", i) for reporting.

    gen_pq_conversion (default True): a bus whose LAST in-service
    generator is outaged loses voltage control — pypower/MATPOWER's
    bustypes converts it from PV to PQ, and the variant here does the
    same (solving it as PV would hold the set-point magnitude with
    implicit unbounded reactive support, systematically understating
    post-contingency voltage sag near the lost unit). These variants
    carry DIFFERENT bus types than the rest, so screen_n1 groups them
    into their own batched solve (the solve_mixed grouping pattern) —
    the shared-topology contract holds per group.

    encode_impedance: additionally set the outaged branch's r=x=1e6, b=0.
    The Newton solution is unchanged (status already zeroes its
    admittance), but the outage becomes VISIBLE to the GNS: its input
    schema has no status column, and in admittance space
    (GNSConfig.admittance_inputs) the encoding is a well-scaled zero —
    the representation the outage-aware models are trained on
    (tools/exp_outage_aware.py).
    """
    out = []
    if branch_outages:
        for i in range(np.asarray(case["branch"]).shape[0]):
            v = copy.deepcopy(case)
            v["branch"] = np.asarray(v["branch"], np.float64).copy()
            if v["branch"].shape[1] <= 10:
                raise ValueError("case branch table has no status column")
            v["branch"][i, 10] = 0.0
            if encode_impedance:
                v["branch"][i, 2] = 1e6
                v["branch"][i, 3] = 1e6
                v["branch"][i, 4] = 0.0
            v["outage"] = ("branch", i)
            out.append(v)
    if gen_outages:
        bus = np.asarray(case["bus"])
        gen = np.asarray(case["gen"], np.float64)
        slack_bus = int(bus[np.flatnonzero(bus[:, 1] == 3)[0], 0])
        gstat = gen[:, 7] if gen.shape[1] > 7 else np.ones(gen.shape[0])
        for i in range(gen.shape[0]):
            gbus = int(gen[i, 0])
            if gbus == slack_bus:
                continue  # removing the slack leaves no reference bus
            v = copy.deepcopy(case)
            v["gen"] = gen.copy()
            v["gen"][i, 7] = 0.0
            if gen_pq_conversion and gstat[i] > 0:
                others_on = (
                    (gen[:, 0].astype(int) == gbus) & (gstat > 0)
                ).sum() > 1
                if not others_on:
                    v["bus"] = np.asarray(v["bus"], np.float64).copy()
                    row = np.flatnonzero(
                        v["bus"][:, 0].astype(int) == gbus
                    )[0]
                    if int(v["bus"][row, 1]) == 2:  # PV -> PQ
                        v["bus"][row, 1] = 1.0
            v["outage"] = ("gen", i)
            out.append(v)
    return out


def screen_n1(
    case: Dict,
    branch_outages: bool = True,
    gen_outages: bool = False,
    tol: float = 3e-5,
    max_iter: int = 20,
    compact_after: int = 3,
    method: str = "auto",
    warm: str = "base",
    params=None,
    cfg: Optional[GNSConfig] = None,
    encode_impedance: bool = False,
    gen_pq_conversion: bool = True,
    v_limits=(0.94, 1.06),
    mesh=None,
) -> Dict:
    """Screen every single outage of `case`; one batched dispatch.

    warm="base" (default): solve the PRE-contingency case once and seed
    every variant with its solution — the classical tracking start (mild
    outages barely move the state). warm="flat": plain flat starts.
    With `params`/`cfg` the GNS prediction warm-starts through the fused
    hybrid instead; note the GNS input schema carries no branch-status
    column (reference GNS/utils.py:29-33 selects r/x/b/tau/shift only),
    so its prediction approximates the pre-contingency state — measured
    slower than warm="base" at these scales because it also pays the
    forward. method="auto" (round 4b) resolves the solver axis to the
    fast-decoupled loop (eval/fdpf.py; identical verdicts incl.
    islanding, tests/test_contingency.py), and bus-type groups dispatch
    on a thread pool so their fetch round trips overlap — the full
    authentic-case118 set (239 contingencies) screens in 0.47 s
    (branch-only 0.20 s; the round-4 Newton-serialized screen took
    2.42 s). compact_after=3 applies only to method="nr" — there the
    per-grid exit pays exactly here (measured 1.35x: islanded variants
    NEVER converge, so lock-step would spin the whole batch to max_iter
    on their account); a fast-decoupled iteration is two matvecs, so
    fdpf ignores it. Non-converged contingencies are REPORTED as the
    islanding signal — with one guard (round 5): structural bridges are
    the only outages that cannot converge, so a non-bridge failure
    (e.g. a fast-decoupled stall on a high-r/x user grid) gets ONE
    full-Newton flat re-solve before the verdict; islanded variants are
    never re-solved (they fail from any start, a re-solve only burns a
    dispatch).

    Returns {
      "outages":       list of ("branch"|"gen", index),
      "converged":     (C,) bool — False flags islanding/divergence,
      "iterations_per_grid": (C,) int,
      "v":             (C, N) solved magnitudes,
      "theta_deg":     (C, N),
      "v_min"/"v_max": (C,) per-contingency extremes (converged only;
                       NaN otherwise),
      "v_violations":  (C,) int — PQ (load) buses outside v_limits per
                       contingency, using each VARIANT's own bus types
                       (a PV bus converted to PQ by its generator's
                       outage counts — its magnitude is now a solved
                       value, the sag the screen exists to catch).
                       Remaining generator-bus magnitudes are SET-POINTS
                       held by the solver, not solved values (the stock
                       case14 pins Vg=1.09 above its own 1.06 limit), so
                       only load buses can meaningfully violate,
      "flow_violations": (C,) int — branches whose exact AC apparent-
                       power loading exceeds their published MVA rating
                       (rateA; see `flow_violations` — unrated branches,
                       incl. pypower's 9900 placeholders, never count),
      "branch_loading_mva": (C, E) max(|S_f|, |S_t|) per branch,
      "max_loading_frac": (C,) worst loading / rating over rated branches,
      "worst":         indices of non-converged + voltage- or
                       flow-violating contingencies,
    }

    Gen-outage variants whose bus lost its last in-service generator are
    converted PV -> PQ (pypower bustypes semantics; see n1_variants) —
    they carry different bus types, so the screen groups variants by
    bus-type signature and runs one batched dispatch per group (the
    solve_mixed pattern; branch outages all share the base types, so the
    common branch-only screen stays a single dispatch).
    """
    variants = n1_variants(
        case, branch_outages, gen_outages,
        encode_impedance=encode_impedance,
        gen_pq_conversion=gen_pq_conversion,
    )
    if not variants:
        raise ValueError("no contingencies to screen")
    from gns_tpu.eval.nr_batched import solve_batched

    if params is not None and cfg is None:
        raise ValueError("cfg is required when params are given")
    if params is None and warm not in ("base", "flat"):
        raise ValueError(f"warm must be 'base' or 'flat', got {warm!r}")

    # group by bus-type signature (shared-topology contract holds per
    # group; one group total unless gen_pq_conversion fires)
    sigs: Dict[bytes, list] = {}
    for i, va in enumerate(variants):
        key = np.asarray(va["bus"])[:, 1].astype(np.int8).tobytes()
        sigs.setdefault(key, []).append(i)

    base_sol = None
    if params is None and warm == "base":
        base = solve_batched([case], tol=tol, max_iter=max_iter)  # one grid
        if base["converged"][0]:
            base_sol = (base["v"], np.deg2rad(base["theta_deg"]))

    c = len(variants)
    n = np.asarray(case["bus"]).shape[0]
    conv = np.zeros(c, bool)
    v = np.full((c, n), np.nan, np.float32)
    theta = np.full((c, n), np.nan, np.float32)
    itg = np.zeros(c, np.int32)
    from gns_tpu.eval.solve import solve_ac

    def solve_group(idx):
        group = [variants[i] for i in idx]
        # one unified surface for every arm (eval/solve.py);
        # fallback_flat=False throughout: an islanded variant fails from
        # ANY start, so a flat re-solve would only burn a dispatch —
        # non-convergence is the screen's signal, not an error
        if params is not None:
            return solve_ac(
                group, params=params, cfg=cfg, warm_start="gns",
                method=method,
                tol=tol, max_iter=max_iter, chunk_size=len(group),
                compact_after=compact_after, fallback_flat=False,
                mesh=mesh,
            )
        if base_sol is not None:
            s = len(group)
            return solve_ac(
                group, warm_start="prev",
                prev=(
                    np.repeat(base_sol[0], s, axis=0),
                    np.repeat(base_sol[1], s, axis=0),
                ),
                method=method,
                tol=tol, max_iter=max_iter, chunk_size=len(group),
                compact_after=compact_after, fallback_flat=False,
                mesh=mesh,
            )
        return solve_ac(
            group, warm_start="flat", method=method,
            tol=tol, max_iter=max_iter,
            chunk_size=len(group), compact_after=compact_after,
            mesh=mesh,
        )

    # Groups are independent programs whose wall time is dominated by a
    # blocking fetch round trip each (~70 ms on the relay); gen-outage
    # PV->PQ conversion typically fragments the set into several small
    # groups, so run them on a small thread pool — the GIL releases
    # during the fetches, overlapping the round trips (measured: the
    # 239-contingency case118 screen's group serialization was most of
    # the 2.24x -> 1.32x speedup dilution vs the one-group screen).
    # One group keeps the plain in-thread call.
    groups = list(sigs.values())
    if len(groups) == 1:
        results = [solve_group(groups[0])]
    else:
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=min(8, len(groups))) as ex:
            results = list(ex.map(solve_group, groups))
    for idx, res in zip(groups, results):
        ii = np.asarray(idx)
        conv[ii] = res["converged"]
        v[ii] = res["v"]
        theta[ii] = res["theta_deg"]
        itg[ii] = res["iterations_per_grid"]

    # The screen's contract reads non-convergence as the islanding
    # signal, but with method="auto" the solver is fast-decoupled, which
    # can fail on non-islanded variants full Newton handles (high r/x
    # ratios break the B'/B'' decoupling assumption). Structural bridges
    # are the only outages that CANNOT converge (gen outages never
    # island), so any other failure gets one full-Newton re-solve before
    # being reported — on the shipped IEEE tables this set is empty and
    # costs nothing; on user-supplied distribution-style grids it keeps
    # a solvable contingency from being mis-reported as islanded.
    if method != "nr" and (~conv).any():
        bridge_rows = (set(find_bridges(case).tolist())
                       if branch_outages else set())
        retry = [
            i for i in np.flatnonzero(~conv)
            if not (variants[i]["outage"][0] == "branch"
                    and variants[i]["outage"][1] in bridge_rows)
        ]
        # regroup by bus-type signature (the retry set can mix PV->PQ
        # converted gen-outage variants with base-typed ones)
        rsigs: Dict[bytes, list] = {}
        for i in retry:
            key = np.asarray(variants[i]["bus"])[:, 1].astype(
                np.int8).tobytes()
            rsigs.setdefault(key, []).append(i)
        for ridx in rsigs.values():
            res = solve_ac(
                [variants[i] for i in ridx], warm_start="flat",
                method="nr", tol=tol, max_iter=max_iter,
                chunk_size=len(ridx), compact_after=compact_after,
                mesh=mesh,
            )
            ok = np.flatnonzero(res["converged"])
            ii = np.asarray(ridx)[ok]
            conv[ii] = True
            v[ii] = res["v"][ok]
            theta[ii] = res["theta_deg"][ok]
            itg[ii] += res["iterations_per_grid"][ok]

    lo, hi = v_limits
    v_min = np.full(c, np.nan, np.float32)
    v_max = np.full(c, np.nan, np.float32)
    if conv.any():
        v_min[conv] = v[conv].min(axis=1)
        v_max[conv] = v[conv].max(axis=1)
    # per-VARIANT load-bus mask: a PQ-converted bus is a solved magnitude
    # in its own variant and must count toward violations there
    is_pq = np.stack(
        [np.asarray(va["bus"])[:, 1] == 1 for va in variants]
    )
    viol = np.where(
        conv, (((v < lo) | (v > hi)) & is_pq).sum(axis=1), 0
    ).astype(np.int32)
    # MVA-limit screening (round 5): exact AC branch loadings at the
    # solved states vs each branch's published rateA — live on the cases
    # whose tables carry real limits (case9/case30, utils/cases.py).
    fl_viol, loading, max_frac = flow_violations(variants, v, theta)
    worst = np.flatnonzero(~conv | (viol > 0) | (fl_viol > 0))
    return {
        "outages": [va["outage"] for va in variants],
        "converged": conv,
        "iterations_per_grid": itg,
        "v": v,
        "theta_deg": theta,
        "v_min": v_min,
        "v_max": v_max,
        "v_violations": viol,
        "flow_violations": fl_viol,
        "branch_loading_mva": loading,
        "max_loading_frac": max_frac,
        "worst": worst,
    }


def ac_branch_flows(variants: List[Dict], v: np.ndarray,
                    theta_deg: np.ndarray):
    """Exact complex AC branch flows (MVA) at solved states.

    MATPOWER conventions (the complex twin of fdpf._branch_parts):
    S_f = V_f (y_ff V_f + y_ft V_t)*, S_t = V_t (y_tf V_f + y_tt V_t)*,
    both scaled to MVA. Shapes: v/theta_deg (C, N) over C variants (each
    with its OWN branch table — an outaged branch has status 0 and flows
    0); returns (sf, st) each (C, E) complex128. Power balance holds
    exactly: Re(sf + st) summed over branches is the system's series
    losses (tested against case30's published 17.557 MW). Rows with NaN
    states (non-converged variants) propagate NaN. float64 numpy on
    host: C*E complex ops, microseconds at screen scale.
    """
    br0 = np.asarray(variants[0]["branch"], np.float64)
    e = br0.shape[0]
    c = len(variants)
    f = br0[:, 0].astype(np.int64) - 1
    t = br0[:, 1].astype(np.int64) - 1
    branch = np.stack(
        [np.asarray(va["branch"], np.float64) for va in variants]
    )
    base = np.array([va["baseMVA"] for va in variants], np.float64)
    status = branch[:, :, 10] if br0.shape[1] > 10 else np.ones((c, e))
    ys = status / (branch[:, :, 2] + 1j * branch[:, :, 3])
    bc = status * branch[:, :, 4]
    tap = np.where(branch[:, :, 8] == 0, 1.0, branch[:, :, 8]) * np.exp(
        1j * np.deg2rad(branch[:, :, 9])
    )
    ytt = ys + 1j * bc / 2.0
    yff = ytt / (tap * np.conj(tap))
    yft = -ys / np.conj(tap)
    ytf = -ys / tap

    vc = v.astype(np.float64) * np.exp(
        1j * np.deg2rad(theta_deg.astype(np.float64))
    )
    vf, vt = vc[:, f], vc[:, t]
    sf = vf * np.conj(yff * vf + yft * vt) * base[:, None]
    st = vt * np.conj(ytf * vf + ytt * vt) * base[:, None]
    return sf, st


def ac_branch_loading(variants: List[Dict], v: np.ndarray,
                      theta_deg: np.ndarray) -> np.ndarray:
    """max(|S_f|, |S_t|) per branch (MVA) — the quantity MVA ratings
    (branch col 5, rateA) limit. (C, E); see `ac_branch_flows`."""
    sf, st = ac_branch_flows(variants, v, theta_deg)
    return np.maximum(np.abs(sf), np.abs(st))


def flow_violations(variants: List[Dict], v: np.ndarray,
                    theta_deg: np.ndarray, rate_cap: float = 9000.0):
    """Count per-variant branch MVA-limit violations at solved states.

    Returns (counts (C,) int32, loading (C, E) MVA, max_loading_frac
    (C,)). A branch is violated when its loading exceeds its rateA
    (branch col 5). Branches with rateA <= 0 or >= `rate_cap` are
    UNRATED: pypower ships 9900 as "effectively unlimited" on
    case14/case118 (only case9/case30 publish real limits — see
    utils/cases.py), and counting against a fictitious 9900 MVA limit
    would report zero forever while poisoning max_loading_frac.
    NaN rows (non-converged variants) count 0 and report NaN loading.
    """
    loading = ac_branch_loading(variants, v, theta_deg)
    rate = np.stack([
        np.asarray(va["branch"], np.float64)[:, 5] for va in variants
    ])
    rated = (rate > 0) & (rate < rate_cap)
    with np.errstate(invalid="ignore"):
        over = rated & (loading > rate)
        frac = np.where(rated, loading / np.where(rated, rate, 1.0), 0.0)
    nan_rows = np.isnan(loading).any(axis=1)
    counts = np.where(nan_rows, 0, over.sum(axis=1)).astype(np.int32)
    max_frac = np.where(
        nan_rows, np.nan, frac.max(axis=1)
    ).astype(np.float32)
    return counts, loading.astype(np.float32), max_frac


def find_bridges(case: Dict) -> np.ndarray:
    """Branch rows whose outage ISLANDS the network (graph bridges).

    Islanding is graph-structural, not electrical: removing a bridge of
    the in-service branch multigraph disconnects buses, the power-flow
    Jacobian goes singular, and NO solver converges from any start. The
    ranked screen therefore flags these EXACTLY, for free, with an
    iterative Tarjan bridge search (O(N+E)) instead of burning Newton
    iterations discovering the singularity per variant (a branch with an
    in-service parallel companion is never a bridge). Measured: the
    bridge set equals the full NR screen's non-converged set exactly on
    case14 (1/20) and the authentic case118 (9/186).
    """
    bus = np.asarray(case["bus"], float)
    br = np.asarray(case["branch"], float)
    n = bus.shape[0]
    f = br[:, 0].astype(int) - 1
    t = br[:, 1].astype(int) - 1
    status = br[:, 10] > 0 if br.shape[1] > 10 else np.ones(br.shape[0], bool)
    adj: List[list] = [[] for _ in range(n)]
    pair_count: Dict[tuple, int] = {}
    for i in np.flatnonzero(status):
        a, b = int(f[i]), int(t[i])
        adj[a].append((b, i))
        adj[b].append((a, i))
        key = (min(a, b), max(a, b))
        pair_count[key] = pair_count.get(key, 0) + 1

    disc = np.full(n, -1, np.int64)
    low = np.zeros(n, np.int64)
    out = []
    timer = 0
    for root in range(n):
        if disc[root] != -1:
            continue
        # iterative DFS: stack of (node, parent-edge, next-child-pointer)
        stack = [(root, -1, 0)]
        disc[root] = low[root] = timer
        timer += 1
        while stack:
            u, pe, ptr = stack[-1]
            if ptr < len(adj[u]):
                stack[-1] = (u, pe, ptr + 1)
                vtx, ei = adj[u][ptr]
                if ei == pe:
                    continue
                if disc[vtx] == -1:
                    disc[vtx] = low[vtx] = timer
                    timer += 1
                    stack.append((vtx, ei, 0))
                else:
                    low[u] = min(low[u], disc[vtx])
            else:
                stack.pop()
                if stack:
                    p = stack[-1][0]
                    low[p] = min(low[p], low[u])
                    if low[u] > disc[p]:
                        key = (min(p, u), max(p, u))
                        if pair_count[key] == 1:
                            out.append(pe)
    return np.asarray(sorted(out), np.int64)


def screen_n1_ranked(
    case: Dict,
    params,
    cfg: GNSConfig,
    branch_outages: bool = True,
    gen_outages: bool = False,
    top_k: int = 32,
    tol: float = 3e-5,
    max_iter: int = 20,
    compact_after: int = 3,
    method: str = "auto",
    encode_impedance: bool = True,
    gen_pq_conversion: bool = True,
    v_limits=(0.94, 1.06),
    batch_size: Optional[int] = None,
    mesh=None,
) -> Dict:
    """GNS-ranked fast N-1 screen: predict ALL, Newton-verify only top-k.

    The operational product of the framework's ~4-orders-of-magnitude
    serving-speed advantage over Newton (the comparison that is the
    reference's entire point, GNS/evaluate.py:89-92,138). Three stages:

      1. STRUCTURAL: islanding outages are flagged EXACTLY by graph
         bridge detection (`find_bridges`) — no model, no Newton; they
         go straight to "worst" (a bridge outage fails from any start,
         so NR-verifying it only burns max_iter Jacobian builds).
      2. RANK: ONE batched GNS forward over every remaining variant
         (milliseconds); severity = rms deviation of the predicted
         voltage profile from the model's OWN intact-grid prediction.
         Differencing against the model's own base prediction cancels
         its per-bus bias, which is why this score measured strictly
         better than absolute predicted-violation depth and than the
         classical base-flow heuristic (in-repo A/B: case118 converged
         set recall@64 0.67 vs 0.25 for |S_flow| ranking; the predicted
         violation depth ships alongside as "pred_violation_pu").
      3. VERIFY: the `top_k` most severe are Newton-verified in batched
         dispatches, warm-started by the predictions already in hand.

    Requires an outage-AWARE model (GNSConfig.admittance_inputs trained
    on outage-augmented grids — the `*-n1` checkpoints): the base schema
    carries no branch-status column, so a blind model predicts the
    pre-contingency state for every variant and stage 2 cannot rank
    (stage 1 still works — it needs no model at all).
    encode_impedance=True (default) feeds the aware representation.

    Ranking quality and wall time are measured by tools/exp_n1_screen.py
    (recall@k of ground-truth violations on the full authentic case118
    outage set; docs/N1_SCREEN.md).

    Returns {
      "outages", "severity" (C,; +inf for islanding),
      "islanded" (C,) bool — stage-1 structural flags,
      "order" (C, descending severity; islanding first),
      "verified_idx" (k,) — contingencies sent to Newton,
      "converged"/"v"/"theta_deg"/"v_violations"/"v_min" — NR results on
          the verified subset (NaN/0 elsewhere),
      "pred_v"/"pred_theta_deg"/"pred_violation_pu" — the GNS view of
          ALL variants,
      "worst" — islanded outages + verified indices that violate,
      "n_newton_solves" — NR budget actually spent (vs C for the full
          screen),
    }
    """
    from gns_tpu.serve import GNSPredictor

    variants = n1_variants(
        case, branch_outages, gen_outages,
        encode_impedance=encode_impedance,
        gen_pq_conversion=gen_pq_conversion,
    )
    c = len(variants)
    if not variants:
        raise ValueError("no contingencies to screen")

    # stage 1: exact structural islanding flags
    bridge_rows = set(find_bridges(case).tolist()) if branch_outages else set()
    islanded = np.array(
        [va["outage"][0] == "branch" and va["outage"][1] in bridge_rows
         for va in variants]
    )

    # stage 2: one batched forward over variants + the intact case (the
    # intact prediction is the bias-cancelling reference for severity)
    predictor = GNSPredictor(
        params, cfg, batch_size=batch_size or (c + 1), align_slack=True,
        mesh=mesh,
    )
    pred = predictor.predict(variants + [case])
    pv, pth = pred["v"][:c], pred["theta"][:c]
    v_base = pred["v"][c]
    sev = np.sqrt(((pv - v_base[None, :]) ** 2).mean(axis=1)).astype(
        np.float64
    )
    lo, hi = v_limits
    is_pq = np.stack([np.asarray(va["bus"])[:, 1] == 1 for va in variants])
    pred_viol = (
        (np.maximum(lo - pv, 0.0) + np.maximum(pv - hi, 0.0)) * is_pq
    ).sum(axis=1)
    sev[islanded] = np.inf  # flagged exactly; ranked above everything
    order = np.argsort(-sev, kind="stable").astype(np.int64)

    # stage 3: Newton-verify the top-k RANKABLE variants (islanding needs
    # no verification — there is nothing to converge to)
    rankable = order[~islanded[order]]
    top_k = min(top_k, rankable.size)
    verified_idx = np.sort(rankable[:top_k])

    n = np.asarray(case["bus"]).shape[0]
    conv = np.zeros(c, bool)
    v = np.full((c, n), np.nan, np.float32)
    theta = np.full((c, n), np.nan, np.float32)
    viol = np.zeros(c, np.int32)
    v_min = np.full(c, np.nan, np.float32)
    if top_k:
        sub = _verify_subset(
            variants, verified_idx, {"v": pv, "theta": pth},
            tol, max_iter, compact_after, method=method, mesh=mesh,
        )
        conv[verified_idx] = sub["converged"]
        v[verified_idx] = sub["v"]
        theta[verified_idx] = sub["theta_deg"]
        for i in verified_idx:
            if not conv[i]:
                continue
            pq_i = is_pq[i]
            viol[i] = int((((v[i] < lo) | (v[i] > hi)) & pq_i).sum())
            v_min[i] = v[i].min()
    # MVA screening on the verified subset (NaN rows — unverified or
    # non-converged — count zero; cf. screen_n1)
    fl_viol, loading, max_frac = flow_violations(variants, v, theta)
    worst = np.flatnonzero(
        islanded
        | (np.isin(np.arange(c), verified_idx)
           & (~conv | (viol > 0) | (fl_viol > 0)))
    )
    return {
        "outages": [va["outage"] for va in variants],
        "severity": sev,
        "islanded": islanded,
        "order": order,
        "verified_idx": verified_idx,
        "converged": conv,
        "v": v,
        "theta_deg": theta,
        "v_violations": viol,
        "flow_violations": fl_viol,
        "branch_loading_mva": loading,
        "max_loading_frac": max_frac,
        "v_min": v_min,
        "pred_v": pv,
        "pred_theta_deg": np.rad2deg(pth).astype(np.float32),
        "pred_violation_pu": pred_viol,
        "worst": worst,
        "n_newton_solves": int(top_k),
    }


def _verify_subset(
    variants: List[Dict],
    idx: Sequence[int],
    pred: Dict,
    tol: float,
    max_iter: int,
    compact_after,
    method: str = "auto",
    mesh=None,
) -> Dict:
    """Newton-verify the selected variants, warm-started by the GNS
    prediction already in hand (no second forward), grouped by bus-type
    signature like screen_n1. Results in `idx` order."""
    from gns_tpu.eval.solve import solve_ac

    idx = np.asarray(idx)
    sigs: Dict[bytes, list] = {}
    for j, i in enumerate(idx):
        key = np.asarray(variants[i]["bus"])[:, 1].astype(np.int8).tobytes()
        sigs.setdefault(key, []).append(j)
    n = pred["v"].shape[1]
    out = {
        "converged": np.zeros(idx.size, bool),
        "v": np.full((idx.size, n), np.nan, np.float32),
        "theta_deg": np.full((idx.size, n), np.nan, np.float32),
    }
    def solve_rows(rows):
        rows = np.asarray(rows)
        gidx = idx[rows]
        return rows, solve_ac(
            [variants[i] for i in gidx],
            warm_start="prev",
            prev=(pred["v"][gidx], pred["theta"][gidx]),
            method=method,
            tol=tol, max_iter=max_iter, chunk_size=len(gidx),
            compact_after=compact_after, fallback_flat=False,
            mesh=mesh,
        )

    # overlap the per-group fetch round trips (cf. screen_n1's pool)
    groups = list(sigs.values())
    if len(groups) == 1:
        results = [solve_rows(groups[0])]
    else:
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=min(8, len(groups))) as ex:
            results = list(ex.map(solve_rows, groups))
    for rows, res in results:
        out["converged"][rows] = res["converged"]
        out["v"][rows] = res["v"]
        out["theta_deg"][rows] = res["theta_deg"]
    # Callers only verify non-islanded variants (stage 1 filtered the
    # bridges), so ANY failure here is solver-side — a bad warm start or
    # a fast-decoupled stall on high-r/x branches — and gets one
    # full-Newton flat re-solve before being reported (cf. screen_n1's
    # rescue; empty on the shipped tables).
    if method != "nr" and (~out["converged"]).any():
        rsigs = {}
        for j in np.flatnonzero(~out["converged"]):
            key = np.asarray(variants[idx[j]]["bus"])[:, 1].astype(
                np.int8).tobytes()
            rsigs.setdefault(key, []).append(int(j))
        for rows in rsigs.values():
            rows = np.asarray(rows)
            res = solve_ac(
                [variants[i] for i in idx[rows]], warm_start="flat",
                method="nr", tol=tol, max_iter=max_iter,
                chunk_size=len(rows), compact_after=compact_after,
                mesh=mesh,
            )
            ok = np.flatnonzero(res["converged"])
            out["converged"][rows[ok]] = True
            out["v"][rows[ok]] = res["v"][ok]
            out["theta_deg"][rows[ok]] = res["theta_deg"][ok]
    return out
