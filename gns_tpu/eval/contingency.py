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
from typing import Dict, List, Optional

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
    warm: str = "base",
    params=None,
    cfg: Optional[GNSConfig] = None,
    encode_impedance: bool = False,
    gen_pq_conversion: bool = True,
    v_limits=(0.94, 1.06),
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
    forward. compact_after=3 by default — screening is the regime where
    the per-grid exit genuinely pays (measured 1.35x, 912 -> 674 ms on
    the case118 N-1 set): islanded variants NEVER converge, so lock-step
    would spin the whole batch to max_iter on their account, while the
    exit quarantines them into a small sub-batch after 3 iterations.
    Non-converged contingencies are REPORTED, never silently re-solved
    (no fallback: an islanded variant fails from any start).

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
      "worst":         indices of non-converged + violating contingencies,
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
        base = solve_batched([case], tol=tol, max_iter=max_iter)
        if base["converged"][0]:
            base_sol = (base["v"], np.deg2rad(base["theta_deg"]))

    c = len(variants)
    n = np.asarray(case["bus"]).shape[0]
    conv = np.zeros(c, bool)
    v = np.full((c, n), np.nan, np.float32)
    theta = np.full((c, n), np.nan, np.float32)
    itg = np.zeros(c, np.int32)
    for idx in sigs.values():
        group = [variants[i] for i in idx]
        if params is not None:
            from gns_tpu.eval.hybrid import hybrid_solve

            res = hybrid_solve(
                params, cfg, group, tol=tol, max_iter=max_iter,
                chunk_size=len(group), compact_after=compact_after,
                fallback_flat=False,
            )
        else:
            warm_start = None
            if base_sol is not None:
                s = len(group)
                warm_start = (
                    np.repeat(base_sol[0], s, axis=0),
                    np.repeat(base_sol[1], s, axis=0),
                )
            res = solve_batched(
                group, tol=tol, max_iter=max_iter,
                chunk_size=len(group), compact_after=compact_after,
                warm_start=warm_start,
            )
        ii = np.asarray(idx)
        conv[ii] = res["converged"]
        v[ii] = res["v"]
        theta[ii] = res["theta_deg"]
        itg[ii] = res["iterations_per_grid"]

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
    worst = np.flatnonzero(~conv | (viol > 0))
    return {
        "outages": [va["outage"] for va in variants],
        "converged": conv,
        "iterations_per_grid": itg,
        "v": v,
        "theta_deg": theta,
        "v_min": v_min,
        "v_max": v_max,
        "v_violations": viol,
        "worst": worst,
    }
