"""solve_ac: the ONE solver surface, with an automatic warm-start policy.

The framework has three exact Newton entry arms that differ only in where
the initial iterate comes from:

  * flat   — the classical flat start (nr_batched.solve_batched),
  * prev   — warm-started from a PREVIOUS solution the caller already has
             (the tracking-solver pattern: re-solving a slightly changed
             system; measured the fastest arm whenever a previous
             solution exists — docs/HYBRID_BENCH_R3.json "hot"),
  * gns    — warm-started by the GNS prediction through the fused
             single-program hybrid (eval/hybrid.py; pays the forward, so
             it is the right arm exactly when no previous solution
             exists but a trained model does).

Round 3 shipped all three but made the caller hand-pick; this module is
the VERDICT-round-3 unification: `warm_start="auto"` resolves to
prev-when-available (the round-3 "hot" rows: prev beats every other arm
whenever it exists), then GNS-when-it-pays, flat otherwise. "When it
pays" is the measured round-3 break-even, resolved against the actual
deployment's dispatch round trip (nr_batched.measured_dispatch_rtt):

  * low-RTT backend (local hardware): the fused forward is pure device
    time and the saved iterations beat it from case14 up (device-time
    A/B 1.047x, ROADMAP #8) -> gns always;
  * high-RTT relay (~33 ms/round trip): wall time is RTT-dominated on
    small grids — best-vs-best case14 0.98x / case30 0.95x (losses),
    case118 1.00x, case300 1.09x (docs/HYBRID_BENCH_R3.json) -> gns
    only from N >= _GNS_WARM_MIN_BUSES (100) where it is >= parity and
    growing.

so auto is never slower than the best hand-picked arm beyond dispatch
noise (proven through this surface by tools/bench_hybrid.py
--scenario auto -> docs/HYBRID_BENCH_R4.json).

On top of the warm-start axis, round 4 added the SOLVER axis: `method`
picks between batched full Newton (nr_batched) and the batched
fast-decoupled solver (eval/fdpf.py — B'/B'' factored once, iterations
are matvecs). method="auto" resolves to fdpf, which measured >= parity
on every (case, scenario) cell and up to 3.2x on the large ones
(docs/FDPF_BENCH.json), with full-Newton flat-start fallback for any
grid the decoupling fails. Through this surface the auto policy is now
measured FASTER than every round-3 hand-picked Newton arm: cold
1.10-2.38x, hot 1.06-2.24x, flat 1.17-2.81x across cases 14/30/118/300
(docs/HYBRID_BENCH_R4.json "run_c_fdpf").

The solver axis feeds back into the warm-start policy: under fdpf the
gns arm never pays on COLD starts (iterations are so cheap that the
2-3 saved pairs cannot cover the fused forward — the 9a''
warm-start-saturation result, amplified; run_c_fdpf measured auto's
gns-cold ~14% behind its own flat arm on case118), so auto resolves
cold starts to flat under fdpf ("run_d_cold_policy" proves auto_cold
== the flat arm). The gns hybrid remains one explicit override away
and stays auto's cold arm under method="nr".

All arms return the SAME fixed point (Newton's root does not depend on
its start; asserted in tests) and the same result schema, and all are
protected by the flat-start fallback (a bad warm start can leave Newton's
basin of attraction; any non-converged grid is re-solved flat and
spliced, so no warm arm is ever less robust than plain NR).

The reference has no solver surface at all — its evaluate.py only
compares GNS and NR side by side (GNS/evaluate.py:89-148); this is the
operational product of that comparison.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple, Union

import numpy as np

from gns_tpu.utils.config import GNSConfig


# High-RTT break-even for the gns arm (see module docstring): below this
# bus count the fused forward + relay round trips outweigh the saved
# iterations (measured best-vs-best, docs/HYBRID_BENCH_R3.json).
_GNS_WARM_MIN_BUSES = 100


def _gns_warm_pays(cases) -> bool:
    """Measured policy for auto's gns arm: always on low-RTT backends
    (device-time win from case14 up); from _GNS_WARM_MIN_BUSES buses on
    high-RTT relays (wall-time parity at case118, win at case300)."""
    from gns_tpu.eval.nr_batched import (
        _COMPACT_RTT_BREAKEVEN,
        measured_dispatch_rtt,
    )

    if measured_dispatch_rtt() <= _COMPACT_RTT_BREAKEVEN:
        return True
    return np.asarray(cases[0]["bus"]).shape[0] >= _GNS_WARM_MIN_BUSES


def _prev_as_tuple(prev, n_cases: int):
    """Accept a previous solution as either the result dict of a prior
    solve ({"v", "theta_deg"}) or a raw (v, theta_rad) tuple."""
    if isinstance(prev, dict):
        v = np.asarray(prev["v"], np.float32)
        th = np.deg2rad(np.asarray(prev["theta_deg"], np.float32))
    else:
        v = np.asarray(prev[0], np.float32)
        th = np.asarray(prev[1], np.float32)
    if v.shape[0] != n_cases:
        raise ValueError(
            f"previous solution covers {v.shape[0]} grids, got {n_cases}"
        )
    return v, th


def solve_ac(
    cases: List[Dict],
    params=None,
    cfg: Optional[GNSConfig] = None,
    prev: Union[None, Dict, Tuple[np.ndarray, np.ndarray]] = None,
    warm_start: str = "auto",
    method: str = "auto",
    tol: float = 3e-5,
    max_iter: int = 20,
    fdpf_max_iter: int = 60,
    chunk_size: int = 256,
    compact_after="auto",
    fallback_flat: bool = True,
    mesh=None,
) -> Dict:
    """Solve `cases` (shared topology) exactly; pick the warm start for me.

    warm_start:
      "auto" (default) — "prev" if `prev` is given; else, under
          method="nr", "gns" if `params` are given AND the gns arm
          pays on this deployment (always on low-RTT hardware; from
          100 buses on a high-RTT relay — the measured round-3
          break-even); else "flat". Under the fast-decoupled method
          (the method="auto" resolution) cold starts always resolve to
          "flat" — measured: the gns arm's saved pairs never cover its
          fused forward there (module docstring, HYBRID_BENCH_R4
          run_d). The resolved arm is recorded in the result under
          "warm_start".
      "prev" — seed from `prev`: a previous solve's result dict (its
          "v"/"theta_deg") or a raw (v (S,N), theta_rad (S,N)) tuple.
          Only the free unknowns are seeded (PQ magnitudes, PV+PQ
          angles), exactly like every other arm.
      "gns"  — the fused GNS hybrid (requires params + cfg).
      "flat" — plain flat start.

    method:
      "auto" (default) — the fast-decoupled solver (eval/fdpf.py),
          which measured >= parity on every case and scenario and up to
          3.2x on the large ones (docs/FDPF_BENCH.json: cold case30
          1.7x / case118 2.5-2.6x / case300 2.7-3.2x; hot 1.1-2.6x; the
          fused GNS hybrid's tail 2.0-2.2x), with a full-Newton
          flat-start re-solve spliced in for any grid the decoupling
          fails — so the resolved fixed point, robustness and result
          schema are exactly the Newton arm's.
      "nr"   — force batched full Newton everywhere (the round-3 arms).
      "fdpf" — force the fast-decoupled solver (no Newton fallback is
          NOT implied: fallback_flat still applies and uses Newton).
    The resolved solver is recorded in the result under "method".
    max_iter bounds Newton iterations; fdpf_max_iter (default 60) bounds
    fast-decoupled half-step pairs — it converges geometrically, so it
    takes more, ~N-times-cheaper, iterations.

    compact_after: per-grid convergence exit; "auto" (default) resolves
    against the measured dispatch round trip
    (nr_batched.resolve_compact_after) — lock-step on a high-latency
    relay where the exit's extra round trip is a measured negative,
    the exit on local hardware where Jacobian builds dominate.

    fallback_flat: any grid the warm arm fails is re-solved from the flat
    start and spliced in (reported via "fallback_grids"), so no warm
    start is ever less robust than plain NR.

    mesh: optional jax.sharding.Mesh with a "dp" axis — every arm
    (flat/prev/gns x nr/fdpf, and the fallback) shards its batch over
    the mesh's data axis (parallel/solver_dp.py). Fixed points are
    identical to the single-device run.

    Returns the solve_batched result schema ("v", "theta_deg",
    "converged", "iterations", "iterations_per_grid", "mismatch",
    "stalled", ...) plus "warm_start" (the resolved arm) and
    "compact_after" (the resolved exit point).
    """
    from gns_tpu.eval.nr_batched import resolve_compact_after, solve_batched

    if method == "auto":
        # measured >= parity on every (case, scenario) cell, up to 3.2x
        # (docs/FDPF_BENCH.json); robustness is covered by the Newton
        # flat-start fallback below
        method = "fdpf"
    if method not in ("nr", "fdpf"):
        raise ValueError(f"method must be auto|nr|fdpf, got {method!r}")
    if warm_start == "auto":
        if prev is not None:
            warm_start = "prev"
        elif (
            params is not None
            and method == "nr"
            and _gns_warm_pays(cases)
        ):
            # Under the fast-decoupled solver the GNS warm start never
            # pays on cold starts: iterations are so cheap that the 2-3
            # saved half-step pairs (~0.5 ms device) cannot cover the
            # fused forward (measured flat-fdpf <= gns-fdpf on every
            # case, both wall and the device-time argument —
            # docs/FDPF_BENCH.json cold vs gns rows; the 9a''
            # warm-start-saturation result, amplified). auto therefore
            # resolves cold starts to "flat" for fdpf; pass
            # warm_start="gns" to force the fused hybrid.
            warm_start = "gns"
        else:
            warm_start = "flat"
    if warm_start not in ("prev", "gns", "flat"):
        raise ValueError(
            f"warm_start must be auto|prev|gns|flat, got {warm_start!r}"
        )
    compact_after = resolve_compact_after(compact_after)
    if method == "fdpf":
        from gns_tpu.eval.fdpf import solve_batched_fdpf

        def _warm_solve(cs, ws=None):
            return solve_batched_fdpf(
                cs, tol=tol, max_iter=fdpf_max_iter, chunk_size=chunk_size,
                warm_start=ws, mesh=mesh,
            )
    else:
        def _warm_solve(cs, ws=None):
            return solve_batched(
                cs, tol=tol, max_iter=max_iter, chunk_size=chunk_size,
                warm_start=ws, compact_after=compact_after, mesh=mesh,
            )

    if warm_start == "gns":
        if params is None or cfg is None:
            raise ValueError("warm_start='gns' requires params and cfg")
        from gns_tpu.eval.hybrid import hybrid_solve

        out = hybrid_solve(
            params, cfg, cases, tol=tol,
            max_iter=fdpf_max_iter if method == "fdpf" else max_iter,
            chunk_size=chunk_size, compact_after=compact_after,
            fallback_flat=fallback_flat, solver=method, mesh=mesh,
        )
    else:
        ws = None
        if warm_start == "prev":
            if prev is None:
                raise ValueError("warm_start='prev' requires prev")
            ws = _prev_as_tuple(prev, len(cases))
        out = _warm_solve(cases, ws)
        # the fallback re-solve is ALWAYS batched full Newton from the
        # flat start — the most robust arm — so neither a bad previous
        # solution nor a decoupling failure ever costs a solution
        if (
            fallback_flat
            and (warm_start == "prev" or method == "fdpf")
            and not out["converged"].all()
        ):
            bad = np.flatnonzero(~out["converged"])
            flat = solve_batched(
                [cases[i] for i in bad], tol=tol, max_iter=max_iter,
                chunk_size=chunk_size, mesh=mesh,
            )
            out["v"][bad] = flat["v"]
            out["theta_deg"][bad] = flat["theta_deg"]
            out["converged"][bad] = flat["converged"]
            out["mismatch"][bad] = flat["mismatch"]
            out["stalled"][bad] = flat["stalled"]
            out["iterations_per_grid"] = np.asarray(
                out["iterations_per_grid"]
            ).copy()
            out["iterations_per_grid"][bad] += flat["iterations_per_grid"]
            out["fallback_iterations"] = flat["iterations"]
            out["fallback_grids"] = bad.size
        elif "fallback_grids" not in out:
            out["fallback_grids"] = 0
            out["fallback_iterations"] = 0
    out["warm_start"] = warm_start
    out["method"] = method
    out["compact_after"] = compact_after
    return out
