"""Fused physics refresh: compensation + imbalance in one pass.

The model calls global_active_compensation then local_power_imbalance every
correction step with the same (v, theta) (reference: GNS/main.py:190-192).
The two share almost all their work:

  * identical edge geometry and Q2 gathers, recomputed 3x in the reference;
  * the reactive messages of compensation (main.py:68-72) and imbalance
    (main.py:98-99) are the *same expressions*, so with qg_k = qg_new the
    reactive mismatch cancels identically:
        delta_q = (Qd - Bs v^2 - A) - Qd + Bs v^2 + A ~ 0  (float noise)
    [verified: |delta_q| <= 4e-6 at every step of the golden reference run
    while |delta_p| ~ 1 — quirk Q8, SURVEY.md §2.4: the reference's loss
    is active-power-only, which leaves load-bus |v| unconstrained and is
    why large-case paper training used to find wrong-voltage branches.
    The paper-mode qg_gen_only option below restores the reactive
    residual at load buses.]

This module computes the shared messages once, pairs up scatter operands
((E,2) blocks instead of single columns), and returns
(pg_new, qg_new, delta_p, delta_q) in one call — the op-count on this path
is what bounds step time on TPU (the step is launch-bound, not MXU-bound).

Numerics match the unfused functions to float reassociation noise; the
unfused gns_tpu.physics.{compensation,imbalance} remain the reference
implementations and the parity oracles.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from gns_tpu.ops import segment_sum
from gns_tpu.physics.common import branch_flows, edge_geometry
from gns_tpu.physics.compensation import _lambda_dispatch
from gns_tpu.utils.schema import BUS, BUS_TYPE_SLACK, GEN

# Trace-time switches for the stacked-incidence paper-mode physics paths:
# _STACK_GATHER collapses the from/to bus gathers into ONE (2E, 2) take on
# the concatenated [src; dst] index; _STACK_AGG folds the two edge-side
# mismatch aggregations AND the generator injection into ONE (N, 2E+G)
# incidence contraction (col0 = p_sum + pg_bus, col1 = q_sum). Both are
# numerically exact restructurings with strictly fewer ops.
#
# Tried and REJECTED as defaults (kept as tested opt-ins): in-process A/B
# at the headline train config (case300 K=4 b256 bf16 fold hybrid,
# two-point RTT-cancelled scan timing, 2 interleaved rounds) measured
# baseline 0.994-1.007 ms/step vs gather-only 1.004-1.034, agg-only
# 1.015-1.029, both 1.031-1.034 — every stacked variant is a wash or a
# ~3% LOSS. The step is not bound by these op launches: XLA already
# overlaps the two small (N,E) contractions, and the stacked version pays
# real concatenate copies of the trig message rows every K-step.
_STACK_GATHER = False
_STACK_AGG = False


def physics_refresh(
    v,
    theta,
    buses,
    lines,
    gens,
    *,
    reference_parity: bool = True,
    bus_mask: Optional[jnp.ndarray] = None,
    line_mask: Optional[jnp.ndarray] = None,
    gen_mask: Optional[jnp.ndarray] = None,
    method: str = "auto",
    edge_axis: Optional[str] = None,
    topo=None,
    gather_method: str = "take",
    qg_gen_only: bool = False,
    dispatch: str = "lambda",
    gen_bus_mask: Optional[jnp.ndarray] = None,
    slack_mask: Optional[jnp.ndarray] = None,
):
    """One-pass equivalent of global_active_compensation followed by
    local_power_imbalance(.., pg_new, qg_new, ..).

    topo: optional (src, dst, gen_idx) batch-invariant index arrays
    (utils.prepare.GridTopology) — the shared-topology fast path.

    qg_gen_only / dispatch: paper-mode physics conventions (see
    utils/config.py). gen_bus_mask (N,) and slack_mask (N,) are the
    step-invariant masks they use; the caller should precompute them once
    (the model does), else they are derived here.

    Returns (pg_new (G,), qg_new (N,), delta_p (N,), delta_q (N,)).
    """
    if edge_axis is not None and reference_parity:
        raise ValueError("edge-partitioned execution requires reference_parity=False")
    if reference_parity and (qg_gen_only or dispatch != "lambda"):
        raise ValueError(
            "qg_gen_only / dispatch='setpoint_slack' are paper-mode options "
            "(reference_parity=False): the parity path must keep the "
            "reference's exact cancelling reactive residual (quirk Q8)."
        )
    if dispatch not in ("lambda", "setpoint_slack"):
        raise ValueError(f"dispatch must be lambda/setpoint_slack, got {dispatch!r}")

    def _psum(x):
        return jax.lax.psum(x, edge_axis) if edge_axis is not None else x

    n = buses.shape[0]
    geom = edge_geometry(
        lines,
        src=None if topo is None else topo[0],
        dst=None if topo is None else topo[1],
    )
    src, dst = geom.src, geom.dst
    lm = line_mask if line_mask is not None else 1.0
    gmethod = gather_method

    # method='degree' (opt-in, shared topology): degree-slot take-trees
    # (ops/segment.py make_degree_segment_sum) replace the 6-pass-HIGHEST
    # one-hot matmuls on the (E, 2)/(G,) float32 mismatch sums. Measured
    # at the headline train config: 1.30 vs 1.00 ms/step — the max_deg
    # small gathers lose to one MXU matmul even at 6 passes, so this stays
    # an explicit option (exact-f32, matmul-free), not the auto choice.
    if topo is not None and method == "degree":
        from gns_tpu.ops.segment import make_degree_segment_sum

        _ss_dst = make_degree_segment_sum(topo[1], n)
        _ss_src = make_degree_segment_sum(topo[0], n)
        _ss_gen = make_degree_segment_sum(topo[2], n)
        segsum_dst = lambda x: _ss_dst(x)
        segsum_src = lambda x: _ss_src(x)
        segsum_gen = lambda x: _ss_gen(x)
    else:
        # 'degree' needs host-known ids; without topo fall back to auto.
        m = "auto" if method == "degree" else method
        segsum_dst = lambda x: segment_sum(x, dst, n, method=m)
        segsum_src = lambda x: segment_sum(x, src, n, method=m)
        gen_bus_ids = (
            gens[:, GEN["bus_i"]].astype(jnp.int32) - 1 if topo is None else topo[2]
        )
        segsum_gen = lambda x: segment_sum(x, gen_bus_ids, n, method=m)

    v2 = v * v
    pd = buses[:, BUS["Pd"]]
    qd = buses[:, BUS["Qd"]]
    gs = buses[:, BUS["Gs"]]
    bs = buses[:, BUS["Bs"]]

    if reference_parity:
        from gns_tpu.ops.segment import gather

        # ---- shared Q2 gathers (bus-id indexing into per-line arrays) ----
        # bus->edge gathers via one-hot matmul (scatter-free VJP on TPU)
        vth = jnp.stack([v, theta], axis=1)
        at_src = gather(vth, src, method=gmethod)
        at_dst = gather(vth, dst, method=gmethod)
        v_s, v_d = at_src[:, 0], at_dst[:, 0]
        th_sd = at_src[:, 1] - at_dst[:, 1]  # (E,)
        delta = th_sd
        delta_ji = -th_sd
        y_s, d_s = geom.y[src], delta[src]
        tau_s, sh_s = geom.tau[src], geom.shift[src]
        b_s = geom.b_chg[src]
        y_d, dj_d = geom.y[dst], delta_ji[dst]
        tau_d, sh_d = geom.tau[dst], geom.shift[dst]
        b_d = geom.b_chg[dst]

        ang_s = th_sd - d_s - sh_s  # theta_s - theta_t - delta[src] - shift[src]
        ang_d = -th_sd - dj_d - sh_d
        sin_ds, cos_ds = jnp.sin(d_s), jnp.cos(d_s)
        sin_djd = jnp.sin(dj_d)
        sin_angs, cos_angs = jnp.sin(ang_s), jnp.cos(ang_s)
        sin_angd, cos_angd = jnp.sin(ang_d), jnp.cos(ang_d)
        vv_s = v_s * v_d * y_s / tau_s
        vv_d = v_d * v_s * y_d / tau_d

        # Joule message (main.py:41). NOTE its second term uses v_s/tau^2
        # (not (v_s/tau)^2) — an author inconsistency kept for parity.
        msg_joule = jnp.abs(
            vv_s * (sin_angs + jnp.sin(-th_sd - d_s + sh_s))
            + (v_s / tau_s**2) * y_s * sin_ds
            + v_d**2 * y_s * sin_ds
        )
        p_joule = jnp.sum(msg_joule * lm)

        # active mismatch messages (main.py:91-92)
        p_from = vv_s * sin_angs + (v_s / tau_s) ** 2 * y_s * sin_ds
        p_to = vv_d * sin_angd + v_d**2 * y_d * sin_djd
        # reactive messages (main.py:68-72 == 98-99)
        q_from = -vv_s * cos_angs + (v_s / tau_s) ** 2 * (y_s * cos_ds - b_s / 2)
        q_to = -vv_d * cos_angd + v_d**2 * (y_d * sin_djd - b_d / 2)
    else:
        # Stacked-incidence fast path (paper mode, not edge-partitioned):
        # the from- and to-side bus gathers collapse into ONE (2E, 2) take
        # on the concatenated [src; dst] index — one forward copy and one
        # transposed (N, 2E) matmul in the VJP instead of two (N, E) ones.
        stackable = edge_axis is None and method != "degree"
        stacked = stackable and _STACK_AGG
        at_src = at_dst = None
        if stackable and _STACK_GATHER:
            from gns_tpu.ops.segment import gather

            both_idx = jnp.concatenate([src, dst])
            vth = jnp.stack([v, theta], axis=1)
            at_both = gather(vth, both_idx, method=gmethod)
            n_e = src.shape[0]
            at_src, at_dst = at_both[:n_e], at_both[n_e:]
        p_f, q_f, p_t, q_t = branch_flows(
            v, theta, geom, gather_method=gmethod, at_src=at_src, at_dst=at_dst
        )
        p_joule = _psum(jnp.sum((p_f + p_t) * lm))
        # sign conventions of the unfused paper path: flows INTO the line
        p_from, p_to = -p_f, -p_t  # imbalance subtracts line draw
        q_from, q_to = -q_f, -q_t

    # ---- paired scatters: (E,2) blocks halve the scatter count ----
    lm_col = lm[:, None] if line_mask is not None else 1.0
    if reference_parity:
        from_pair = jnp.stack([p_from, q_from], axis=1) * lm_col  # @ dst
        to_pair = jnp.stack([p_to, q_to], axis=1) * lm_col  # @ src
        agg_dst = _psum(segsum_dst(from_pair))
        agg_src = _psum(segsum_src(to_pair))
        p_sum = agg_dst[:, 0] + agg_src[:, 0]
        q_sum = agg_dst[:, 1] + agg_src[:, 1]
    elif stacked:
        # ONE (N, 2E+G) incidence contraction computes the active/reactive
        # mismatch sums AND the per-bus generator injection together: the
        # generator rows ride along with q-column 0, so col0 of the result
        # is p_sum + pg_bus (exactly the combination delta_p needs) and
        # col1 is q_sum. One MXU matmul forward + one transposed matmul in
        # the VJP replace the former three (two edge sides + gens). The
        # lambda dispatch needs p_joule first, so pg_new is computed just
        # below and the aggregation is deferred until after it.
        from_pair = jnp.stack([p_from, q_from], axis=1) * lm_col  # @ src side
        to_pair = jnp.stack([p_to, q_to], axis=1) * lm_col  # @ dst side
    else:
        from_pair = jnp.stack([p_from, q_from], axis=1) * lm_col  # @ src side
        to_pair = jnp.stack([p_to, q_to], axis=1) * lm_col  # @ dst side
        agg_src = _psum(segsum_src(from_pair))
        agg_dst = _psum(segsum_dst(to_pair))
        p_sum = agg_src[:, 0] + agg_dst[:, 0]
        q_sum = agg_src[:, 1] + agg_dst[:, 1]

    # ---- global active compensation (main.py:45-57) ----
    if dispatch == "setpoint_slack":
        # NR convention: generators hold their set-points; the slack bus
        # absorbs losses + imbalance (its delta_p is masked out below), so
        # the scalar lambda redispatch is skipped entirely.
        pg_new = gens[:, GEN["Pg_set"]]
        if gen_mask is not None:
            pg_new = pg_new * gen_mask
    else:
        pdm = pd * bus_mask if bus_mask is not None else pd
        v2m = v2 * bus_mask if bus_mask is not None else v2
        p_global = pdm.sum() + jnp.sum(v2m * gs) + p_joule
        pg_new = _lambda_dispatch(p_global, gens, gen_mask)

    pg = pg_new * gen_mask if gen_mask is not None else pg_new
    if not reference_parity and stacked:
        # Deferred stacked aggregation (see above): generator injections
        # join the edge mismatch rows in one (N, 2E+G) contraction.
        gen_rows = jnp.stack([pg, jnp.zeros_like(pg)], axis=1)
        idx_all = jnp.concatenate([src, dst, gen_bus_ids])
        rows = jnp.concatenate([from_pair, to_pair, gen_rows], axis=0)
        agg = segment_sum(rows, idx_all, n, method=method)
        q_sum = agg[:, 1]
        delta_p = agg[:, 0] - pd - gs * v2  # col0 = p_sum + pg_bus
    else:
        pg_bus = segsum_gen(pg)
        delta_p = pg_bus - pd - gs * v2 + p_sum

    # reactive set-point: qg_new = Qd - Bs v^2 - (reactive line sums)
    qg_start = qd - bs * v2
    qg_new = qg_start - q_sum
    if qg_gen_only:
        # Paper PV/PQ split: only buses hosting a generator provide
        # reactive compensation; load buses keep qg = 0, so delta_q there
        # is a live residual anchoring |v| (fixes quirk Q8 / ROADMAP #6).
        if gen_bus_mask is None:
            ones = gen_mask if gen_mask is not None else jnp.ones(gens.shape[0])
            gen_bus_mask = (segsum_gen(ones) > 0).astype(qg_new.dtype)
        qg_new = qg_new * gen_bus_mask
    if dispatch == "setpoint_slack":
        if slack_mask is None:
            slack_mask = (
                buses[:, BUS["type"]] == BUS_TYPE_SLACK
            ).astype(delta_p.dtype)
        delta_p = delta_p * (1.0 - slack_mask)

    # delta_q = (qg_new - Qd + Bs v^2) + q_sum == 0 by construction when
    # qg_new is unmasked (the same q_sum enters both terms — quirk Q8);
    # keep the explicit form so float noise matches the reference's
    # 1e-6-scale values rather than exact zeros. With qg_gen_only the
    # load-bus rows carry the real reactive mismatch.
    delta_q = (qg_new - qd + bs * v2) + q_sum

    if bus_mask is not None:
        qg_new = qg_new * bus_mask
        delta_p = delta_p * bus_mask
        delta_q = delta_q * bus_mask
    return pg_new, qg_new, delta_p, delta_q
