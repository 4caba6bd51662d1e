"""Global active compensation: slack redispatch + reactive set-points.

Computes, for the current (v, theta) iterate:
  * Pg_new (G,): generator active outputs redistributed so total generation
    covers load + shunt + Joule losses, via the scalar dispatch factor
    lambda (paper eqs. (20)-(21); reference: GNS/main.py:34-78).
  * qg_new (N,): per-bus reactive generation that would zero the local
    reactive mismatch given the line reactive flows.

Two modes:
  * reference_parity=True — byte-faithful transcription of the reference's
    exact gather pattern, including quirk Q2 (per-line arrays y/delta/tau/
    shift/b indexed by *bus* ids; reference main.py:41,68-72) and quirk Q4
    (the to-side reactive message uses sin where the from-side uses cos;
    main.py:70-72). This is the contract for activation-parity tests.
  * reference_parity=False — textbook AC branch flows (physics/common.py).

The data-dependent scalar branches of the reference (main.py:47-57, quirk
Q5) become jnp.where so the function stays jit/vmap compatible.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp

import jax

from gns_tpu.ops import segment_sum
from gns_tpu.physics.common import branch_flows, edge_geometry
from gns_tpu.utils.schema import BUS, GEN


def _lambda_dispatch(p_global, gens, gen_mask):
    """Scalar dispatch factor and Pg_new (reference: GNS/main.py:47-57)."""
    pg_set = gens[:, GEN["Pg_set"]]
    pmin = gens[:, GEN["Pmin"]]
    pmax = gens[:, GEN["Pmax"]]
    if gen_mask is not None:
        pg_set, pmin, pmax = pg_set * gen_mask, pmin * gen_mask, pmax * gen_mask
    s_set, s_min, s_max = pg_set.sum(), pmin.sum(), pmax.sum()

    lam_lo = (p_global - s_min) / (2.0 * (s_set - s_min))
    lam_hi = (p_global - 2.0 * s_set + s_max) / (2.0 * (s_max - s_set))
    lam = jnp.where(p_global < s_set, lam_lo, lam_hi)

    pg_lo = pmin + 2.0 * (pg_set - pmin) * lam
    pg_hi = 2.0 * pg_set - pmax + 2.0 * (pmax - pg_set) * lam
    pg_new = jnp.where(lam < 0.5, pg_lo, pg_hi)
    if gen_mask is not None:
        pg_new = pg_new * gen_mask
    return pg_new


def global_active_compensation(
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
    qg_gen_only: bool = False,
    dispatch: str = "lambda",
):
    """Return (Pg_new (G,), qg_new (N,)). See module docstring.

    qg_gen_only / dispatch: paper-mode conventions (utils/config.py) —
    qg_gen_only masks the reactive set-point to generator buses (the
    paper's PV/PQ split; fixes quirk Q8's cancelling delta_q);
    dispatch="setpoint_slack" keeps generators at their set-points (NR's
    convention; pair with local_power_imbalance(zero_slack_dp=True)).

    edge_axis: mesh axis name over which the edge (line) set is sharded —
    inside shard_map, per-bus aggregates and scalar line sums become local
    partials that are psum'ed over this axis (the boundary exchange of the
    edge-partitioned execution; requires reference_parity=False because
    quirk Q2's bus-id gathers into per-line arrays are only defined on the
    unpartitioned edge set).
    """
    if edge_axis is not None and reference_parity:
        raise ValueError("edge-partitioned execution requires reference_parity=False")
    if reference_parity and (qg_gen_only or dispatch != "lambda"):
        raise ValueError(
            "qg_gen_only / dispatch='setpoint_slack' are paper-mode options "
            "(reference_parity=False)"
        )
    if dispatch not in ("lambda", "setpoint_slack"):
        raise ValueError(f"dispatch must be lambda/setpoint_slack, got {dispatch!r}")

    def _psum(x):
        return jax.lax.psum(x, edge_axis) if edge_axis is not None else x
    n = buses.shape[0]
    geom = edge_geometry(lines)
    src, dst = geom.src, geom.dst
    lm = line_mask if line_mask is not None else 1.0

    if reference_parity:
        # --- active: Joule-loss proxy message (reference main.py:38-43) ---
        # NOTE Q2: y/delta/tau/shift are (E,) per-LINE arrays but the
        # reference indexes them with BUS indices; replicated verbatim.
        delta = theta[src] - theta[dst]  # (E,)
        y_s, d_s = geom.y[src], delta[src]
        tau_s, sh_s = geom.tau[src], geom.shift[src]
        msg = jnp.abs(
            v[src] * v[dst] * y_s / tau_s
            * (
                jnp.sin(theta[src] - theta[dst] - d_s - sh_s)
                + jnp.sin(theta[dst] - theta[src] - d_s + sh_s)
            )
            + (v[src] / tau_s**2) * y_s * jnp.sin(d_s)
            + v[dst] ** 2 * y_s * jnp.sin(d_s)
        )
        p_joule = jnp.sum(msg * lm)
    else:
        p_f, _, p_t, _ = branch_flows(v, theta, geom)
        p_joule = _psum(jnp.sum((p_f + p_t) * lm))

    v2 = v * v
    pd = buses[:, BUS["Pd"]]
    gs = buses[:, BUS["Gs"]]
    if bus_mask is not None:
        pd, v2m = pd * bus_mask, v2 * bus_mask
    else:
        v2m = v2
    p_global = pd.sum() + jnp.sum(v2m * gs) + p_joule

    if dispatch == "setpoint_slack":
        pg_new = gens[:, GEN["Pg_set"]]
        if gen_mask is not None:
            pg_new = pg_new * gen_mask
    else:
        pg_new = _lambda_dispatch(p_global, gens, gen_mask)

    # --- reactive set-points (reference main.py:64-76) ---
    qg_start = buses[:, BUS["Qd"]] - buses[:, BUS["Bs"]] * v2

    if reference_parity:
        delta = theta[src] - theta[dst]
        delta_ji = theta[dst] - theta[src]
        y_s, d_s = geom.y[src], delta[src]
        tau_s, sh_s = geom.tau[src], geom.shift[src]
        b_s = geom.b_chg[src]
        y_d, dj_d = geom.y[dst], delta_ji[dst]
        tau_d, sh_d = geom.tau[dst], geom.shift[dst]
        b_d = geom.b_chg[dst]
        msg_from = (
            -v[src] * v[dst] * y_s / tau_s
            * jnp.cos(theta[src] - theta[dst] - d_s - sh_s)
            + (v[src] / tau_s) ** 2 * (y_s * jnp.cos(d_s) - b_s / 2.0)
        )
        # Q4: the to-side uses sin where from-side uses cos (main.py:70-72).
        msg_to = (
            -v[dst] * v[src] * y_d / tau_d
            * jnp.cos(theta[dst] - theta[src] - dj_d - sh_d)
            + v[dst] ** 2 * (y_d * jnp.sin(dj_d) - b_d / 2.0)
        )
        aggr_from = segment_sum(msg_from * lm, dst, n, method=method)
        aggr_to = segment_sum(msg_to * lm, src, n, method=method)
        qg_new = qg_start - aggr_from - aggr_to
    else:
        _, q_f, _, q_t = branch_flows(v, theta, geom)
        q_at_bus = _psum(
            segment_sum(q_f * lm, src, n, method=method)
            + segment_sum(q_t * lm, dst, n, method=method)
        )
        qg_new = qg_start + q_at_bus

    if qg_gen_only:
        gen_bus = gens[:, GEN["bus_i"]].astype(jnp.int32) - 1
        ones = gen_mask if gen_mask is not None else jnp.ones(gens.shape[0])
        gen_bus_mask = segment_sum(ones, gen_bus, n, method=method) > 0
        qg_new = qg_new * gen_bus_mask.astype(qg_new.dtype)

    if bus_mask is not None:
        qg_new = qg_new * bus_mask
    return pg_new, qg_new
