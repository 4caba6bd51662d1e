"""Local power imbalance: the per-bus physics residual (the loss signal).

delta_p/delta_q (N,) are the active/reactive power mismatches at every bus:
scattered generation minus load and shunt, plus the directed line-flow sums
(reference: GNS/main.py:80-104). The squared residual summed over buses is
the model's unsupervised training loss (main.py:198).

Modes as in compensation.py: `reference_parity=True` reproduces the
reference's exact gather pattern (quirks Q2/Q4); False uses textbook flows.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from gns_tpu.ops import segment_sum
from gns_tpu.physics.common import branch_flows, edge_geometry
from gns_tpu.utils.schema import BUS, BUS_TYPE_SLACK, GEN


def local_power_imbalance(
    v,
    theta,
    buses,
    lines,
    gens,
    pg_k,
    qg_k,
    *,
    reference_parity: bool = True,
    bus_mask: Optional[jnp.ndarray] = None,
    line_mask: Optional[jnp.ndarray] = None,
    gen_mask: Optional[jnp.ndarray] = None,
    method: str = "auto",
    edge_axis: Optional[str] = None,
    zero_slack_dp: bool = False,
):
    """Return (delta_p (N,), delta_q (N,)) for generator outputs pg_k (G,),
    per-bus reactive generation qg_k (N,). See compensation.py for
    edge_axis semantics (edge-partitioned execution).

    zero_slack_dp: mask delta_p at the slack bus (type 3) — NR's
    convention, where the slack absorbs the active imbalance; pair with
    global_active_compensation(dispatch="setpoint_slack")."""
    if edge_axis is not None and reference_parity:
        raise ValueError("edge-partitioned execution requires reference_parity=False")

    def _psum(x):
        return jax.lax.psum(x, edge_axis) if edge_axis is not None else x
    n = buses.shape[0]
    geom = edge_geometry(lines)
    src, dst = geom.src, geom.dst
    lm = line_mask if line_mask is not None else 1.0

    gen_bus = gens[:, GEN["bus_i"]].astype(jnp.int32) - 1
    pg = pg_k * gen_mask if gen_mask is not None else pg_k
    pg_bus = segment_sum(pg, gen_bus, n, method=method)

    v2 = v * v
    delta_p_start = pg_bus - buses[:, BUS["Pd"]] - buses[:, BUS["Gs"]] * v2
    delta_q_start = qg_k - buses[:, BUS["Qd"]] + buses[:, BUS["Bs"]] * v2

    if reference_parity:
        # Q2 gathers: per-line arrays indexed by bus ids (main.py:91-99).
        delta = theta[src] - theta[dst]
        delta_ji = theta[dst] - theta[src]
        y_s, d_s = geom.y[src], delta[src]
        tau_s, sh_s = geom.tau[src], geom.shift[src]
        b_s = geom.b_chg[src]
        y_d, dj_d = geom.y[dst], delta_ji[dst]
        tau_d, sh_d = geom.tau[dst], geom.shift[dst]
        b_d = geom.b_chg[dst]

        p_msg_from = (
            v[src] * v[dst] * y_s / tau_s
            * jnp.sin(theta[src] - theta[dst] - d_s - sh_s)
            + (v[src] / tau_s) ** 2 * y_s * jnp.sin(d_s)
        )
        p_msg_to = (
            v[dst] * v[src] * y_d / tau_d
            * jnp.sin(theta[dst] - theta[src] - dj_d - sh_d)
            + v[dst] ** 2 * y_d * jnp.sin(dj_d)
        )
        p_sum = segment_sum(p_msg_from * lm, dst, n, method=method) + segment_sum(
            p_msg_to * lm, src, n, method=method
        )
        delta_p = delta_p_start + p_sum

        q_msg_from = (
            -v[src] * v[dst] * y_s / tau_s
            * jnp.cos(theta[src] - theta[dst] - d_s - sh_s)
            + (v[src] / tau_s) ** 2 * (y_s * jnp.cos(d_s) - b_s / 2.0)
        )
        # Q4 again: sin on the to-side (main.py:99, author's own doubt).
        q_msg_to = (
            -v[dst] * v[src] * y_d / tau_d
            * jnp.cos(theta[dst] - theta[src] - dj_d - sh_d)
            + v[dst] ** 2 * (y_d * jnp.sin(dj_d) - b_d / 2.0)
        )
        q_sum = segment_sum(q_msg_from * lm, dst, n, method=method) + segment_sum(
            q_msg_to * lm, src, n, method=method
        )
        delta_q = delta_q_start + q_sum
    else:
        p_f, q_f, p_t, q_t = branch_flows(v, theta, geom)
        delta_p = delta_p_start - _psum(
            segment_sum(p_f * lm, src, n, method=method)
            + segment_sum(p_t * lm, dst, n, method=method)
        )
        delta_q = delta_q_start - _psum(
            segment_sum(q_f * lm, src, n, method=method)
            + segment_sum(q_t * lm, dst, n, method=method)
        )

    if zero_slack_dp:
        if reference_parity:
            raise ValueError("zero_slack_dp is a paper-mode option")
        delta_p = delta_p * (
            buses[:, BUS["type"]] != BUS_TYPE_SLACK
        ).astype(delta_p.dtype)

    if bus_mask is not None:
        delta_p = delta_p * bus_mask
        delta_q = delta_q * bus_mask
    return delta_p, delta_q
