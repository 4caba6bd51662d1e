"""Shared per-edge quantities for the physics ops.

Pure jnp, single-grid shapes: v/theta (N,), buses (N,6), lines (E,7),
gens (G,7). Batch dimensions come from `jax.vmap` at the model layer.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax.numpy as jnp

from gns_tpu.utils.schema import BUS, GEN, LINE


class EdgeGeom(NamedTuple):
    """Per-line electrical quantities, all shape (E,)."""

    src: jnp.ndarray  # 0-based from-bus index, int32
    dst: jnp.ndarray  # 0-based to-bus index, int32
    y: jnp.ndarray  # admittance magnitude 1/sqrt(r^2+x^2) (reference main.py:38)
    g: jnp.ndarray  # series conductance  r/(r^2+x^2)
    b_series: jnp.ndarray  # series susceptance -x/(r^2+x^2)
    b_chg: jnp.ndarray  # total line charging susceptance (line col 'b')
    tau: jnp.ndarray  # tap ratio (0 already mapped to 1 in data prep)
    shift: jnp.ndarray  # phase shift, radians


def edge_geometry(lines, src=None, dst=None) -> EdgeGeom:
    """Per-line quantities; src/dst override the bus indices derived from
    `lines` (used by the shared-topology fast path, where the index arrays
    are batch-invariant constants rather than per-grid data)."""
    if src is None:
        src = lines[:, LINE["f_bus"]].astype(jnp.int32) - 1
    if dst is None:
        dst = lines[:, LINE["t_bus"]].astype(jnp.int32) - 1
    r = lines[:, LINE["r"]]
    x = lines[:, LINE["x"]]
    z2 = r * r + x * x
    y = 1.0 / jnp.sqrt(z2)
    return EdgeGeom(
        src=src,
        dst=dst,
        y=y,
        g=r / z2,
        b_series=-x / z2,
        b_chg=lines[:, LINE["b"]],
        tau=lines[:, LINE["tau"]],
        shift=lines[:, LINE["theta"]],
    )


def ones_mask(n: int, dtype=jnp.float32):
    return jnp.ones((n,), dtype=dtype)


def branch_flows(v, theta, geom: EdgeGeom, gather_method: str = "take",
                 at_src=None, at_dst=None):
    """Textbook AC branch power flows (paper-correct mode).

    Returns per-line (p_f, q_f, p_t, q_t): active/reactive power flowing
    *into the line* at the from- and to-side, for a branch with series
    admittance g + j b, charging b_chg, tap tau (from side) and shift.
    Used when `reference_parity=False`; the parity mode reproduces the
    reference's formulas verbatim instead (see compensation.py/imbalance.py).
    gather_method='onehot' keeps the bus->edge gathers' VJPs scatter-free
    on TPU (ops/segment.py gather).

    at_src/at_dst: optional precomputed (E,2) [v, theta] gathers at the
    from-/to-bus — the fused physics path stacks both sides into ONE
    (2E,2) gather (physics/fused.py) and passes the halves here.
    """
    from gns_tpu.ops.segment import gather

    # One (N,2) gather for v and theta instead of four vector gathers.
    if at_src is None or at_dst is None:
        vth = jnp.stack([v, theta], axis=1)
        at_src = gather(vth, geom.src, method=gather_method)
        at_dst = gather(vth, geom.dst, method=gather_method)
    vf = at_src[:, 0] / geom.tau
    vt = at_dst[:, 0]
    th = at_src[:, 1] - at_dst[:, 1] - geom.shift
    c, s = jnp.cos(th), jnp.sin(th)
    g, b = geom.g, geom.b_series
    bc2 = geom.b_chg / 2.0
    p_f = vf * vf * g - vf * vt * (g * c + b * s)
    q_f = -vf * vf * (b + bc2) - vf * vt * (g * s - b * c)
    p_t = vt * vt * g - vf * vt * (g * c - b * s)
    q_t = -vt * vt * (b + bc2) + vf * vt * (g * s + b * c)
    return p_f, q_f, p_t, q_t


def bus_injections(v, buses, gens, pg, qg_bus, gen_mask: Optional[jnp.ndarray]):
    """(P_inj, Q_inj) per bus given per-gen active pg (G,) and per-bus qg (N,)."""
    from gns_tpu.ops import segment_sum

    n = buses.shape[0]
    gen_bus = gens[:, GEN["bus_i"]].astype(jnp.int32) - 1
    if gen_mask is not None:
        pg = pg * gen_mask
    pg_bus = segment_sum(pg, gen_bus, n)
    v2 = v * v
    p_inj = pg_bus - buses[:, BUS["Pd"]] - buses[:, BUS["Gs"]] * v2
    q_inj = qg_bus - buses[:, BUS["Qd"]] + buses[:, BUS["Bs"]] * v2
    return p_inj, q_inj
