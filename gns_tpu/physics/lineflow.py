"""Active line-flow metric op.

P_line = (1/x) * V_src * V_dst * sin(theta_src - theta_dst) per line — the
simplified (lossless, tap-free) flow the reference uses as its evaluation
metric (reference: GNS/evaluate.py:15-18).
"""

from __future__ import annotations

import jax.numpy as jnp

from gns_tpu.utils.schema import LINE


def active_line_flow(v, theta, lines):
    """v/theta (N,), lines (E,7) -> per-line active flow (E,)."""
    src = lines[:, LINE["f_bus"]].astype(jnp.int32) - 1
    dst = lines[:, LINE["t_bus"]].astype(jnp.int32) - 1
    x = lines[:, LINE["x"]]
    return (1.0 / x) * v[src] * v[dst] * jnp.sin(theta[src] - theta[dst])
