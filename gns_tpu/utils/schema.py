"""Column schemas for the three grid tensors.

The framework represents one power grid as three dense float32 arrays:

  buses      (N, 6)  — bus_i, type, Pd, Qd, Gs, Bs
  lines      (E, 7)  — f_bus, t_bus, r, x, b, tau, theta_shift
  generators (G, 7)  — bus_i, Pmax, Pmin, Pg_set, vg, qg, Pg

This mirrors the reference schema (reference: GNS/utils.py:4-13, `get_BLG`)
so that grids prepared by either side are interchangeable. Bus numbering in
the *data* is 1-based (MATPOWER convention); every consumer converts to
0-based indices at the use site.
"""

from __future__ import annotations

from types import MappingProxyType

# Immutable column-index maps. Names match the reference exactly.
BUS = MappingProxyType(
    {"bus_i": 0, "type": 1, "Pd": 2, "Qd": 3, "Gs": 4, "Bs": 5}
)
LINE = MappingProxyType(
    {"f_bus": 0, "t_bus": 1, "r": 2, "x": 3, "b": 4, "tau": 5, "theta": 6}
)
GEN = MappingProxyType(
    {"bus_i": 0, "Pmax": 1, "Pmin": 2, "Pg_set": 3, "vg": 4, "qg": 5, "Pg": 6}
)

# Number of per-line features fed to the neural message function phi:
# columns 2: of the lines array, i.e. (r, x, b, tau, theta_shift).
N_LINE_FEATURES = 5

# MATPOWER bus-type codes (bus column 1).
BUS_TYPE_PQ = 1
BUS_TYPE_PV = 2
BUS_TYPE_SLACK = 3


def get_BLG():
    """Return the (B, L, G) column-index dicts.

    Provided for API familiarity with the reference (GNS/utils.py:4-13);
    new code should import the module-level BUS/LINE/GEN constants.
    """
    return dict(BUS), dict(LINE), dict(GEN)
