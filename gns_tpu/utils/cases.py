"""Base MATPOWER-style case tables.

The reference obtains base grids from `pypower.api.case{9,14,30,118,300}`
(reference: GNS/augment_grids.py:1,8). pypower is not available in this
environment (zero egress), so the framework ships its own case sources:

  * case9  — the standard WSCC 9-bus system, embedded below.
  * case14 — the IEEE 14-bus system, shipped as an .npz asset extracted from
    the reference's unaugmented `augmented_case14_0.pkl` (pure data).
  * case30 — the canonical IEEE 30-bus test system, embedded below,
    reconstructed from the widely published 1962 AEP data (the same network
    behind pypower/MATPOWER `case_ieee30`/`case30`) and VERIFIED in this
    environment: our Newton-Raphson oracle converges on it in 4 iterations
    from flat start and reproduces the canonically published solution —
    total system losses 17.557 MW (the textbook IEEE 30-bus figure), slack
    generation 260.96 MW, and the published voltage profile (e.g. bus 30 at
    0.992 p.u.). A subtly wrong impedance anywhere in the table would move
    that loss figure; matching it to all published digits is a whole-table
    checksum. `tools/verify_case30.py` re-runs the check. Note pypower's
    `case30` module ships the Alsac-Stott OPF *dispatch* variant of this
    network (different generator placement/loads, unverifiable here); the
    canonical IEEE network with its published power-flow solution is the
    variant that CAN be verified, so it is the one we ship.
  * case118 — the IEEE 118-bus system, embedded below, reconstructed from
    the canonical pypower/MATPOWER table and verified against its
    published solution (tools/verify_case118.py): load totals and the
    generation checksum exact, flat-start NR reproduces the published
    voltage profile to rms 6e-4 p.u. / 0.17 deg, voltage extremes and
    total reactive generation match. One quantified residual: losses
    132.67 vs ~132.86 MW published (0.15%) — see `_case118.__doc__`.
  * case300 — a deterministic synthetic grid with exactly the
    bus/branch/gen counts of the real IEEE case300 (300/411/69
    per reference GNS/utils.py:45-56): a radial spanning tree plus
    chord branches with realistic parameter ranges, built so that
    Newton-Raphson converges on it. It is a stand-in for benchmarking
    and end-to-end testing, not the historical IEEE data.

    Why not embed the real case300 too? In a zero-egress environment a
    hand-reconstructed table is only shippable if it can be VERIFIED
    against published figures (the loss-figure checksum for case30, the
    solved-profile + load/generation checksums for case118). The 300-bus
    table (411 branches, 69 generators, multiple voltage levels, area
    interchange) has no equally strong independently-rememberable
    published profile to check against here, and data silently labeled
    "IEEE case300" that is subtly wrong is strictly worse than a
    correctly labeled stand-in: every downstream accuracy number would
    inherit an unverifiable claim. The stand-in is therefore loudly
    labeled here, in README.md and in every ACCURACY.md table
    (footnoted), and swapping in an authentic table later is a pure data
    change: any pypower-format case dict (or pickle in the reference's
    layout) drops into `load_case` / `prepare_case` unchanged — case14
    already ships exactly that way.

A case is a dict with the pypower case-dict layout (version, baseMVA, bus,
gen, branch, gencost) so pickles produced here are drop-in compatible with
the reference's data directory format (SURVEY.md C17).
"""

from __future__ import annotations

import os
from typing import Dict

import numpy as np

_ASSET_DIR = os.path.join(os.path.dirname(__file__), "case_assets")

# Case sizes: case_nr -> (n_bus, n_branch, n_gen).
# (reference: GNS/utils.py:45-56 for 14/30/118/300; pypower case9 for 9.)
CASE_SIZES = {
    9: (9, 9, 3),
    14: (14, 20, 5),
    30: (30, 41, 6),
    118: (118, 186, 54),
    300: (300, 411, 69),
}


def _case9() -> Dict:
    """WSCC 9-bus, 3-generator system (same data as pypower's case9).

    The reference README/augment mention case9 but its loader cannot load it
    (reference: GNS/utils.py:45-56 misses the case, SURVEY.md Q7); this
    framework supports it as BASELINE.json config #2 requires.
    """
    baseMVA = 100.0
    # bus_i type Pd Qd Gs Bs area Vm Va baseKV zone Vmax Vmin
    bus = np.array(
        [
            [1, 3, 0, 0, 0, 0, 1, 1, 0, 345, 1, 1.1, 0.9],
            [2, 2, 0, 0, 0, 0, 1, 1, 0, 345, 1, 1.1, 0.9],
            [3, 2, 0, 0, 0, 0, 1, 1, 0, 345, 1, 1.1, 0.9],
            [4, 1, 0, 0, 0, 0, 1, 1, 0, 345, 1, 1.1, 0.9],
            [5, 1, 90, 30, 0, 0, 1, 1, 0, 345, 1, 1.1, 0.9],
            [6, 1, 0, 0, 0, 0, 1, 1, 0, 345, 1, 1.1, 0.9],
            [7, 1, 100, 35, 0, 0, 1, 1, 0, 345, 1, 1.1, 0.9],
            [8, 1, 0, 0, 0, 0, 1, 1, 0, 345, 1, 1.1, 0.9],
            [9, 1, 125, 50, 0, 0, 1, 1, 0, 345, 1, 1.1, 0.9],
        ],
        dtype=np.float64,
    )
    # bus Pg Qg Qmax Qmin Vg mBase status Pmax Pmin (then 11 zero cols)
    gen = np.zeros((3, 21), dtype=np.float64)
    gen[:, :10] = np.array(
        [
            [1, 72.3, 27.03, 300, -300, 1.040, 100, 1, 250, 10],
            [2, 163.0, 6.54, 300, -300, 1.025, 100, 1, 300, 10],
            [3, 85.0, -10.95, 300, -300, 1.025, 100, 1, 270, 10],
        ],
        dtype=np.float64,
    )
    # f t r x b rateA rateB rateC tau shift status angmin angmax
    branch = np.zeros((9, 13), dtype=np.float64)
    branch[:, :5] = np.array(
        [
            [1, 4, 0.0, 0.0576, 0.0],
            [4, 5, 0.017, 0.092, 0.158],
            [5, 6, 0.039, 0.17, 0.358],
            [3, 6, 0.0, 0.0586, 0.0],
            [6, 7, 0.0119, 0.1008, 0.209],
            [7, 8, 0.0085, 0.072, 0.149],
            [8, 2, 0.0, 0.0625, 0.0],
            [8, 9, 0.032, 0.161, 0.306],
            [9, 4, 0.01, 0.085, 0.176],
        ],
        dtype=np.float64,
    )
    # published MVA ratings (pypower case9 rateA, same branch order);
    # consumed by the flow-violation screens (eval/contingency.py)
    branch[:, 5:8] = np.array(
        [250, 250, 150, 300, 150, 250, 250, 250, 250], dtype=np.float64
    )[:, None]
    branch[:, 10] = 1.0  # status
    branch[:, 11] = -360.0
    branch[:, 12] = 360.0
    gencost = np.tile(
        np.array([2, 1500, 0, 3, 0.11, 5, 150], dtype=np.float64), (3, 1)
    )
    return {
        "version": "2",
        "baseMVA": baseMVA,
        "bus": bus,
        "gen": gen,
        "branch": branch,
        "gencost": gencost,
    }


# The canonical IEEE 30-bus test system (see module docstring for
# provenance + verification). Columns: bus_i, type, Pd, Qd, Gs, Bs.
_CASE30_BUS = [
    (1, 3, 0.0, 0.0, 0.0, 0.0),
    (2, 2, 21.7, 12.7, 0.0, 0.0),
    (3, 1, 2.4, 1.2, 0.0, 0.0),
    (4, 1, 7.6, 1.6, 0.0, 0.0),
    (5, 2, 94.2, 19.0, 0.0, 0.0),
    (6, 1, 0.0, 0.0, 0.0, 0.0),
    (7, 1, 22.8, 10.9, 0.0, 0.0),
    (8, 2, 30.0, 30.0, 0.0, 0.0),
    (9, 1, 0.0, 0.0, 0.0, 0.0),
    (10, 1, 5.8, 2.0, 0.0, 19.0),
    (11, 2, 0.0, 0.0, 0.0, 0.0),
    (12, 1, 11.2, 7.5, 0.0, 0.0),
    (13, 2, 0.0, 0.0, 0.0, 0.0),
    (14, 1, 6.2, 1.6, 0.0, 0.0),
    (15, 1, 8.2, 2.5, 0.0, 0.0),
    (16, 1, 3.5, 1.8, 0.0, 0.0),
    (17, 1, 9.0, 5.8, 0.0, 0.0),
    (18, 1, 3.2, 0.9, 0.0, 0.0),
    (19, 1, 9.5, 3.4, 0.0, 0.0),
    (20, 1, 2.2, 0.7, 0.0, 0.0),
    (21, 1, 17.5, 11.2, 0.0, 0.0),
    (22, 1, 0.0, 0.0, 0.0, 0.0),
    (23, 1, 3.2, 1.6, 0.0, 0.0),
    (24, 1, 8.7, 6.7, 0.0, 4.3),
    (25, 1, 0.0, 0.0, 0.0, 0.0),
    (26, 1, 3.5, 2.3, 0.0, 0.0),
    (27, 1, 0.0, 0.0, 0.0, 0.0),
    (28, 1, 0.0, 0.0, 0.0, 0.0),
    (29, 1, 2.4, 0.9, 0.0, 0.0),
    (30, 1, 10.6, 1.9, 0.0, 0.0),
]
# Columns: bus, Pg, Qg, Qmax, Qmin, Vg (published generator data; buses
# 5/8/11/13 are synchronous condensers in the original system).
_CASE30_GEN = [
    (1, 260.2, -16.1, 10.0, 0.0, 1.06),
    (2, 40.0, 50.0, 50.0, -40.0, 1.045),
    (5, 0.0, 37.0, 40.0, -40.0, 1.01),
    (8, 0.0, 37.3, 40.0, -10.0, 1.01),
    (11, 0.0, 16.2, 24.0, -6.0, 1.082),
    (13, 0.0, 10.6, 24.0, -6.0, 1.071),
]
# Columns: f, t, r, x, b (total line charging), tap (0 == nominal).
_CASE30_BRANCH = [
    (1, 2, 0.0192, 0.0575, 0.0528, 0),
    (1, 3, 0.0452, 0.1652, 0.0408, 0),
    (2, 4, 0.0570, 0.1737, 0.0368, 0),
    (3, 4, 0.0132, 0.0379, 0.0084, 0),
    (2, 5, 0.0472, 0.1983, 0.0418, 0),
    (2, 6, 0.0581, 0.1763, 0.0374, 0),
    (4, 6, 0.0119, 0.0414, 0.0090, 0),
    (5, 7, 0.0460, 0.1160, 0.0204, 0),
    (6, 7, 0.0267, 0.0820, 0.0170, 0),
    (6, 8, 0.0120, 0.0420, 0.0090, 0),
    (6, 9, 0.0, 0.2080, 0.0, 0.978),
    (6, 10, 0.0, 0.5560, 0.0, 0.969),
    (9, 11, 0.0, 0.2080, 0.0, 0),
    (9, 10, 0.0, 0.1100, 0.0, 0),
    (4, 12, 0.0, 0.2560, 0.0, 0.932),
    (12, 13, 0.0, 0.1400, 0.0, 0),
    (12, 14, 0.1231, 0.2559, 0.0, 0),
    (12, 15, 0.0662, 0.1304, 0.0, 0),
    (12, 16, 0.0945, 0.1987, 0.0, 0),
    (14, 15, 0.2210, 0.1997, 0.0, 0),
    (16, 17, 0.0524, 0.1923, 0.0, 0),
    (15, 18, 0.1073, 0.2185, 0.0, 0),
    (18, 19, 0.0639, 0.1292, 0.0, 0),
    (19, 20, 0.0340, 0.0680, 0.0, 0),
    (10, 20, 0.0936, 0.2090, 0.0, 0),
    (10, 17, 0.0324, 0.0845, 0.0, 0),
    (10, 21, 0.0348, 0.0749, 0.0, 0),
    (10, 22, 0.0727, 0.1499, 0.0, 0),
    (21, 22, 0.0116, 0.0236, 0.0, 0),
    (15, 23, 0.1000, 0.2020, 0.0, 0),
    (22, 24, 0.1150, 0.1790, 0.0, 0),
    (23, 24, 0.1320, 0.2700, 0.0, 0),
    (24, 25, 0.1885, 0.3292, 0.0, 0),
    (25, 26, 0.2544, 0.3800, 0.0, 0),
    (25, 27, 0.1093, 0.2087, 0.0, 0),
    (28, 27, 0.0, 0.3960, 0.0, 0.968),
    (27, 29, 0.2198, 0.4153, 0.0, 0),
    (27, 30, 0.3202, 0.6027, 0.0, 0),
    (29, 30, 0.2399, 0.4533, 0.0, 0),
    (8, 28, 0.0636, 0.2000, 0.0428, 0),
    (6, 28, 0.0169, 0.0599, 0.0130, 0),
]
# Published rateA (MVA) per branch, same order (MATPOWER case_ieee30).
_CASE30_RATE_A = [
    130, 130, 65, 130, 130, 65, 90, 70, 130, 32,
    65, 32, 65, 65, 65, 65, 32, 32, 32, 16,
    16, 16, 16, 32, 32, 32, 32, 32, 32, 16,
    16, 16, 16, 16, 16, 65, 16, 16, 16, 32,
    32,
]


def _case30() -> Dict:
    """The canonical IEEE 30-bus system (30 buses, 41 branches, 6 gens).

    Verification (tools/verify_case30.py): Newton-Raphson from flat start
    converges in 4 iterations; total losses 17.557 MW — the canonically
    published IEEE 30-bus figure — slack Pg 260.96 MW, total load 283.4 MW,
    and the published voltage profile. See the module docstring.
    """
    baseMVA = 100.0
    bus = np.zeros((30, 13), dtype=np.float64)
    for i, (bi, t, pd, qd, gs, bs) in enumerate(_CASE30_BUS):
        bus[i] = [bi, t, pd, qd, gs, bs, 1, 1.0, 0.0, 132.0, 1, 1.06, 0.94]
    gen = np.zeros((6, 21), dtype=np.float64)
    for i, (bi, pg, qg, qmax, qmin, vg) in enumerate(_CASE30_GEN):
        pmax = 360.0 if i == 0 else 140.0
        gen[i, :10] = [bi, pg, qg, qmax, qmin, vg, baseMVA, 1, pmax, 0.0]
    branch = np.zeros((41, 13), dtype=np.float64)
    for i, (f, t, r, x, b, tap) in enumerate(_CASE30_BRANCH):
        branch[i, :5] = [f, t, r, x, b]
        branch[i, 8] = tap
    # Published MVA ratings (MATPOWER case_ieee30 rateA, whose branch
    # impedances this table matches row for row) — the canonical IEEE
    # 30-bus limits, the data flow-violation screening ranks against
    # (eval/contingency.py flow_violations; round-4 VERDICT task 4).
    # case14/case118 publish no meaningful limits (pypower ships 9900 =
    # effectively unlimited) and keep that convention.
    branch[:, 5:8] = np.array(_CASE30_RATE_A, dtype=np.float64)[:, None]
    branch[:, 10] = 1.0
    branch[:, 11] = -360.0
    branch[:, 12] = 360.0
    gencost = np.tile(
        np.array([2, 0, 0, 3, 0.01, 40, 0], dtype=np.float64), (6, 1)
    )
    return {
        "version": "2",
        "baseMVA": baseMVA,
        "bus": bus,
        "gen": gen,
        "branch": branch,
        "gencost": gencost,
    }


# IEEE 118-bus: (bus_i, type, Pd, Qd, Gs, Bs, Vm, Va). Vm/Va are the
# published solved profile exactly as pypower/MATPOWER ship them — kept
# because they are an independent verification channel (flat-start NR must
# reproduce them, tools/verify_case118.py) and because the reference's
# pipeline consumes the pypower table verbatim (GNS/augment_grids.py:8).
_CASE118_BUS = (
    (1, 2, 51, 27, 0, 0, 0.955, 10.67), (2, 1, 20, 9, 0, 0, 0.971, 11.22),
    (3, 1, 39, 10, 0, 0, 0.968, 11.56), (4, 2, 39, 12, 0, 0, 0.998, 15.28),
    (5, 1, 0, 0, 0, -40, 1.002, 15.73), (6, 2, 52, 22, 0, 0, 0.990, 13.00),
    (7, 1, 19, 2, 0, 0, 0.989, 12.56), (8, 2, 28, 0, 0, 0, 1.015, 20.77),
    (9, 1, 0, 0, 0, 0, 1.043, 28.02), (10, 2, 0, 0, 0, 0, 1.050, 35.61),
    (11, 1, 70, 23, 0, 0, 0.985, 12.72), (12, 2, 47, 10, 0, 0, 0.990, 12.20),
    (13, 1, 34, 16, 0, 0, 0.968, 11.35), (14, 1, 14, 1, 0, 0, 0.984, 11.50),
    (15, 2, 90, 30, 0, 0, 0.970, 11.23), (16, 1, 25, 10, 0, 0, 0.984, 11.91),
    (17, 1, 11, 3, 0, 0, 0.995, 13.74), (18, 2, 60, 34, 0, 0, 0.973, 11.53),
    (19, 2, 45, 25, 0, 0, 0.963, 11.05), (20, 1, 18, 3, 0, 0, 0.958, 11.93),
    (21, 1, 14, 8, 0, 0, 0.959, 13.52), (22, 1, 10, 5, 0, 0, 0.970, 16.08),
    (23, 1, 7, 3, 0, 0, 1.000, 21.00), (24, 2, 13, 0, 0, 0, 0.992, 20.89),
    (25, 2, 0, 0, 0, 0, 1.050, 27.93), (26, 2, 0, 0, 0, 0, 1.015, 29.71),
    (27, 2, 71, 13, 0, 0, 0.968, 15.35), (28, 1, 17, 7, 0, 0, 0.962, 13.62),
    (29, 1, 24, 4, 0, 0, 0.963, 12.63), (30, 1, 0, 0, 0, 0, 0.985, 18.79),
    (31, 2, 43, 27, 0, 0, 0.967, 12.75), (32, 2, 59, 23, 0, 0, 0.964, 14.80),
    (33, 1, 23, 9, 0, 0, 0.972, 10.63), (34, 2, 59, 26, 0, 14, 0.986, 11.30),
    (35, 1, 33, 9, 0, 0, 0.981, 10.87), (36, 2, 31, 17, 0, 0, 0.980, 10.87),
    (37, 1, 0, 0, 0, -25, 0.992, 11.77), (38, 1, 0, 0, 0, 0, 0.962, 16.91),
    (39, 1, 27, 11, 0, 0, 0.970, 8.41), (40, 2, 66, 23, 0, 0, 0.970, 7.35),
    (41, 1, 37, 10, 0, 0, 0.967, 6.92), (42, 2, 96, 23, 0, 0, 0.985, 8.53),
    (43, 1, 18, 7, 0, 0, 0.978, 11.28), (44, 1, 16, 8, 0, 10, 0.985, 13.82),
    (45, 1, 53, 22, 0, 10, 0.987, 15.67), (46, 2, 28, 10, 0, 10, 1.005, 18.49),
    (47, 1, 34, 0, 0, 0, 1.017, 20.73), (48, 1, 20, 11, 0, 15, 1.021, 19.93),
    (49, 2, 87, 30, 0, 0, 1.025, 20.94), (50, 1, 17, 4, 0, 0, 1.001, 18.90),
    (51, 1, 17, 8, 0, 0, 0.967, 16.28), (52, 1, 18, 5, 0, 0, 0.957, 15.32),
    (53, 1, 23, 11, 0, 0, 0.946, 14.35), (54, 2, 113, 32, 0, 0, 0.955, 15.26),
    (55, 2, 63, 22, 0, 0, 0.952, 14.97), (56, 2, 84, 18, 0, 0, 0.954, 15.16),
    (57, 1, 12, 3, 0, 0, 0.971, 16.36), (58, 1, 12, 3, 0, 0, 0.959, 15.51),
    (59, 2, 277, 113, 0, 0, 0.985, 19.37), (60, 1, 78, 3, 0, 0, 0.993, 23.15),
    (61, 2, 0, 0, 0, 0, 0.995, 24.04), (62, 2, 77, 14, 0, 0, 0.998, 23.43),
    (63, 1, 0, 0, 0, 0, 0.969, 22.75), (64, 1, 0, 0, 0, 0, 0.984, 24.52),
    (65, 2, 0, 0, 0, 0, 1.005, 27.65), (66, 2, 39, 18, 0, 0, 1.050, 27.48),
    (67, 1, 28, 7, 0, 0, 1.020, 24.84), (68, 1, 0, 0, 0, 0, 1.003, 27.55),
    (69, 3, 0, 0, 0, 0, 1.035, 30.00), (70, 2, 66, 20, 0, 0, 0.984, 22.58),
    (71, 1, 0, 0, 0, 0, 0.987, 22.15), (72, 2, 12, 0, 0, 0, 0.980, 20.98),
    (73, 2, 6, 0, 0, 0, 0.991, 21.94), (74, 2, 68, 27, 0, 12, 0.958, 21.64),
    (75, 1, 47, 11, 0, 0, 0.967, 22.91), (76, 2, 68, 36, 0, 0, 0.943, 21.77),
    (77, 2, 61, 28, 0, 0, 1.006, 26.72), (78, 1, 71, 26, 0, 0, 1.003, 26.42),
    (79, 1, 39, 32, 0, 20, 1.009, 26.72), (80, 2, 130, 26, 0, 0, 1.040, 28.96),
    (81, 1, 0, 0, 0, 0, 0.997, 28.10), (82, 1, 54, 27, 0, 20, 0.989, 27.24),
    (83, 1, 20, 10, 0, 10, 0.985, 28.42), (84, 1, 11, 7, 0, 0, 0.980, 30.95),
    (85, 2, 24, 15, 0, 0, 0.985, 32.51), (86, 1, 21, 10, 0, 0, 0.987, 31.14),
    (87, 2, 0, 0, 0, 0, 1.015, 31.40), (88, 1, 48, 10, 0, 0, 0.987, 35.64),
    (89, 2, 0, 0, 0, 0, 1.005, 39.69), (90, 2, 163, 42, 0, 0, 0.985, 33.29),
    (91, 2, 10, 0, 0, 0, 0.980, 33.31), (92, 2, 65, 10, 0, 0, 0.993, 33.80),
    (93, 1, 12, 7, 0, 0, 0.987, 30.79), (94, 1, 30, 16, 0, 0, 0.991, 28.64),
    (95, 1, 42, 31, 0, 0, 0.981, 27.67), (96, 1, 38, 15, 0, 0, 0.993, 27.51),
    (97, 1, 15, 9, 0, 0, 1.011, 27.88), (98, 1, 34, 8, 0, 0, 1.024, 27.40),
    (99, 2, 42, 0, 0, 0, 1.010, 27.04), (100, 2, 37, 18, 0, 0, 1.017, 28.03),
    (101, 1, 22, 15, 0, 0, 0.993, 29.61), (102, 1, 5, 3, 0, 0, 0.991, 32.30),
    (103, 2, 23, 16, 0, 0, 1.001, 24.44), (104, 2, 38, 25, 0, 0, 0.971, 21.69),
    (105, 2, 31, 26, 0, 20, 0.965, 20.57), (106, 1, 43, 16, 0, 0, 0.962, 20.32),
    (107, 2, 50, 12, 0, 6, 0.952, 17.53), (108, 1, 2, 1, 0, 0, 0.967, 19.38),
    (109, 1, 8, 3, 0, 0, 0.967, 18.93), (110, 2, 39, 30, 0, 6, 0.973, 18.09),
    (111, 2, 0, 0, 0, 0, 0.980, 19.74), (112, 2, 68, 13, 0, 0, 0.975, 14.99),
    (113, 2, 6, 0, 0, 0, 0.993, 13.74), (114, 1, 8, 3, 0, 0, 0.960, 14.46),
    (115, 1, 22, 7, 0, 0, 0.960, 14.46), (116, 2, 184, 0, 0, 0, 1.005, 27.12),
    (117, 1, 20, 8, 0, 0, 0.974, 10.67), (118, 1, 33, 15, 0, 0, 0.949, 21.92),
)

# (bus, Pg, Qmax, Qmin, Vg, Pmax). Non-slack Pg totals exactly 3861.0 MW —
# the published total-generation checksum (4374.9 - slack 513.9).
_CASE118_GEN = (
    (1, 0, 15, -5, 0.955, 100), (4, 0, 300, -300, 0.998, 100),
    (6, 0, 50, -13, 0.990, 100), (8, 0, 300, -300, 1.015, 100),
    (10, 450, 200, -147, 1.050, 550), (12, 85, 120, -35, 0.990, 185),
    (15, 0, 30, -10, 0.970, 100), (18, 0, 50, -16, 0.973, 100),
    (19, 0, 24, -8, 0.962, 100), (24, 0, 300, -300, 0.992, 100),
    (25, 220, 140, -47, 1.050, 320), (26, 314, 1000, -1000, 1.015, 414),
    (27, 0, 300, -300, 0.968, 100), (31, 7, 300, -300, 0.967, 107),
    (32, 0, 42, -14, 0.963, 100), (34, 0, 24, -8, 0.984, 100),
    (36, 0, 24, -8, 0.980, 100), (40, 0, 300, -300, 0.970, 100),
    (42, 0, 300, -300, 0.985, 100), (46, 19, 100, -100, 1.005, 119),
    (49, 204, 210, -85, 1.025, 304), (54, 48, 300, -300, 0.955, 148),
    (55, 0, 23, -8, 0.952, 100), (56, 0, 15, -8, 0.954, 100),
    (59, 155, 180, -60, 0.985, 255), (61, 160, 300, -100, 0.995, 260),
    (62, 0, 20, -20, 0.998, 100), (65, 391, 200, -67, 1.005, 491),
    (66, 392, 200, -67, 1.050, 492), (69, 516.4, 300, -300, 1.035, 805.2),
    (70, 0, 32, -10, 0.984, 100), (72, 0, 100, -100, 0.980, 100),
    (73, 0, 100, -100, 0.991, 100), (74, 0, 9, -6, 0.958, 100),
    (76, 0, 23, -8, 0.943, 100), (77, 0, 70, -20, 1.006, 100),
    (80, 477, 280, -165, 1.040, 577), (85, 0, 23, -8, 0.985, 100),
    (87, 4, 1000, -100, 1.015, 104), (89, 607, 300, -210, 1.005, 707),
    (90, 0, 300, -300, 0.985, 100), (91, 0, 100, -100, 0.980, 100),
    (92, 0, 9, -3, 0.990, 100), (99, 0, 100, -100, 1.010, 100),
    (100, 252, 155, -50, 1.017, 352), (103, 40, 40, -15, 1.001, 140),
    (104, 0, 23, -8, 0.971, 100), (105, 0, 23, -8, 0.965, 100),
    (107, 0, 200, -200, 0.952, 100), (110, 0, 23, -8, 0.973, 100),
    (111, 36, 1000, -100, 0.980, 136), (112, 0, 1000, -100, 0.975, 100),
    (113, 0, 200, -100, 0.993, 100), (116, 0, 1000, -1000, 1.005, 100),
)

# (f, t, r, x, b, ratio) — ratio 0 means a line (tau -> 1 in prepare).
_CASE118_BRANCH = (
    (1, 2, 0.0303, 0.0999, 0.0254, 0), (1, 3, 0.0129, 0.0424, 0.01082, 0),
    (4, 5, 0.00176, 0.00798, 0.0021, 0), (3, 5, 0.0241, 0.108, 0.0284, 0),
    (5, 6, 0.0119, 0.054, 0.01426, 0), (6, 7, 0.00459, 0.0208, 0.0055, 0),
    (8, 9, 0.00244, 0.0305, 1.162, 0), (8, 5, 0.0, 0.0267, 0.0, 0.985),
    (9, 10, 0.00258, 0.0322, 1.23, 0), (4, 11, 0.0209, 0.0688, 0.01748, 0),
    (5, 11, 0.0203, 0.0682, 0.01738, 0), (11, 12, 0.00595, 0.0196, 0.00502, 0),
    (2, 12, 0.0187, 0.0616, 0.01572, 0), (3, 12, 0.0484, 0.16, 0.0406, 0),
    (7, 12, 0.00862, 0.034, 0.00874, 0), (11, 13, 0.02225, 0.0731, 0.01876, 0),
    (12, 14, 0.0215, 0.0707, 0.01816, 0), (13, 15, 0.0744, 0.2444, 0.06268, 0),
    (14, 15, 0.0595, 0.195, 0.0502, 0), (12, 16, 0.0212, 0.0834, 0.0214, 0),
    (15, 17, 0.0132, 0.0437, 0.0444, 0), (16, 17, 0.0454, 0.1801, 0.0466, 0),
    (17, 18, 0.0123, 0.0505, 0.01298, 0), (18, 19, 0.01119, 0.0493, 0.01142, 0),
    (19, 20, 0.0252, 0.117, 0.0298, 0), (15, 19, 0.012, 0.0394, 0.0101, 0),
    (20, 21, 0.0183, 0.0849, 0.0216, 0), (21, 22, 0.0209, 0.097, 0.0246, 0),
    (22, 23, 0.0342, 0.159, 0.0404, 0), (23, 24, 0.0135, 0.0492, 0.0498, 0),
    (23, 25, 0.0156, 0.08, 0.0864, 0), (26, 25, 0.0, 0.0382, 0.0, 0.96),
    (25, 27, 0.0318, 0.163, 0.1764, 0), (27, 28, 0.01913, 0.0855, 0.0216, 0),
    (28, 29, 0.0237, 0.0943, 0.0238, 0), (30, 17, 0.0, 0.0388, 0.0, 0.96),
    (8, 30, 0.00431, 0.0504, 0.514, 0), (26, 30, 0.00799, 0.086, 0.908, 0),
    (17, 31, 0.0474, 0.1563, 0.0399, 0), (29, 31, 0.0108, 0.0331, 0.0083, 0),
    (23, 32, 0.0317, 0.1153, 0.1173, 0), (31, 32, 0.0298, 0.0985, 0.0251, 0),
    (27, 32, 0.0229, 0.0755, 0.01926, 0), (15, 33, 0.038, 0.1244, 0.03194, 0),
    (19, 34, 0.0752, 0.247, 0.0632, 0), (35, 36, 0.00224, 0.0102, 0.00268, 0),
    (35, 37, 0.011, 0.0497, 0.01318, 0), (33, 37, 0.0415, 0.142, 0.0366, 0),
    (34, 36, 0.00871, 0.0268, 0.00568, 0), (34, 37, 0.00256, 0.0094, 0.00984, 0),
    (38, 37, 0.0, 0.0375, 0.0, 0.935), (37, 39, 0.0321, 0.106, 0.027, 0),
    (37, 40, 0.0593, 0.168, 0.042, 0), (30, 38, 0.00464, 0.054, 0.422, 0),
    (39, 40, 0.0184, 0.0605, 0.01552, 0), (40, 41, 0.0145, 0.0487, 0.01222, 0),
    (40, 42, 0.0555, 0.183, 0.0466, 0), (41, 42, 0.041, 0.135, 0.0344, 0),
    (43, 44, 0.0608, 0.2454, 0.06068, 0), (34, 43, 0.0413, 0.1681, 0.04226, 0),
    (44, 45, 0.0224, 0.0901, 0.0224, 0), (45, 46, 0.04, 0.1356, 0.0332, 0),
    (46, 47, 0.038, 0.127, 0.0316, 0), (46, 48, 0.0601, 0.189, 0.0472, 0),
    (47, 49, 0.0191, 0.0625, 0.01604, 0), (42, 49, 0.0715, 0.323, 0.086, 0),
    (42, 49, 0.0715, 0.323, 0.086, 0), (45, 49, 0.0684, 0.186, 0.0444, 0),
    (48, 49, 0.0179, 0.0505, 0.01258, 0), (49, 50, 0.0267, 0.0752, 0.01874, 0),
    (49, 51, 0.0486, 0.137, 0.0342, 0), (51, 52, 0.0203, 0.0588, 0.01396, 0),
    (52, 53, 0.0405, 0.1635, 0.04058, 0), (53, 54, 0.0263, 0.122, 0.031, 0),
    (49, 54, 0.073, 0.289, 0.0738, 0), (49, 54, 0.0869, 0.291, 0.073, 0),
    (54, 55, 0.0169, 0.0707, 0.0202, 0), (54, 56, 0.00275, 0.00955, 0.00732, 0),
    (55, 56, 0.00488, 0.0151, 0.00374, 0), (56, 57, 0.0343, 0.0966, 0.0242, 0),
    (50, 57, 0.0474, 0.134, 0.0332, 0), (56, 58, 0.0343, 0.0966, 0.0242, 0),
    (51, 58, 0.0255, 0.0719, 0.01788, 0), (54, 59, 0.0503, 0.2293, 0.0598, 0),
    (56, 59, 0.0825, 0.251, 0.0569, 0), (56, 59, 0.0803, 0.239, 0.0536, 0),
    (55, 59, 0.04739, 0.2158, 0.05646, 0), (59, 60, 0.0317, 0.145, 0.0376, 0),
    (59, 61, 0.0328, 0.15, 0.0388, 0), (60, 61, 0.00264, 0.0135, 0.01456, 0),
    (60, 62, 0.0123, 0.0561, 0.01468, 0), (61, 62, 0.00824, 0.0376, 0.0098, 0),
    (63, 59, 0.0, 0.0386, 0.0, 0.96), (63, 64, 0.00172, 0.02, 0.216, 0),
    (64, 61, 0.0, 0.0268, 0.0, 0.985), (38, 65, 0.00901, 0.0986, 1.046, 0),
    (64, 65, 0.00269, 0.0302, 0.38, 0), (49, 66, 0.018, 0.0919, 0.0248, 0),
    (49, 66, 0.018, 0.0919, 0.0248, 0), (62, 66, 0.0482, 0.218, 0.0578, 0),
    (62, 67, 0.0258, 0.117, 0.031, 0), (65, 66, 0.0, 0.037, 0.0, 0.935),
    (66, 67, 0.0224, 0.1015, 0.02682, 0), (65, 68, 0.00138, 0.016, 0.638, 0),
    (47, 69, 0.0844, 0.2778, 0.07092, 0), (49, 69, 0.0985, 0.324, 0.0828, 0),
    (68, 69, 0.0, 0.037, 0.0, 0.935), (69, 70, 0.03, 0.127, 0.122, 0),
    (24, 70, 0.00221, 0.4115, 0.10198, 0), (70, 71, 0.00882, 0.0355, 0.00878, 0),
    (24, 72, 0.0488, 0.196, 0.0488, 0), (71, 72, 0.0446, 0.18, 0.04444, 0),
    (71, 73, 0.00866, 0.0454, 0.01178, 0), (70, 74, 0.0401, 0.1323, 0.03368, 0),
    (70, 75, 0.0428, 0.141, 0.036, 0), (69, 75, 0.0405, 0.122, 0.124, 0),
    (74, 75, 0.0123, 0.0406, 0.01034, 0), (76, 77, 0.0444, 0.148, 0.0368, 0),
    (69, 77, 0.0309, 0.101, 0.1038, 0), (75, 77, 0.0601, 0.1999, 0.04978, 0),
    (77, 78, 0.00376, 0.0124, 0.01264, 0), (78, 79, 0.00546, 0.0244, 0.00648, 0),
    (77, 80, 0.017, 0.0485, 0.0472, 0), (77, 80, 0.0294, 0.105, 0.0228, 0),
    (79, 80, 0.0156, 0.0704, 0.0187, 0), (68, 81, 0.00175, 0.0202, 0.808, 0),
    (81, 80, 0.0, 0.037, 0.0, 0.935), (77, 82, 0.0298, 0.0853, 0.08174, 0),
    (82, 83, 0.0112, 0.03665, 0.03796, 0), (83, 84, 0.0625, 0.132, 0.0258, 0),
    (83, 85, 0.043, 0.148, 0.0348, 0), (84, 85, 0.0302, 0.0641, 0.01234, 0),
    (85, 86, 0.035, 0.123, 0.0276, 0), (86, 87, 0.02828, 0.2074, 0.0445, 0),
    (85, 88, 0.02, 0.102, 0.0276, 0), (85, 89, 0.0239, 0.173, 0.047, 0),
    (88, 89, 0.0139, 0.0712, 0.01934, 0), (89, 90, 0.0518, 0.188, 0.0528, 0),
    (89, 90, 0.0238, 0.0997, 0.106, 0), (90, 91, 0.0254, 0.0836, 0.0214, 0),
    (89, 92, 0.0099, 0.0505, 0.0548, 0), (89, 92, 0.0393, 0.1581, 0.0414, 0),
    (91, 92, 0.0387, 0.1272, 0.03268, 0), (92, 93, 0.0258, 0.0848, 0.0218, 0),
    (92, 94, 0.0481, 0.158, 0.0406, 0), (93, 94, 0.0223, 0.0732, 0.01876, 0),
    (94, 95, 0.0132, 0.0434, 0.0111, 0), (80, 96, 0.0356, 0.182, 0.0494, 0),
    (82, 96, 0.0162, 0.053, 0.0544, 0), (94, 96, 0.0269, 0.0869, 0.023, 0),
    (80, 97, 0.0183, 0.0934, 0.0254, 0), (80, 98, 0.0238, 0.108, 0.0286, 0),
    (80, 99, 0.0454, 0.206, 0.0546, 0), (92, 100, 0.0648, 0.295, 0.0472, 0),
    (94, 100, 0.0178, 0.058, 0.0604, 0), (95, 96, 0.0171, 0.0547, 0.01474, 0),
    (96, 97, 0.0173, 0.0885, 0.024, 0), (98, 100, 0.0397, 0.179, 0.0476, 0),
    (99, 100, 0.018, 0.0813, 0.0216, 0), (100, 101, 0.0277, 0.1262, 0.0328, 0),
    (92, 102, 0.0123, 0.0559, 0.01464, 0), (101, 102, 0.0246, 0.112, 0.0294, 0),
    (100, 103, 0.016, 0.0525, 0.0536, 0), (100, 104, 0.0451, 0.204, 0.0541, 0),
    (103, 104, 0.0466, 0.1584, 0.0407, 0), (103, 105, 0.0535, 0.1625, 0.0408, 0),
    (100, 106, 0.0605, 0.229, 0.062, 0), (104, 105, 0.00994, 0.0378, 0.00986, 0),
    (105, 106, 0.014, 0.0547, 0.01434, 0), (105, 107, 0.053, 0.183, 0.0472, 0),
    (105, 108, 0.0261, 0.0703, 0.01844, 0), (106, 107, 0.053, 0.183, 0.0472, 0),
    (108, 109, 0.0105, 0.0288, 0.0076, 0), (103, 110, 0.03906, 0.1813, 0.0461, 0),
    (109, 110, 0.0278, 0.0762, 0.0202, 0), (110, 111, 0.022, 0.0755, 0.02, 0),
    (110, 112, 0.0247, 0.064, 0.062, 0), (17, 113, 0.00913, 0.0301, 0.00768, 0),
    (32, 113, 0.0615, 0.203, 0.0518, 0), (32, 114, 0.0135, 0.0612, 0.01628, 0),
    (27, 115, 0.0164, 0.0741, 0.01972, 0), (114, 115, 0.0023, 0.0104, 0.00276, 0),
    (68, 116, 0.00034, 0.00405, 0.164, 0), (12, 117, 0.0329, 0.14, 0.0358, 0),
    (75, 118, 0.0145, 0.0481, 0.01198, 0), (76, 118, 0.0164, 0.0544, 0.01356, 0),
)


def _case118() -> Dict:
    """The IEEE 118-bus system (118 buses, 186 branches, 54 generators).

    Reconstruction of the canonical pypower/MATPOWER `case118` table (the
    reference's source, GNS/augment_grids.py:1,8), verified in this
    environment by tools/verify_case118.py:

      * total load 4242.0 MW / 1438.0 MVAr — the published values, exact;
      * non-slack scheduled generation 3861.0 MW — the published
        total-generation checksum (4374.9 MW incl. slack), exact;
      * flat-start Newton-Raphson converges in 4 iterations and reproduces
        the published solved profile carried in the Vm/Va columns:
        |v| to rms 6e-4 p.u. (max 3e-3), angles to rms 0.17 deg;
      * voltage extremes match the published solution (min 0.943 at bus
        76, max 1.050 at bus 25); total reactive generation 795.2 MVAr
        (published ~795.7).

    Residual deviation, quantified: system losses come to 132.67 MW vs
    the ~132.86 MW the canonical table yields — a 0.15% gap attributable
    to a handful of third-decimal entries, spread diffusely (no single
    localized error survives a per-bus mismatch analysis under the stored
    profile). Unlike case30, the final published digit of the loss figure
    is therefore NOT reproduced; accuracy tables footnote this.
    """
    baseMVA = 100.0
    bus = np.zeros((118, 13), dtype=np.float64)
    for i, (bi, t, pd, qd, gs, bs, vm, va) in enumerate(_CASE118_BUS):
        bus[i] = [bi, t, pd, qd, gs, bs, 1, vm, va, 138.0, 1, 1.06, 0.94]
    gen = np.zeros((54, 21), dtype=np.float64)
    for i, (bi, pg, qmax, qmin, vg, pmax) in enumerate(_CASE118_GEN):
        gen[i, :10] = [bi, pg, 0.0, qmax, qmin, vg, baseMVA, 1, pmax, 0.0]
    branch = np.zeros((186, 13), dtype=np.float64)
    for i, (f, t, r, x, b, tap) in enumerate(_CASE118_BRANCH):
        branch[i, :5] = [f, t, r, x, b]
        branch[i, 8] = tap
    branch[:, 5:8] = 9900.0
    branch[:, 10] = 1.0
    branch[:, 11] = -360.0
    branch[:, 12] = 360.0
    gencost = np.tile(
        np.array([2, 0, 0, 3, 0.01, 40, 0], dtype=np.float64), (54, 1)
    )
    return {
        "version": "2",
        "baseMVA": baseMVA,
        "bus": bus,
        "gen": gen,
        "branch": branch,
        "gencost": gencost,
    }


def _case14() -> Dict:
    z = np.load(os.path.join(_ASSET_DIR, "case14.npz"))
    return {
        "version": "2",
        "baseMVA": float(z["baseMVA"]),
        "bus": z["bus"].astype(np.float64),
        "gen": z["gen"].astype(np.float64),
        "branch": z["branch"].astype(np.float64),
        "gencost": z["gencost"].astype(np.float64),
    }


def _synthetic_case(case_nr: int) -> Dict:
    """Deterministic synthetic grid with the exact IEEE case dimensions.

    Topology: a random spanning tree over all buses (guaranteeing
    connectivity) plus extra chord branches up to the target branch count.
    Loads/generation are balanced so the case is solvable by Newton-Raphson.
    """
    n_bus, n_branch, n_gen = CASE_SIZES[case_nr]
    rng = np.random.default_rng(1_000_000 + case_nr)  # fixed per case

    baseMVA = 100.0
    bus = np.zeros((n_bus, 13), dtype=np.float64)
    bus[:, 0] = np.arange(1, n_bus + 1)
    bus[:, 1] = 1  # PQ by default
    bus[:, 6] = 1  # area
    bus[:, 7] = 1  # Vm
    bus[:, 9] = 135.0  # baseKV
    bus[:, 10] = 1  # zone
    bus[:, 11] = 1.06
    bus[:, 12] = 0.94

    # Generators on distinct random buses; bus 1 is the slack.
    gen_buses = np.concatenate(
        [[1], 1 + rng.choice(np.arange(1, n_bus), size=n_gen - 1, replace=False)]
    )
    bus[0, 1] = 3  # slack
    bus[gen_buses[1:] - 1, 1] = 2  # PV

    # Loads: roughly 60% of buses carry load.
    load_mask = rng.random(n_bus) < 0.6
    load_mask[0] = False
    pd = np.where(load_mask, rng.uniform(5.0, 60.0, n_bus), 0.0)
    qd = pd * rng.uniform(0.2, 0.5, n_bus)
    bus[:, 2] = np.round(pd, 2)
    bus[:, 3] = np.round(qd, 2)

    gen = np.zeros((n_gen, 21), dtype=np.float64)
    gen[:, 0] = gen_buses
    total_load = bus[:, 2].sum()
    pg = rng.uniform(0.8, 1.2, n_gen)
    pg = pg / pg.sum() * total_load  # balanced dispatch
    gen[:, 1] = np.round(pg, 2)
    gen[:, 3] = 300.0  # Qmax
    gen[:, 4] = -300.0  # Qmin
    gen[:, 5] = np.round(rng.uniform(1.0, 1.05, n_gen), 4)  # Vg
    gen[:, 6] = baseMVA
    gen[:, 7] = 1  # status
    gen[:, 8] = np.round(pg * 2.5 + 50, 1)  # Pmax
    gen[:, 9] = 0.0  # Pmin

    # Spanning tree: connect bus i (i>=2) to a random earlier bus.
    edges = []
    for i in range(2, n_bus + 1):
        j = int(rng.integers(max(1, i - 8), i))  # local-ish connectivity
        edges.append((j, i))
    # Chords up to n_branch edges, no self loops, allow parallel lines
    # (real IEEE cases contain parallel branches too).
    while len(edges) < n_branch:
        a = int(rng.integers(1, n_bus + 1))
        b = int(rng.integers(1, n_bus + 1))
        if a != b:
            edges.append((min(a, b), max(a, b)))
    edges = edges[:n_branch]

    branch = np.zeros((n_branch, 13), dtype=np.float64)
    branch[:, 0] = [e[0] for e in edges]
    branch[:, 1] = [e[1] for e in edges]
    branch[:, 2] = np.round(rng.uniform(0.005, 0.06, n_branch), 5)  # r
    branch[:, 3] = np.round(rng.uniform(0.02, 0.25, n_branch), 5)  # x
    branch[:, 4] = np.round(rng.uniform(0.0, 0.08, n_branch), 5)  # b
    branch[:, 5:8] = 250.0
    branch[:, 8] = 0.0  # tau (0 == nominal)
    branch[:, 9] = 0.0  # shift
    branch[:, 10] = 1.0
    branch[:, 11] = -360.0
    branch[:, 12] = 360.0

    gencost = np.tile(
        np.array([2, 0, 0, 3, 0.01, 40, 0], dtype=np.float64), (n_gen, 1)
    )
    return {
        "version": "2",
        "baseMVA": baseMVA,
        "bus": bus,
        "gen": gen,
        "branch": branch,
        "gencost": gencost,
    }


def renumber_case(case: Dict) -> Dict:
    """Map arbitrary bus numbering to consecutive 1..N (pypower ext2int).

    The real pypower `case300` numbers its buses 1..9533 NON-consecutively
    (pypower renumbers internally via ext2int before solving; the
    reference's own prepare_grid does NOT — its f_bus/t_bus columns are
    used directly as indices, GNS/main.py:85-86, so the reference would
    index out of bounds on that table). Every consumer here (prepare_case
    gathers, the batched NR solver's dense assembly) requires consecutive
    ids; this helper completes the documented "drop authentic data in
    later" path: `renumber_case(real_case300)` -> usable by load-path,
    solvers and models unchanged. Returns a NEW case dict; bus/gen/branch
    id columns rewritten, every other column untouched. Idempotent for
    already-consecutive cases.
    """
    bus = np.asarray(case["bus"], np.float64).copy()
    gen = np.asarray(case["gen"], np.float64).copy()
    branch = np.asarray(case["branch"], np.float64).copy()
    old = bus[:, 0].astype(np.int64)
    if np.array_equal(old, np.arange(1, old.size + 1)):
        new_case = dict(case)
        new_case["bus"], new_case["gen"], new_case["branch"] = bus, gen, branch
        return new_case
    mapping = {int(o): i + 1 for i, o in enumerate(old)}

    def remap(col):
        return np.asarray([mapping[int(x)] for x in col], np.float64)

    bus[:, 0] = np.arange(1, old.size + 1)
    gen[:, 0] = remap(gen[:, 0])
    branch[:, 0] = remap(branch[:, 0])
    branch[:, 1] = remap(branch[:, 1])
    new_case = dict(case)
    new_case["bus"], new_case["gen"], new_case["branch"] = bus, gen, branch
    return new_case


def load_case(case_nr: int) -> Dict:
    """Return the base (unaugmented) case dict for `case_nr`."""
    if case_nr == 9:
        return _case9()
    if case_nr == 14:
        return _case14()
    if case_nr == 30:
        return _case30()
    if case_nr == 118:
        return _case118()
    if case_nr in CASE_SIZES:
        return _synthetic_case(case_nr)
    raise ValueError(f"unsupported case_nr {case_nr}; supported: {sorted(CASE_SIZES)}")
