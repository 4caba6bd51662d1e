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
  * case118 / case300 — deterministic synthetic grids with exactly the
    bus/branch/gen counts of the real IEEE cases (118/186/54, 300/411/69
    per reference GNS/utils.py:45-56). They are radial spanning trees plus
    chord branches with realistic parameter ranges, built so that
    Newton-Raphson converges on them. They are stand-ins for benchmarking
    and end-to-end testing, not the historical IEEE data.

    Why not embed those real tables too? In a zero-egress environment a
    hand-reconstructed table is only shippable if it can be VERIFIED, and
    the IEEE 30-bus is the largest case with a complete, independently
    checkable published solution (the loss-figure checksum above). For
    118/300 no equally strong whole-table check is reproducible here, and
    data silently labeled "IEEE case300" that is subtly wrong is strictly
    worse than a correctly labeled stand-in: every downstream accuracy
    number would inherit an unverifiable claim. The stand-ins are therefore
    loudly labeled here, in README.md and in every ACCURACY.md table
    (footnoted), and swapping in authentic tables later is a pure data
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
    branch[:, 5:8] = 250.0  # rates
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
    branch[:, 5:8] = 250.0
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


def load_case(case_nr: int) -> Dict:
    """Return the base (unaugmented) case dict for `case_nr`."""
    if case_nr == 9:
        return _case9()
    if case_nr == 14:
        return _case14()
    if case_nr == 30:
        return _case30()
    if case_nr in CASE_SIZES:
        return _synthetic_case(case_nr)
    raise ValueError(f"unsupported case_nr {case_nr}; supported: {sorted(CASE_SIZES)}")
