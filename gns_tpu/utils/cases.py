"""Base MATPOWER-style case tables.

The reference obtains base grids from `pypower.api.case{9,14,30,118,300}`
(reference: GNS/augment_grids.py:1,8). pypower is not available in this
environment (zero egress), so the framework ships its own case sources:

  * case9  — the standard WSCC 9-bus system, embedded below.
  * case14 — the IEEE 14-bus system, shipped as an .npz asset extracted from
    the reference's unaugmented `augmented_case14_0.pkl` (pure data).
  * case30 / case118 / case300 — deterministic synthetic grids with exactly
    the bus/branch/gen counts of the real IEEE cases (30/41/6, 118/186/54,
    300/411/69 per reference GNS/utils.py:45-56). They are radial spanning
    trees plus chord branches with realistic parameter ranges, built so that
    Newton-Raphson converges on them. They are stand-ins for benchmarking and
    end-to-end testing, not the historical IEEE data.

    Why not embed the real tables? In a zero-egress environment there is no
    way to VERIFY a hand-reconstructed IEEE table (no pypower/pandapower/
    MATPOWER source to diff against, and the published NR solutions for
    these cases are not available here either) — and data silently labeled
    "IEEE case30" that is subtly wrong is strictly worse than a correctly
    labeled stand-in: every downstream accuracy number would inherit an
    unverifiable claim. The stand-ins are therefore loudly labeled here, in
    README.md and in every ACCURACY.md table (footnoted), and swapping in
    authentic tables later is a pure data change: any pypower-format case
    dict (or pickle in the reference's layout) drops into `load_case` /
    `prepare_case` unchanged — case14 already ships exactly that way.

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
    if case_nr in CASE_SIZES:
        return _synthetic_case(case_nr)
    raise ValueError(f"unsupported case_nr {case_nr}; supported: {sorted(CASE_SIZES)}")
