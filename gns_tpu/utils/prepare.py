"""Grid preparation: case dict / pickle -> dense float32 grid tensors.

Reproduces the reference's exact unit/column contract
(reference: GNS/utils.py:17-41 `prepare_grid`, SURVEY.md §2.3):

  * buses: pypower bus cols [0..5] -> (bus_i, type, Pd, Qd, Gs, Bs); Gs is
    overwritten to 1.0 and Bs to -1.0 for every bus (paper-default shunts),
    then Pd,Qd,Gs,Bs are divided by baseMVA.
  * lines: pypower branch cols [0,1,2,3,4,8,9] -> (f_bus, t_bus, r, x, b,
    tau, theta_shift); tau==0 -> 1; theta_shift degrees -> radians.
  * generators: pypower gen cols [0,8,9,1,5,2] -> (bus_i, Pmax, Pmin, Pg,
    vg, qg) with the Pg column duplicated and appended so the schema is
    (bus_i, Pmax, Pmin, Pg_set, vg, qg, Pg); power cols / baseMVA.

Batches are static-shape by construction (per-case sizes are fixed; the
augmentation perturbs parameters, never topology), so a jitted step compiles
once per case bucket. `GridBatch` additionally carries validity masks so
mixed-size mega-batches can be padded to a common bucket shape
(BASELINE.json config #5) without recompilation.
"""

from __future__ import annotations

import os
import pickle
from typing import NamedTuple, Optional, Tuple

import numpy as np

from gns_tpu.utils import cases as case_tables

DEFAULT_DATA_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "data",
)


def prepare_case(
    case: dict, paper_shunts: bool = True
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Convert one pypower-style case dict into (buses, lines, generators).

    Matches reference GNS/utils.py:17-41 numerically (float32 end to end).
    `paper_shunts=True` (the reference behavior) overwrites every bus's
    Gs/Bs with the paper defaults +1/-1 before normalization; False keeps
    the case's true shunts, which makes the paper-correct physics residual
    vanish at the Newton-Raphson solution (used by consistency tests).
    """
    base_mva = np.float32(case["baseMVA"])

    bus = np.asarray(case["bus"], dtype=np.float32)
    buses = bus[:, :6].copy()
    if paper_shunts:
        buses[:, 4] = 1.0  # Gs: paper default shunt conductance (utils.py:25)
        buses[:, 5] = -1.0  # Bs: paper default shunt susceptance (utils.py:26)
    buses[:, 2:6] /= base_mva

    br = np.asarray(case["branch"], dtype=np.float32)
    lines = br[:, [0, 1, 2, 3, 4, 8, 9]].copy()
    lines[:, 5] = np.where(lines[:, 5] == 0, np.float32(1.0), lines[:, 5])
    lines[:, 6] = np.deg2rad(lines[:, 6])

    g = np.asarray(case["gen"], dtype=np.float32)
    gens = g[:, [0, 8, 9, 1, 5, 2]].copy()
    # Append a mutable copy of Pg; column 3 stays as the Pg_set set-point
    # (utils.py:38).
    gens = np.concatenate([gens, gens[:, 3:4]], axis=1)
    gens[:, [1, 2, 3, 5, 6]] /= base_mva
    return buses, lines, gens


def pickle_path(case_nr: int, augmentation_nr: int, data_dir: Optional[str] = None) -> str:
    data_dir = data_dir or DEFAULT_DATA_DIR
    return os.path.join(
        data_dir, f"case{case_nr}", f"augmented_case{case_nr}_{augmentation_nr}.pkl"
    )


def prepare_grid(
    case_nr: int, augmentation_nr: int, data_dir: Optional[str] = None
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Load one augmented pickle and prepare it (reference: GNS/utils.py:17)."""
    with open(pickle_path(case_nr, augmentation_nr, data_dir), "rb") as f:
        case = pickle.load(f)
    return prepare_case(case)


class GridBatch(NamedTuple):
    """A batch of S grids with static shapes.

    buses      (S, N, 6) float32
    lines      (S, E, 7) float32
    generators (S, G, 7) float32
    bus_mask   (S, N) float32 — 1 for real buses, 0 for padding
    line_mask  (S, E) float32
    gen_mask   (S, G) float32
    n_bus      (S,) int32 — real bus count (loss divisor, main.py:198)

    Arrays may be numpy or jax; NamedTuple makes this a pytree for free.
    """

    buses: np.ndarray
    lines: np.ndarray
    generators: np.ndarray
    bus_mask: np.ndarray
    line_mask: np.ndarray
    gen_mask: np.ndarray
    n_bus: np.ndarray

    @property
    def batch_size(self) -> int:
        return self.buses.shape[0]

    def __getitem__(self, idx):  # slicing along the batch axis
        if isinstance(idx, int):
            idx = slice(idx, idx + 1)
        return GridBatch(*(a[idx] for a in self))

    def is_dense(self) -> bool:
        """True when no grid is padded: every mask is all-ones and every
        n_bus equals the bucket's bus dimension. Host-side check (call on
        numpy data before jitting); lets the trainer take the dense fast
        path that skips every mask multiply and mask HBM read — exact for
        unpadded batches (x*1 == x, n_real == N)."""
        return bool(
            np.all(np.asarray(self.n_bus) == self.buses.shape[1])
            and np.all(np.asarray(self.bus_mask) == 1)
            and np.all(np.asarray(self.line_mask) == 1)
            and np.all(np.asarray(self.gen_mask) == 1)
        )


class GridTopology(NamedTuple):
    """Shared (batch-invariant) graph topology: 0-based index arrays.

    The augmentation perturbs parameters, never topology (reference:
    GNS/augment_grids.py:25-54), so every augmented grid of one case shares
    src/dst/gen placement. Passing this to the forward makes each edge
    aggregation a single (N,E) one-hot contraction against the whole
    (B, E, D) batch — one big MXU matmul — instead of B independent ones
    with a (B, N, E) one-hot tensor (the memory/throughput cliff at large
    batch).
    """

    src: np.ndarray  # (E,) int32 from-bus
    dst: np.ndarray  # (E,) int32 to-bus
    gen_idx: np.ndarray  # (G,) int32 generator bus


def extract_shared_topology(batch: GridBatch) -> Optional[GridTopology]:
    """Return the batch's shared topology, or None if grids differ.

    Host-side (numpy) check — call it on concrete data before building the
    jitted step, not inside a trace.
    """
    f_bus = np.asarray(batch.lines[..., 0])
    t_bus = np.asarray(batch.lines[..., 1])
    g_bus = np.asarray(batch.generators[..., 0])
    if not (
        (f_bus == f_bus[:1]).all()
        and (t_bus == t_bus[:1]).all()
        and (g_bus == g_bus[:1]).all()
    ):
        return None
    return GridTopology(
        src=f_bus[0].astype(np.int32) - 1,
        dst=t_bus[0].astype(np.int32) - 1,
        gen_idx=g_bus[0].astype(np.int32) - 1,
    )


def _stack_to_batch(triples, pad_sizes=None) -> GridBatch:
    """Stack prepared (buses, lines, gens) triples into a GridBatch.

    pad_sizes: optional (N_pad, E_pad, G_pad) bucket shape. Padded lines point
    at the last padded bus slot (a "dead" bus) so quirk-Q2 style indexing
    stays in bounds; physics ops mask their contributions with line_mask.
    Requires E_pad >= N_pad so bus-indexed gathers into length-E arrays
    (SURVEY.md Q2) remain valid.
    """
    s = len(triples)
    n = max(t[0].shape[0] for t in triples)
    e = max(t[1].shape[0] for t in triples)
    g = max(t[2].shape[0] for t in triples)
    if pad_sizes is not None:
        pn, pe, pg = pad_sizes
        if pn < n or pe < e or pg < g:
            raise ValueError(f"pad_sizes {pad_sizes} smaller than data ({n},{e},{g})")
        n, e, g = pn, pe, pg
    if e < n:
        e = n  # guarantee E >= N for reference-parity gathers (Q2)

    buses = np.zeros((s, n, 6), dtype=np.float32)
    lines = np.zeros((s, e, 7), dtype=np.float32)
    gens = np.zeros((s, g, 7), dtype=np.float32)
    bus_mask = np.zeros((s, n), dtype=np.float32)
    line_mask = np.zeros((s, e), dtype=np.float32)
    gen_mask = np.zeros((s, g), dtype=np.float32)
    n_bus = np.zeros((s,), dtype=np.int32)

    for i, (b, l, gn) in enumerate(triples):
        nb, ne, ng = b.shape[0], l.shape[0], gn.shape[0]
        buses[i, :nb] = b
        # Padded buses: unit shunts like real ones, 1-based ids continue.
        buses[i, nb:, 0] = np.arange(nb + 1, n + 1)
        lines[i, :ne] = l
        # Padded lines: harmless parameters routed to the last (dead) slot.
        lines[i, ne:, 0] = n  # f_bus (1-based)
        lines[i, ne:, 1] = n  # t_bus
        lines[i, ne:, 2] = 1.0  # r
        lines[i, ne:, 3] = 1.0  # x
        lines[i, ne:, 5] = 1.0  # tau
        gens[i, :ng] = gn
        gens[i, ng:, 0] = n  # padded gens point at the dead bus
        gens[i, ng:, 4] = 0.0  # vg = 0 -> v-init 'no generator' path
        bus_mask[i, :nb] = 1.0
        line_mask[i, :ne] = 1.0
        gen_mask[i, :ng] = 1.0
        n_bus[i] = nb
    return GridBatch(buses, lines, gens, bus_mask, line_mask, gen_mask, n_bus)


def load_all_grids(
    case_nr: int,
    nr_samples: int = 100,
    test_set: bool = False,
    data_dir: Optional[str] = None,
    total_grids: int = 10001,
) -> GridBatch:
    """Load `nr_samples` augmented grids as one static-shape batch.

    Mirrors reference GNS/utils.py:44-68: training grids are indices
    1..nr_samples (index 0 is the unaugmented base case). The reference's
    `test_set=True` branch crashes on an undefined name (utils.py:62,
    SURVEY.md Q7); here it works and returns the *last* nr_samples grids,
    matching the NR-oracle range in GNS/evaluate.py:31.
    """
    start = (total_grids - nr_samples) if test_set else 1
    triples = [
        prepare_grid(case_nr, i, data_dir) for i in range(start, start + nr_samples)
    ]
    return _stack_to_batch(triples)


def load_prepared(
    case_nr: int,
    nr_samples: Optional[int] = None,
    test_set: bool = False,
    data_dir: Optional[str] = None,
) -> GridBatch:
    """Fast path: load the single-file prepared .npz cache written by
    gns_tpu.utils.augment.generate_dataset (one read instead of 10k pickle
    loads — the reference's startup hot spot, SURVEY.md §3.1).

    Index 0 is the unaugmented base case; training slices start at 1 like
    the reference loader (GNS/utils.py:60), test slices take the tail.
    """
    data_dir = data_dir or DEFAULT_DATA_DIR
    path = os.path.join(data_dir, f"case{case_nr}", f"prepared_case{case_nr}.npz")
    z = np.load(path)
    buses, lines, gens = z["buses"], z["lines"], z["generators"]
    total = buses.shape[0]
    if nr_samples is None:
        nr_samples = total - 1
    sl = slice(total - nr_samples, total) if test_set else slice(1, 1 + nr_samples)
    buses, lines, gens = buses[sl], lines[sl], gens[sl]
    s, n = buses.shape[0], buses.shape[1]
    e, g = lines.shape[1], gens.shape[1]
    return GridBatch(
        buses=buses,
        lines=lines,
        generators=gens,
        bus_mask=np.ones((s, n), np.float32),
        line_mask=np.ones((s, e), np.float32),
        gen_mask=np.ones((s, g), np.float32),
        n_bus=np.full((s,), n, np.int32),
    )


def batch_from_cases(case_dicts, pad_sizes=None, paper_shunts=True) -> GridBatch:
    """Build a (possibly mixed-size, padded) batch straight from case dicts.

    paper_shunts=False keeps each case's true Gs/Bs shunts instead of the
    reference's paper defaults (see prepare_case / GNSConfig.true_shunts).
    """
    return _stack_to_batch(
        [prepare_case(c, paper_shunts=paper_shunts) for c in case_dicts],
        pad_sizes,
    )


def base_case_batch(case_nr: int) -> GridBatch:
    """Single-grid batch of the unaugmented base case (no pickles needed)."""
    return _stack_to_batch([prepare_case(case_tables.load_case(case_nr))])
