"""Offline dataset generation: perturbed copies of a base case.

Reproduces the reference's augmentation semantics
(reference: GNS/augment_grids.py:25-54, SURVEY.md C9) with one deliberate
fix: the reference uses unseeded numpy RNG (not reproducible); here every
dataset is generated from an explicit seed.

Per augmented case (all draws elementwise U[a,b]):
  * branch r, x, b           scaled by U[0.9, 1.1]
  * branch tau               overwritten with U[0.8, 1.2]   (absolute)
  * branch theta_shift       overwritten with U[-0.2, 0.2]  (absolute, deg)
  * gen    vg                scaled by U[0.95, 1.05]
  * gen    Pg ~ U(Pmin + 0.25*(Pmax-Pmin), 0.75*(Pmax-Pmin))
           -- note the asymmetric bounds: the reference adds Pmin only to the
              lower bound (augment_grids.py:45-47); replicated verbatim.
  * bus    Pd scaled by U[0.5, 1.5], then rescaled so sum(Pd) == sum(Pg)
  * bus    Qd scaled by U[0.5, 1.5]

Index 0 of a generated dataset is the unaugmented base case
(augment_grids.py:26-27), indices 1..n are perturbed.
"""

from __future__ import annotations

import copy
import os
import pickle
from typing import Dict, Iterator, Optional

import numpy as np

from gns_tpu.utils import cases as case_tables
from gns_tpu.utils.prepare import DEFAULT_DATA_DIR

RANGES = {
    "r": (0.9, 1.1),
    "x": (0.9, 1.1),
    "b": (0.9, 1.1),
    "tau": (0.8, 1.2),
    "theta_shift": (-0.2, 0.2),
    "vg": (0.95, 1.05),
    "pg": (0.25, 0.75),
    "pd": (0.5, 1.5),
    "qd": (0.5, 1.5),
}


def augment_case(case: Dict, rng: np.random.Generator, scale: float = 1.0) -> Dict:
    """Return one perturbed copy of `case` (reference: augment_grids.py:28-54).

    scale: interpolates every perturbation range toward identity. scale=1.0
    is the reference recipe verbatim (same draws, same RNG stream); smaller
    values shrink the ranges around their no-op point (1 for multiplicative
    and tau, 0 for theta-shift) and blend the Pg draw toward the base
    set-point. The reference ranges were only ever exercised on case14 —
    jointly they push case300 outside the AC-solvable region essentially
    always (NR diverges on ~100% of draws), so large-case datasets need
    scale < 1 to be oracle-comparable at all."""

    def _mul(lo, hi, size):
        # multiplicative factor around 1 with range shrunk by `scale`
        return rng.uniform(1.0 + (lo - 1.0) * scale, 1.0 + (hi - 1.0) * scale, size)

    c = copy.deepcopy(case)
    bus = np.asarray(c["bus"], dtype=np.float64)
    branch = np.asarray(c["branch"], dtype=np.float64)
    gen = np.asarray(c["gen"], dtype=np.float64)

    nb, ne, ng = bus.shape[0], branch.shape[0], gen.shape[0]
    branch[:, 2] *= _mul(*RANGES["r"], ne)
    branch[:, 3] *= _mul(*RANGES["x"], ne)
    branch[:, 4] *= _mul(*RANGES["b"], ne)
    # tau/theta_shift are OVERWRITES in the reference (augment_grids.py:39-41),
    # turning every line into a slightly off-nominal transformer; the scaled
    # variants shrink toward tau=1 / shift=0.
    branch[:, 8] = _mul(*RANGES["tau"], ne)
    sh_lo, sh_hi = RANGES["theta_shift"]
    branch[:, 9] = rng.uniform(sh_lo * scale, sh_hi * scale, size=ne)
    gen[:, 5] = gen[:, 5] * _mul(*RANGES["vg"], ng)
    span = gen[:, 8] - gen[:, 9]  # Pmax - Pmin
    lo, hi = RANGES["pg"]
    pg_draw = rng.uniform(gen[:, 9] + lo * span, hi * span, size=ng)
    gen[:, 1] = (1.0 - scale) * gen[:, 1] + scale * pg_draw
    bus[:, 2] *= _mul(*RANGES["pd"], nb)
    total_pd = bus[:, 2].sum()
    if total_pd != 0:
        bus[:, 2] *= gen[:, 1].sum() / total_pd  # rebalance: sum Pd == sum Pg
    bus[:, 3] *= _mul(*RANGES["qd"], nb)

    c["bus"], c["branch"], c["gen"] = bus, branch, gen
    return c


def generate_cases(
    case_nr: int,
    num_augmentations: int,
    seed: int = 0,
    feasible_only: bool = False,
    max_tries_per_case: int = 200,
    scale: float = 1.0,
) -> Iterator[Dict]:
    """Yield the base case (index 0) then `num_augmentations` perturbed cases.

    feasible_only: rejection-sample each augmentation until Newton-Raphson
    converges on it. The reference's perturbation ranges were only ever
    exercised on case14; on case300 they leave the AC-solvable region for
    ~85-100% of draws (NR diverges, |v| -> 1e9), so accuracy-vs-oracle eval
    sets MUST filter — comparing against a non-converged runpf iterate is
    noise. Deterministic given (seed, feasible_only)."""
    base = case_tables.load_case(case_nr)
    yield copy.deepcopy(base)
    rng = np.random.default_rng(seed)
    for _ in range(num_augmentations):
        if not feasible_only:
            yield augment_case(base, rng, scale=scale)
            continue
        from gns_tpu.eval.newton_raphson import newton_raphson_pf

        for _try in range(max_tries_per_case):
            c = augment_case(base, rng, scale=scale)
            if newton_raphson_pf(c).success:
                yield c
                break
        else:
            raise RuntimeError(
                f"no NR-feasible augmentation of case{case_nr} in "
                f"{max_tries_per_case} tries — the perturbation ranges are "
                f"too violent for this case"
            )


def generate_dataset(
    case_nr: int,
    num_augmentations: int = 10000,
    seed: int = 0,
    data_dir: Optional[str] = None,
    write_pickles: bool = True,
    write_npz: bool = True,
    scale: float = 1.0,
    feasible_only: bool = False,
) -> str:
    """Write a dataset to data/case{nr}/.

    Pickles use the reference's file layout
    (`augmented_case{nr}_{i}.pkl`, augment_grids.py:57-61) for drop-in
    compatibility. An additional single-file `.npz` cache of the *prepared*
    float32 tensors is written so training startup is one mmap-able read
    instead of 10k pickle loads (the reference's hot startup path,
    SURVEY.md §3.1).
    """
    from gns_tpu.utils.prepare import prepare_case  # local import, no cycle

    data_dir = data_dir or DEFAULT_DATA_DIR
    out_dir = os.path.join(data_dir, f"case{case_nr}")
    os.makedirs(out_dir, exist_ok=True)

    # Stream: prepared tensors go straight into preallocated arrays (no
    # list-of-arrays doubling), so >10k-grid sets cost exactly the final
    # buffer (e.g. 100k case300 grids ~2 GB, not 4+).
    buses_all = lines_all = gens_all = None
    for i, case in enumerate(generate_cases(
            case_nr, num_augmentations, seed,
            scale=scale, feasible_only=feasible_only)):
        if write_pickles:
            with open(
                os.path.join(out_dir, f"augmented_case{case_nr}_{i}.pkl"), "wb"
            ) as f:
                pickle.dump(case, f)
        if write_npz:
            b, l, g = prepare_case(case)
            if buses_all is None:
                n = num_augmentations + 1
                buses_all = np.empty((n,) + b.shape, np.float32)
                lines_all = np.empty((n,) + l.shape, np.float32)
                gens_all = np.empty((n,) + g.shape, np.float32)
            buses_all[i], lines_all[i], gens_all[i] = b, l, g
    if write_npz:
        np.savez_compressed(
            os.path.join(out_dir, f"prepared_case{case_nr}.npz"),
            buses=buses_all,
            lines=lines_all,
            generators=gens_all,
            seed=np.int64(seed),
            scale=np.float64(scale),
        )
    return out_dir
