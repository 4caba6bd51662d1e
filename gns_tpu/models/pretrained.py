"""Shipped pretrained checkpoints.

The reference README tells users to load `best_model_*.pth` checkpoints but
ships none (reference: GNS/main.py:308-309, README.md:15 — `../models/` is
referenced yet absent from the repo). We fix that gap: a pretrained case14
checkpoint at the reference's best config (K=4, latent 20, hidden 10,
multiple_phi, README.md:16) ships as a package asset in the reference's own
`.pth` state_dict layout, so it is loadable by BOTH frameworks.

Provenance: trained with `python -m gns_tpu.train` on one TPU v5e chip
(1000 augmented case14 grids, seed 0, 600 epochs, ~150 s wall); final
physics residual 0.0367 — below the 101-epoch parity-run numbers in
ACCURACY.md (gns_tpu 0.053, reference 0.062).
"""

from __future__ import annotations

import os

from gns_tpu.utils.config import GNSConfig

_ASSET_DIR = os.path.join(os.path.dirname(os.path.dirname(__file__)), "utils", "case_assets")

# case_nr -> (filename, config it was trained at)
_PRETRAINED = {
    14: (
        "pretrained_c14_K4_L20_H10.pth",
        dict(case_nr=14, K=4, latent_dim=20, hidden_dim=10, multiple_phi=True),
    ),
}


def pretrained_path(case_nr: int = 14) -> str:
    """Absolute path of the shipped .pth for `case_nr` (KeyError if none)."""
    name, _ = _PRETRAINED[case_nr]
    return os.path.join(_ASSET_DIR, name)


def pretrained_config(case_nr: int = 14) -> GNSConfig:
    """The GNSConfig the shipped checkpoint was trained at."""
    _, kw = _PRETRAINED[case_nr]
    return GNSConfig(**kw)


def load_pretrained(case_nr: int = 14):
    """Return (params, cfg) for the shipped checkpoint."""
    from gns_tpu.models.import_torch import load_torch_checkpoint

    cfg = pretrained_config(case_nr)
    return load_torch_checkpoint(pretrained_path(case_nr), cfg), cfg
