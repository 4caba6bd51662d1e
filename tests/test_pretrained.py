"""The shipped pretrained checkpoint loads and performs.

The reference README points users at `best_model_*.pth` checkpoints but the
repo ships none (reference: README.md:15, GNS/main.py:308-309); gns_tpu
ships one as a package asset in the reference's own state_dict layout.
"""

import numpy as np

from gns_tpu.models.gns import gns_forward_batch
from gns_tpu.models.pretrained import load_pretrained, pretrained_path
from gns_tpu.utils.augment import generate_cases
from gns_tpu.utils.prepare import batch_from_cases


import pytest

from gns_tpu.models.pretrained import available_cases


def test_pretrained_asset_exists():
    import os

    assert os.path.exists(pretrained_path(14))


def test_all_cases_shipped():
    # Every MATPOWER case the framework supports ships a checkpoint.
    avail = available_cases()
    assert [k for k in avail if isinstance(k, int)] == [9, 14, 30, 118, 300]


# Held-out residual ceilings per case: trained residuals plus generous
# margin for a fresh augmentation seed (random init sits around ~2-4 on
# case14, far higher on the big cases).
@pytest.mark.parametrize("case", [9, 14, 30, 118, 300])
def test_pretrained_residual_beats_random(case):
    if case not in available_cases():
        pytest.skip(f"case{case} checkpoint not shipped")
    params, cfg = load_pretrained(case)
    assert cfg.K == 4 and cfg.latent_dim == 20 and cfg.multiple_phi
    # Fresh augmented grids (seed unseen in training).
    cases = list(generate_cases(case, 16, seed=987654))
    batch = batch_from_cases(cases)
    out = gns_forward_batch(params, cfg, batch)
    last = float(np.mean(np.asarray(out.last_loss)))
    ceiling = {9: 1.0, 14: 0.15, 30: 1.0, 118: 5.0, 300: 20.0}[case]
    assert last < ceiling, last


def test_variant_checkpoints_load():
    variants = [
        ("300-deep", 300, 1.0), ("multi", 14, 1.0),
        ("300-deep-paper", 300, 0.5), ("multi-paper", 14, 1.0),
        ("multi-sup", 14, 1.0), ("14-n1", 14, 1.0), ("118-n1", 118, 1.0),
        ("14-deep-paper", 14, 1.0), ("118-deep-paper", 118, 1.0),
        ("multi-deep-paper", 14, 1.0), ("multi-n1", 30, 1.0),
        ("14-deep-sup", 14, 1.0), ("118-deep-sup", 118, 1.0),
        ("30-deep-paper", 30, 1.0), ("30-deep-sup", 30, 1.0),
        ("9-deep-sup", 9, 1.0), ("300-deep-sup", 300, 0.5),
        ("multi-deep-sup", 30, 1.0), ("118-deep-n1", 118, 1.0),
    ] + [
        (f"{c}-paper", c, 0.5 if c == 300 else 1.0)
        for c in (9, 14, 30, 118, 300)
    ] + [
        (f"{c}-sup", c, 0.5 if c == 300 else 1.0)
        for c in (9, 14, 30, 118, 300)
    ]
    for key, case, scale in variants:
        if key not in available_cases():
            pytest.skip(f"{key} not shipped")
        params, cfg = load_pretrained(key)
        batch = batch_from_cases(
            list(generate_cases(case, 4, seed=5, scale=scale))[1:]
        )
        out = gns_forward_batch(params, cfg.replace(case_nr=case), batch)
        last = float(np.mean(np.asarray(out.last_loss)))
        assert last == last and last < 1.0, (key, last)
