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


def test_pretrained_asset_exists():
    import os

    assert os.path.exists(pretrained_path(14))


def test_pretrained_residual_beats_random():
    params, cfg = load_pretrained(14)
    assert cfg.K == 4 and cfg.latent_dim == 20 and cfg.multiple_phi
    # Fresh augmented grids (seed unseen in training).
    cases = list(generate_cases(14, 16, seed=987654))
    batch = batch_from_cases(cases)
    out = gns_forward_batch(params, cfg, batch)
    last = float(np.mean(np.asarray(out.last_loss)))
    # Trained to ~0.037 on the training distribution; generous margin for
    # a fresh augmentation seed. A random init sits around ~2-4.
    assert last < 0.15, last
