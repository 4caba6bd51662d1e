"""Checkpointing: Orbax for native state, .pth-compatible export/import.

The reference saves bare `torch.save(model.state_dict())` with hyperparams
encoded in the filename (reference: GNS/main.py:308-309) and never persists
optimizer state. Here a checkpoint is params + optax state + step counter
(true resume), plus interop helpers so reference checkpoints can be imported
and this framework's checkpoints exported back to the reference layout.
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import numpy as np

from gns_tpu.train.trainer import TrainState, init_train_state
from gns_tpu.utils.config import GNSConfig


def checkpoint_name(cfg: GNSConfig) -> str:
    """Reference filename convention (GNS/main.py:308-309), minus extension."""
    opt = "Adam" if cfg.optimizer == "adam" else "Adagrad"
    return (
        f"best_model_c{cfg.case_nr}_K{cfg.K}_L{cfg.latent_dim}"
        f"_H{cfg.hidden_dim}_{cfg.multiple_phi}_optim{opt}"
    )


def save_checkpoint(path: str, state: TrainState) -> None:
    """Save with Orbax (directory checkpoint)."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(path, jax.device_get(state), force=True)


def load_checkpoint(path: str, cfg: GNSConfig, key=None) -> TrainState:
    """Restore an Orbax checkpoint into a TrainState skeleton."""
    import orbax.checkpoint as ocp

    key = key if key is not None else jax.random.key(0)
    template = jax.device_get(init_train_state(key, cfg))
    with ocp.StandardCheckpointer() as ckptr:
        restored = ckptr.restore(os.path.abspath(path), template)
    return TrainState(*restored)


def export_torch(path: str, state: TrainState, cfg: GNSConfig) -> None:
    """Write the params as a reference-layout .pth (torch.save state_dict)."""
    import torch

    from gns_tpu.models.import_torch import state_dict_from_params

    sd = {
        k: torch.from_numpy(np.ascontiguousarray(v))
        for k, v in state_dict_from_params(jax.device_get(state.params), cfg).items()
    }
    torch.save(sd, path)


def import_torch(path: str, cfg: GNSConfig, key=None) -> TrainState:
    """Build a fresh TrainState around weights from a reference .pth."""
    from gns_tpu.models.import_torch import load_torch_checkpoint
    from gns_tpu.train.trainer import make_optimizer

    key = key if key is not None else jax.random.key(0)
    params = jax.tree.map(
        lambda x: jax.numpy.asarray(x), load_torch_checkpoint(path, cfg)
    )
    opt = make_optimizer(cfg)
    return TrainState(params, opt.init(params), jax.numpy.zeros((), jax.numpy.int32))
