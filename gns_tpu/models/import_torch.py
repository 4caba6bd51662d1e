"""PyTorch checkpoint importer.

Loads a reference `state_dict` (saved by torch.save at reference
GNS/main.py:308-309, keys like `phi_v.0.linear1.weight`) into the stacked-K
JAX parameter pytree used by gns_tpu.models.gns. torch Linear stores weights
as (out, in); JAX applies x @ w, so weights are transposed on import.

Used by the activation-parity tests (SURVEY.md §4) and to migrate existing
reference checkpoints into this framework.
"""

from __future__ import annotations

from typing import Dict

import numpy as np

from gns_tpu.utils.config import GNSConfig

_LAYERS = ("linear1", "linear2", "linear4")
_LAYER_TO_PARAM = {"linear1": ("w1", "b1"), "linear2": ("w2", "b2"), "linear4": ("w4", "b4")}


def params_from_state_dict(state_dict: Dict, cfg: GNSConfig):
    """Convert a torch state_dict (tensors or numpy arrays) to JAX params."""

    def to_np(x):
        if hasattr(x, "detach"):
            x = x.detach().cpu().numpy()
        return np.asarray(x, dtype=np.float32)

    module_names = (
        ["phi_v", "phi_theta", "phi_m"] if cfg.multiple_phi else ["phi"]
    ) + ["L_theta", "L_v", "L_m"]

    params = {}
    for mod in module_names:
        block = {}
        for layer in _LAYERS:
            wname, bname = _LAYER_TO_PARAM[layer]
            ws, bs = [], []
            for k in range(cfg.K):
                w = to_np(state_dict[f"{mod}.{k}.{layer}.weight"]).T  # (in, out)
                b = to_np(state_dict[f"{mod}.{k}.{layer}.bias"])
                ws.append(w)
                bs.append(b)
            block[wname] = np.stack(ws)
            block[bname] = np.stack(bs)
        params[mod] = block
    return params


def load_torch_checkpoint(path: str, cfg: GNSConfig):
    """Load a .pth file written by the reference trainer."""
    import torch

    sd = torch.load(path, map_location="cpu")
    return params_from_state_dict(sd, cfg)


def state_dict_from_params(params, cfg: GNSConfig) -> Dict:
    """Inverse mapping: JAX params -> reference-layout state_dict (numpy)."""
    sd = {}
    for mod, block in params.items():
        for layer, (wname, bname) in _LAYER_TO_PARAM.items():
            for k in range(cfg.K):
                sd[f"{mod}.{k}.{layer}.weight"] = np.asarray(block[wname][k]).T
                sd[f"{mod}.{k}.{layer}.bias"] = np.asarray(block[bname][k])
    return sd
