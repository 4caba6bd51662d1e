"""Cross-case golden fixtures: the PyTorch reference model executed on
augmented grids of EVERY supported MATPOWER case (9/30/118/300 — case14 is
covered by tools/make_goldens.py with the reference's own pickles).

The reference model is case-agnostic (its forward only needs the
(N,6)/(E,7)/(G,7) tensors), so parity can be pinned on the cases its repo
ships no data for — including case300's multi-generator buses (quirk Q3)
and tap/shift-heavy topologies. Grids come from gns_tpu's seeded
augmentation; tensors from gns_tpu's prepare_case (verified equal to the
reference's prepare_grid layout by the case14 fixtures).

Usage: python tools/make_goldens_cases.py
"""

from __future__ import annotations

import os
import sys

import numpy as np
import torch

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
REF_GNS = "/root/reference/GNS"

from tools.make_goldens import install_stubs  # noqa: E402

CASES = (9, 30, 118, 300)
K, LATENT, HIDDEN = 4, 20, 10


def main():
    install_stubs()
    sys.path.insert(0, REF_GNS)
    import main as ref_main  # the reference module (never copied)
    from utils import get_BLG

    from gns_tpu.utils.augment import generate_cases
    from gns_tpu.utils.prepare import prepare_case

    B, L, G = get_BLG()
    out_dir = os.path.join(REPO, "tests", "golden")
    os.makedirs(out_dir, exist_ok=True)

    for case in CASES:
        torch.manual_seed(1234)
        model = ref_main.GNS(
            latent_dim=LATENT, hidden_dim=HIDDEN, K=K, gamma=0.9,
            multiple_phi=True,
        )
        model.eval()
        sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}

        # grid index 1 = first augmentation of the base case, fixed seed.
        case_dict = list(generate_cases(case, 1, seed=77))[1]
        buses_np, lines_np, gens_np = prepare_case(case_dict)
        buses = torch.from_numpy(buses_np)
        lines = torch.from_numpy(lines_np)
        gens = torch.from_numpy(gens_np)

        captured = {}
        orig_lpi = ref_main.local_power_imbalance

        def lpi_wrap(*a, **kw):
            dp, dq = orig_lpi(*a, **kw)
            captured.setdefault("delta_p", []).append(dp.detach().numpy().copy())
            captured.setdefault("delta_q", []).append(dq.detach().numpy().copy())
            return dp, dq

        ref_main.local_power_imbalance = lpi_wrap
        try:
            with torch.no_grad():
                v, theta, total_loss, last_loss = model(
                    buses=buses, lines=lines, generators=gens, B=B, L=L, G=G
                )
        finally:
            ref_main.local_power_imbalance = orig_lpi

        arrays = {
            "buses": buses_np,
            "lines": lines_np,
            "generators": gens_np,
            "v": v.numpy(),
            "theta": theta.numpy(),
            "total_loss": np.float32(total_loss.item()),
            "last_loss": np.float32(last_loss.item()),
            "delta_p": np.stack(captured["delta_p"]),
            "delta_q": np.stack(captured["delta_q"]),
        }
        arrays.update({f"sd.{k}": v for k, v in sd.items()})
        path = os.path.join(
            out_dir, f"multiphi_K{K}_L{LATENT}_H{HIDDEN}_case{case}_grid1.npz"
        )
        np.savez_compressed(path, **arrays)
        print(f"case{case}: loss={total_loss.item():.6f} -> {path}")


if __name__ == "__main__":
    main()
