"""Generate golden parity fixtures by executing the PyTorch reference.

Runs the *reference implementation itself* (imported from /root/reference,
never copied) against the shipped case14 pickles, instrumented with forward
hooks and physics-function wrappers, and freezes:

  * the torch state_dict (random weights under a fixed seed),
  * final outputs (v, theta, total_loss, last_loss) per grid,
  * per-step network_input tensors (which concatenate v, theta, delta_p,
    delta_q, m, phi_sum — pinning down the whole per-step state), and
  * per-step physics outputs (Pg_new, qg_new, delta_p, delta_q)

as .npz files under tests/golden/. The reference needs two import stubs:
`torch_scatter` (its only native dep; reimplemented here with the exact
out.scatter_add_ broadcast semantics, which is what produces quirk Q1) and
`wandb` (network tracking, unused at import beyond symbols).

Usage: python tools/make_goldens.py
"""

from __future__ import annotations

import os
import sys
import types

import numpy as np
import torch

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REF_GNS = "/root/reference/GNS"


def install_stubs():
    # torch_scatter.scatter_add with torch_scatter's broadcast semantics:
    # a 1-D index against multi-D src is expanded along trailing dims of src
    # (NOT of out) — this is what makes an (E,1) src write only column 0 of
    # an (N,latent) out (reference main.py:169-170, quirk Q1).
    def scatter_add(src, index, dim=0, out=None, dim_size=None):
        assert dim == 0
        if index.dim() == 1 and src.dim() > 1:
            idx = index.view(-1, *([1] * (src.dim() - 1))).expand_as(src)
        else:
            idx = index
        if out is None:
            size = int(idx.max()) + 1 if dim_size is None else dim_size
            out = torch.zeros((size, *src.shape[1:]), dtype=src.dtype)
        return out.scatter_add_(0, idx, src)

    ts = types.ModuleType("torch_scatter")
    ts.scatter_add = scatter_add
    sys.modules["torch_scatter"] = ts

    wb = types.ModuleType("wandb")
    wb.login = wb.init = wb.log = wb.finish = lambda *a, **k: None
    sys.modules["wandb"] = wb


def make_goldens():
    install_stubs()
    sys.path.insert(0, REF_GNS)
    cwd = os.getcwd()
    os.chdir(REF_GNS)  # reference uses ../data relative paths
    try:
        import main as ref_main  # noqa: the reference module
        from utils import get_BLG, prepare_grid

        B, L, G = get_BLG()
        out_dir = os.path.join(REPO, "tests", "golden")
        os.makedirs(out_dir, exist_ok=True)

        configs = [
            # (tag, K, latent, hidden, multiple_phi) — the reference's best
            # config (README.md:16) and its eval config (evaluate.py:61-63,
            # exercising quirk Q1).
            ("multiphi_K4_L20_H10", 4, 20, 10, True),
            ("singlephi_K6_L20_H10", 6, 20, 10, False),
        ]
        grids = [1, 2, 3, 500]

        for tag, K, latent, hidden, mphi in configs:
            torch.manual_seed(1234)
            model = ref_main.GNS(
                latent_dim=latent, hidden_dim=hidden, K=K, gamma=0.9,
                multiple_phi=mphi,
            )
            model.eval()
            sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}

            # capture per-step network inputs via forward hooks on L_theta
            # (its input concatenates v/theta/dp/dq/m/phi_sum) and physics
            # outputs via wrapping the module-level functions.
            captured = {}

            def hook(mod, args, output, _k=None, _name=None):
                captured.setdefault(_name, []).append(
                    args[0].detach().numpy().copy()
                )

            import functools

            handles = []
            for k in range(K):
                for name in ("L_theta", "L_v", "L_m"):
                    mod = getattr(model, name)[str(k)]
                    handles.append(
                        mod.register_forward_hook(
                            functools.partial(hook, _name=f"{name}_in")
                        )
                    )

            orig_gac = ref_main.global_active_compensation
            orig_lpi = ref_main.local_power_imbalance

            def gac_wrap(*a, **kw):
                pg, qg = orig_gac(*a, **kw)
                captured.setdefault("Pg_new", []).append(pg.detach().numpy().copy())
                captured.setdefault("qg_new", []).append(qg.detach().numpy().copy())
                return pg, qg

            def lpi_wrap(*a, **kw):
                dp, dq = orig_lpi(*a, **kw)
                captured.setdefault("delta_p", []).append(dp.detach().numpy().copy())
                captured.setdefault("delta_q", []).append(dq.detach().numpy().copy())
                return dp, dq

            ref_main.global_active_compensation = gac_wrap
            ref_main.local_power_imbalance = lpi_wrap

            for grid_i in grids:
                captured.clear()
                buses, lines, gens = prepare_grid(14, grid_i)
                with torch.no_grad():
                    v, theta, total_loss, last_loss = model(
                        buses=buses, lines=lines, generators=gens, B=B, L=L, G=G
                    )
                arrays = {
                    "buses": buses.numpy(),
                    "lines": lines.numpy(),
                    "generators": gens.numpy(),
                    "v": v.numpy(),
                    "theta": theta.numpy(),
                    "total_loss": np.float32(total_loss),
                    "last_loss": np.float32(last_loss),
                }
                for name, lst in captured.items():
                    arrays[name] = np.stack(lst)  # (K, ...)
                for key, val in sd.items():
                    arrays[f"sd.{key}"] = val
                path = os.path.join(out_dir, f"{tag}_grid{grid_i}.npz")
                np.savez_compressed(path, **arrays)
                print(
                    f"{tag} grid {grid_i}: loss={float(total_loss):.6f} "
                    f"last={float(last_loss):.6f} -> {os.path.relpath(path, REPO)}"
                )

            ref_main.global_active_compensation = orig_gac
            ref_main.local_power_imbalance = orig_lpi
            for h in handles:
                h.remove()
    finally:
        os.chdir(cwd)


if __name__ == "__main__":
    make_goldens()
