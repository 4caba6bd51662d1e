"""Measure the PyTorch reference's training throughput on this machine.

The reference publishes no numbers (BASELINE.md), so this creates the
comparison row: its native training style — sequential per-sample forwards,
one backward per batch (reference: GNS/main.py:276-291) — timed on the
benchmark workload (case300-sized grids, K=4, latent 20, hidden 10,
multiple_phi). Writes BASELINE_MEASURED.json at the repo root.

Runs the reference code itself from /root/reference with the same
torch_scatter/wandb stubs as tools/make_goldens.py.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np
import torch

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from tools.make_goldens import REF_GNS, install_stubs  # noqa: E402


def bench(case_nr=300, K=4, latent=20, hidden=10, batch=32, n_batches=3):
    install_stubs()
    sys.path.insert(0, REF_GNS)
    import main as ref_main
    from utils import get_BLG

    from gns_tpu.utils.augment import generate_cases
    from gns_tpu.utils.prepare import prepare_case

    B, L, G = get_BLG()
    grids = [
        tuple(torch.from_numpy(np.asarray(a)) for a in prepare_case(c))
        for c in generate_cases(case_nr, batch - 1, seed=0)
    ]
    n_edges = grids[0][1].shape[0]

    torch.manual_seed(0)
    model = ref_main.GNS(latent_dim=latent, hidden_dim=hidden, K=K, gamma=0.9,
                         multiple_phi=True)
    opt = torch.optim.Adam(model.parameters(), lr=1e-3)

    def run_batch():
        losses = torch.zeros(len(grids))
        for i, (buses, lines, gens) in enumerate(grids):
            _, _, loss, _ = model(buses=buses, lines=lines, generators=gens,
                                  B=B, L=L, G=G)
            losses[i] = loss
        total = losses.mean()
        total.backward()
        opt.step()
        opt.zero_grad()

    run_batch()  # warmup
    t0 = time.perf_counter()
    for _ in range(n_batches):
        run_batch()
    dt = (time.perf_counter() - t0) / n_batches

    edges_per_s = batch * n_edges * K / dt
    result = {
        "workload": f"case{case_nr} K={K} latent={latent} hidden={hidden} "
                    f"multiple_phi=True, batch={batch} (fwd+bwd+opt)",
        "hardware": "host CPU (reference is CPU-only; README.md:11)",
        "sec_per_batch": dt,
        "edges_per_sec": edges_per_s,
        "grids_per_sec": batch / dt,
        "n_edges": n_edges,
    }
    with open(os.path.join(REPO, "BASELINE_MEASURED.json"), "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps(result, indent=2))


if __name__ == "__main__":
    bench()
