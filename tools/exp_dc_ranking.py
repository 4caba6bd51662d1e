"""Rank-quality A/B: GNS-aware severity vs the classical DC/LODF screen.

The round-4 ranked screen orders contingencies by the outage-aware
model's own prediction shift (eval/contingency.screen_n1_ranked stage
2). The industry-standard alternative needs no model at all: one DC
base solve + Line Outage Distribution Factors give every branch
outage's full post-contingency flow pattern from a single factorization
(eval/dcpf.lodf_matrix). This experiment scores BOTH rankings against
the same ground truth — the full Newton screen's violating set
(branch outages; islanding is exact in both by construction, LODF's
singular columns == Tarjan bridges, tested) — as recall@k of the true
voltage-violating contingencies among each ranking's top-k.

The hypothesis the measurement tests: the true worst set is defined by
VOLTAGE violations (the shipped IEEE tables carry no branch ratings),
which the DC approximation is structurally blind to (flat |v| by
assumption) — flow redistribution is its only severity proxy. An
aware GNS sees the voltage problem directly.

Appends one row per case to docs/N1_SCREEN.json.

Usage: python tools/exp_dc_ranking.py [--cases 14 118] [--ks 8 16 32 64]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cases", type=int, nargs="+", default=[14, 118])
    ap.add_argument("--ks", type=int, nargs="+", default=[8, 16, 32, 64])
    ap.add_argument("--json-out",
                    default=os.path.join(REPO, "docs", "N1_SCREEN.json"))
    args = ap.parse_args()

    import numpy as np

    from gns_tpu.eval.contingency import screen_n1, screen_n1_ranked
    from gns_tpu.eval.dcpf import dc_outage_severity
    from gns_tpu.models.pretrained import available_cases, load_pretrained
    from gns_tpu.utils.cases import load_case

    rows = []
    for case_nr in args.cases:
        case = load_case(case_nr)
        key = f"{case_nr}-n1"
        if key not in available_cases():
            print(f"# case{case_nr}: no aware checkpoint, skipping",
                  file=sys.stderr)
            continue
        params, cfg = load_pretrained(key)

        full = screen_n1(case)  # branch outages only — LODF's domain
        islanded = ~full["converged"]
        true_viol = set(
            np.flatnonzero(
                full["converged"] & (np.asarray(full["v_violations"]) > 0)
            ).tolist()
        )

        rep = screen_n1_ranked(case, params, cfg, top_k=0)
        sev_gns = np.asarray(rep["severity"])
        dc = dc_outage_severity(case)
        sev_dc = dc["max_shift_mw"]
        assert (np.isinf(sev_dc) == islanded).all()

        rankable = np.flatnonzero(~islanded)
        order_gns = rankable[np.argsort(-sev_gns[rankable], kind="stable")]
        order_dc = rankable[np.argsort(-sev_dc[rankable], kind="stable")]

        recalls = {}
        for k in args.ks:
            top_g = set(order_gns[:k].tolist())
            top_d = set(order_dc[:k].tolist())
            denom = max(len(true_viol), 1)
            recalls[k] = {
                "gns_aware": round(len(true_viol & top_g) / denom, 3),
                "dc_lodf": round(len(true_viol & top_d) / denom, 3),
            }
        row = {
            "row": f"ranking_gns_vs_dc_lodf_case{case_nr}",
            "contingencies": int(islanded.size),
            "true_violations": len(true_viol),
            "islanding_exact_both": True,
            "recall_at_k": recalls,
            "note": ("recall of true (full-Newton) voltage-violating "
                     "branch outages among each ranking's top-k "
                     "non-islanding candidates; islanding is exact in "
                     "both rankings by construction"),
        }
        rows.append(row)
        print(json.dumps(row), flush=True)

    if rows and args.json_out:
        existing = json.load(open(args.json_out))
        json.dump(existing + rows, open(args.json_out, "w"), indent=1)


if __name__ == "__main__":
    main()
