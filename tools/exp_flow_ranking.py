"""Flow-limit screening A/B on flow-DEFINED ground truth (round 5).

Round-4 left LODF "shipped as a first-class op" for flow screening with
no workload to prove it on: the shipped tables carried no real MVA
ratings, so every ranking A/B used voltage-violation ground truth — the
regime DC is structurally blind in (docs/N1_SCREEN.md round-4b). The
published ratings now ship (utils/cases.py: case30 = MATPOWER
case_ieee30 rateA; case9 = pypower case9; case14/118 publish only 9900
placeholders, documented there), and eval/contingency.py computes exact
AC branch loadings per contingency — so the classical tier finally gets
its fair fight.

Ground truth per case: the FULL exact N-1 branch-outage screen
(screen_n1), truth set = converged outages that create at least one NEW
overload — a violated branch that is neither violated in the base case
(the published case30 operating point already overloads branch 1-2 at
1.35x, so every variant inherits it) nor the outaged branch itself.

Rankings scored as recall@k of that set among top-k non-islanding
candidates:
  dc_lodf_overload — DC base flows + LODF closed-form post-outage flows
                     vs ratings (eval/dcpf.dc_outage_severity
                     "overload_mw") — the classical answer, zero solves;
  dc_lodf_shift    — the rating-free redistribution proxy that stood in
                     for it while no ratings shipped;
  gns_aware_flow   — exact AC loadings computed FROM the outage-aware
                     GNS prediction per variant (ac_branch_loading on
                     pred v/theta), severity = predicted worst new
                     loading fraction;
  gns_aware_v      — the voltage-deviation rms score the ranked screen
                     ships (stage 2) — expected to lose here: it ranks
                     voltage severity, not flow;
  base_loading     — the no-model heuristic: base-case loading of the
                     outaged branch.

Appends rows to docs/N1_SCREEN.json (preserving prior rows).

Usage: python tools/exp_flow_ranking.py [--cases 30 9] [--ks 4 8 16]
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
    ap.add_argument("--cases", type=int, nargs="+", default=[30, 9])
    ap.add_argument("--ks", type=int, nargs="+", default=[4, 8, 16])
    ap.add_argument("--json-out",
                    default=os.path.join(REPO, "docs", "N1_SCREEN.json"))
    args = ap.parse_args()

    import numpy as np

    from gns_tpu.eval.contingency import (
        ac_branch_loading,
        n1_variants,
        screen_n1,
        screen_n1_ranked,
    )
    from gns_tpu.eval.dcpf import dc_outage_severity
    from gns_tpu.eval.newton_raphson import newton_raphson_pf
    from gns_tpu.models.pretrained import available_cases, load_pretrained
    from gns_tpu.utils.cases import load_case

    rows = []
    for case_nr in args.cases:
        case = load_case(case_nr)
        rate = np.asarray(case["branch"], np.float64)[:, 5]
        rated = (rate > 0) & (rate < 9000.0)
        if not rated.any():
            print(f"# case{case_nr}: no real ratings, skipping",
                  file=sys.stderr)
            continue
        key = f"{case_nr}-n1"
        if key not in available_cases():
            key = "multi-n1"
        params, cfg = load_pretrained(key)

        # base-case overloads are inherited by every variant; truth
        # counts only NEW ones
        base = newton_raphson_pf(case)
        base_load = ac_branch_loading(
            [case], base.vm[None, :], base.va_deg[None, :]
        )[0]
        base_over = rated & (base_load > rate)

        full = screen_n1(case)  # branch outages only — LODF's domain
        conv = np.asarray(full["converged"])
        loading = np.asarray(full["branch_loading_mva"], np.float64)
        e = loading.shape[1]
        new_over = np.zeros(e, dtype=object)
        truth, new_frac = set(), np.zeros(e)
        for i in range(e):
            if not conv[i]:
                continue
            cand = rated & ~base_over
            cand[i] = False  # the outaged branch itself loads ~0
            with np.errstate(invalid="ignore"):
                over_i = cand & (loading[i] > rate)
                frac_i = (loading[i][cand] / rate[cand]).max()
            new_frac[i] = frac_i
            if over_i.any():
                truth.add(i)
        islanded = ~conv

        # rankings. The DC overload score is computed CONSISTENTLY with
        # the truth definition (new-overload fraction over candidate
        # branches): dc_outage_severity's aggregate "overload_mw" counts
        # the base case's inherited overload for every outage, which
        # flattens the ranking signal to near-constant.
        from gns_tpu.eval.dcpf import lodf_matrix, solve_batched_dc

        dc = dc_outage_severity(case)
        sev_shift = dc["max_shift_mw"].copy()
        f0 = solve_batched_dc([case])["pf_mw"][0].astype(np.float64)
        lodf = lodf_matrix(case)
        with np.errstate(invalid="ignore"):
            post = f0[:, None] + lodf * f0[None, :]  # post[l, k]
        sev_overload = np.zeros(e)
        for i in range(e):
            cand = rated & ~base_over
            cand[i] = False
            if np.isfinite(post[:, i]).all():
                sev_overload[i] = (
                    np.abs(post[cand, i]) / rate[cand]
                ).max()
            else:
                sev_overload[i] = np.inf  # islanding column

        rep = screen_n1_ranked(case, params, cfg, top_k=0)
        sev_v = np.asarray(rep["severity"]).copy()
        variants = n1_variants(case, encode_impedance=True)
        pred_load = ac_branch_loading(
            variants, np.asarray(rep["pred_v"], np.float64),
            np.asarray(rep["pred_theta_deg"], np.float64),
        )
        sev_flow = np.zeros(e)
        for i in range(e):
            cand = rated & ~base_over
            cand[i] = False
            sev_flow[i] = (pred_load[i][cand] / rate[cand]).max()

        f = np.asarray(case["branch"])[:, 0].astype(int) - 1  # noqa: F841
        sev_base = np.where(rated, base_load / np.where(rated, rate, 1.0),
                            base_load / rate.max())

        rankable = np.flatnonzero(~islanded)

        def order_of(sev):
            return rankable[np.argsort(-sev[rankable], kind="stable")]

        orders = {
            "dc_lodf_overload": order_of(sev_overload),
            "dc_lodf_shift": order_of(sev_shift),
            "gns_aware_flow": order_of(sev_flow),
            "gns_aware_v": order_of(sev_v),
            "base_loading": order_of(sev_base),
        }
        recalls = {}
        denom = max(len(truth), 1)
        for k in args.ks:
            recalls[k] = {
                name: round(len(truth & set(o[:k].tolist())) / denom, 3)
                for name, o in orders.items()
            }
        row = {
            "row": f"ranking_flow_truth_case{case_nr}",
            "aware_checkpoint": key,
            "contingencies": int(e),
            "base_overloads": int(base_over.sum()),
            "true_new_overload_outages": len(truth),
            "recall_at_k": recalls,
            "note": ("flow-DEFINED ground truth: outages creating >=1 NEW "
                     "overload (exact AC loadings vs published rateA, "
                     "base-case overloads and the outaged branch "
                     "excluded); recall among top-k non-islanding "
                     "candidates per ranking"),
        }
        rows.append(row)
        print(json.dumps(row), flush=True)

    if rows and args.json_out:
        existing = json.load(open(args.json_out))
        keep = [r for r in existing
                if r.get("row") not in {x["row"] for x in rows}]
        json.dump(keep + rows, open(args.json_out, "w"), indent=1)


if __name__ == "__main__":
    main()
