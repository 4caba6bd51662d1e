"""Decompose the case30 accuracy floor (round-5 VERDICT task 5).

`30-deep-sup` is the case30 accuracy flagship at v MSE 0.00184 — still
~1.5 orders worse than its case14 (1.4e-5) and case118 (6.3e-5)
siblings, and round 4 could not say what the remaining error is made
of. This experiment attributes it along the axes the VERDICT named:

  A. per-bus error structure — is the floor concentrated (a few hard
     buses) or diffuse?
  B. residual-vs-MSE correlation — is a bad prediction detectably
     "unphysical" (high true AC mismatch), or does it satisfy the
     physics on a wrong branch (the known case30 failure mode)?
  C. label-branch geometry — do the NR LABELS of wild feasible grids
     jump between solution branches (low-voltage labels), making the
     regression target itself discontinuous in the inputs?
  D. augmentation-scale sweep — freshly fine-tuned sup specialists at
     augmentation scale 0.5 / 0.75 / 1.0 measured at their OWN scale
     and at full scale: does the floor track the data's wildness?
  E. error-vs-wildness regression — per-grid v MSE vs how far the grid
     was perturbed (load scale, r/x scale, tap deviation).

Writes docs/C30_FLOOR.json + prints findings. Trainings are the cheap
supervised fine-tunes (~30-60 s each on the chip).

Usage: python tools/exp_c30_floor.py [--grids 1024] [--eval-grids 256]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--grids", type=int, default=1024)
    ap.add_argument("--eval-grids", type=int, default=256)
    ap.add_argument("--epochs", type=int, default=200)
    ap.add_argument("--skip-sweep", action="store_true")
    ap.add_argument("--json-out",
                    default=os.path.join(REPO, "docs", "C30_FLOOR.json"))
    args = ap.parse_args()

    import numpy as np

    from gns_tpu.eval.harness import compute_metrics, run_gns, run_nr_oracle
    from gns_tpu.models.pretrained import load_pretrained
    from gns_tpu.utils.augment import generate_cases
    from gns_tpu.utils.cases import load_case

    out = {}
    params, cfg = load_pretrained("30-deep-sup")
    held = list(generate_cases(30, args.eval_grids, seed=12345,
                               feasible_only=True))[1:]
    nr = run_nr_oracle(held)
    gns = run_gns(params, cfg, held)
    m = compute_metrics(nr, gns)
    conv = np.asarray(nr["converged"])
    v_nr = np.asarray(nr["v"])[conv]
    v_gn = np.asarray(gns["v"])[conv]
    th_nr = np.deg2rad(np.asarray(nr["theta_deg"]))[conv]
    cases_c = [c for c, k in zip(held, conv) if k]
    err2 = (v_gn - v_nr) ** 2  # (S, N)
    out["headline_v_mse"] = float(m["v_mse"])
    print(f"30-deep-sup on {conv.sum()} held-out grids: "
          f"v MSE {m['v_mse']:.5f}", flush=True)

    # ---- A. per-bus structure ----
    per_bus = err2.mean(axis=0)
    order = np.argsort(-per_bus)
    top5 = [(int(b) + 1, float(per_bus[b])) for b in order[:5]]
    out["per_bus"] = {
        "top5_bus_mse": top5,
        "top5_share_of_total": float(per_bus[order[:5]].sum()
                                     / per_bus.sum()),
        "gen_buses_zero": bool(per_bus[[0, 1, 4, 7, 10, 12]].max() < 1e-9),
    }
    print(f"A. top-5 buses carry {out['per_bus']['top5_share_of_total']*100:.0f}% "
          f"of the bus-summed error: {top5}", flush=True)

    # ---- B. per-grid: residual vs MSE; the tail ----
    per_grid = err2.mean(axis=1)
    resid = np.asarray(gns["last_loss"])[conv]
    rk = np.corrcoef(np.argsort(np.argsort(resid)),
                     np.argsort(np.argsort(per_grid)))[0, 1]
    gs = np.argsort(-per_grid)
    out["per_grid"] = {
        "mse_p50": float(np.percentile(per_grid, 50)),
        "mse_p90": float(np.percentile(per_grid, 90)),
        "mse_max": float(per_grid.max()),
        "worst10_share_of_total": float(per_grid[gs[:10]].sum()
                                        / per_grid.sum()),
        "spearman_residual_vs_mse": float(rk),
    }
    print(f"B. per-grid: p50 {out['per_grid']['mse_p50']:.2e}, "
          f"p90 {out['per_grid']['mse_p90']:.2e}, "
          f"max {out['per_grid']['mse_max']:.2e}; worst-10 grids carry "
          f"{out['per_grid']['worst10_share_of_total']*100:.0f}% of the "
          f"error; Spearman(residual, MSE) = {rk:.2f}", flush=True)

    # ---- C. label-branch geometry ----
    vmin_label = v_nr.min(axis=1)
    out["labels"] = {
        "label_vmin_p5": float(np.percentile(vmin_label, 5)),
        "label_vmin_min": float(vmin_label.min()),
        "labels_below_0p85": int((vmin_label < 0.85).sum()),
        "labels_below_0p7": int((vmin_label < 0.7).sum()),
    }
    # error of the worst grids vs their label's vmin
    r_lab = np.corrcoef(vmin_label, np.log10(per_grid + 1e-12))[0, 1]
    out["labels"]["pearson_labelvmin_vs_logmse"] = float(r_lab)
    print(f"C. labels: min|v| p5 {out['labels']['label_vmin_p5']:.3f}, "
          f"min {out['labels']['label_vmin_min']:.3f}, "
          f"{out['labels']['labels_below_0p85']} grids' labels dip below "
          f"0.85 p.u.; corr(label vmin, log MSE) = {r_lab:.2f}", flush=True)

    # ---- E. error vs wildness ----
    base = load_case(30)
    pd0 = np.asarray(base["bus"], float)[:, 2].sum()
    wild_load, wild_tap = [], []
    for c in cases_c:
        bus = np.asarray(c["bus"], float)
        br = np.asarray(c["branch"], float)
        wild_load.append(bus[:, 2].sum() / pd0)
        tap = br[:, 8]
        wild_tap.append(np.abs(tap[tap != 0] - 1.0).max())
    wild_load = np.asarray(wild_load)
    wild_tap = np.asarray(wild_tap)
    out["wildness"] = {
        "pearson_loadscale_vs_logmse": float(
            np.corrcoef(wild_load, np.log10(per_grid + 1e-12))[0, 1]
        ),
        "pearson_tapdev_vs_logmse": float(
            np.corrcoef(wild_tap, np.log10(per_grid + 1e-12))[0, 1]
        ),
    }
    print(f"E. corr(load scale, log MSE) = "
          f"{out['wildness']['pearson_loadscale_vs_logmse']:.2f}; "
          f"corr(max tap deviation, log MSE) = "
          f"{out['wildness']['pearson_tapdev_vs_logmse']:.2f}", flush=True)

    # ---- F. label variance normalization across cases ----
    # If case30's held-out label distribution is intrinsically much
    # wider than its siblings', the absolute-MSE comparison overstates
    # the gap; 1 - MSE/Var(label) (an R^2) is the scale-free view.
    f_rows = {}
    label_var30 = float(((v_nr - v_nr.mean(axis=0)) ** 2).mean())
    f_rows["30"] = {
        "v_mse": float(m["v_mse"]), "label_var": label_var30,
        "frac_unexplained": float(m["v_mse"] / label_var30),
    }
    for other, ck in ((14, "14-deep-sup"), (118, "118-deep-sup")):
        p_o, c_o = load_pretrained(ck)
        held_o = list(generate_cases(other, 64, seed=12345,
                                     feasible_only=True))[1:]
        nr_o = run_nr_oracle(held_o)
        m_o = compute_metrics(nr_o, run_gns(p_o, c_o, held_o))
        conv_o = np.asarray(nr_o["converged"])
        vo = np.asarray(nr_o["v"])[conv_o]
        var_o = float(((vo - vo.mean(axis=0)) ** 2).mean())
        f_rows[str(other)] = {
            "v_mse": float(m_o["v_mse"]), "label_var": var_o,
            "frac_unexplained": float(m_o["v_mse"] / var_o),
        }
    out["label_variance_normalized"] = f_rows
    print("F. label-variance view (v_mse / Var(label) — scale-free):",
          {k: round(v["frac_unexplained"], 4) for k, v in f_rows.items()},
          "| label Var:",
          {k: round(v["label_var"], 5) for k, v in f_rows.items()},
          flush=True)

    # ---- D. augmentation-scale sweep (fresh sup fine-tunes) ----
    if not args.skip_sweep:
        import jax

        from gns_tpu.train.supervised import nr_labels, train_supervised
        from gns_tpu.train.trainer import init_train_state
        from gns_tpu.utils.prepare import batch_from_cases

        warm, wcfg = load_pretrained("30-deep-paper")
        sweep = {}
        for scale in (0.5, 0.75, 1.0):
            cs = list(generate_cases(30, args.grids, seed=7,
                                     scale=scale, feasible_only=True))[1:]
            data = batch_from_cases(cs, paper_shunts=not wcfg.true_shunts)
            labels = nr_labels(cs, n_pad=data.buses.shape[1])
            scfg = wcfg.replace(epochs=args.epochs, early_stop_patience=20,
                                batch_size=128, learning_rate=1e-4, seed=0)
            state = init_train_state(jax.random.key(0), scfg)._replace(
                params=warm
            )
            t0 = time.perf_counter()
            best, hist = train_supervised(scfg, data, labels, state=state)
            tsec = time.perf_counter() - t0
            row = {"train_sec": round(tsec, 1), "epochs": len(hist)}
            for ev_scale in (scale, 1.0):
                key = f"eval@{ev_scale}"
                if ev_scale == 1.0:
                    ev_nr, ev_cases = nr, held
                else:
                    ev_cases = list(generate_cases(
                        30, args.eval_grids, seed=12345, scale=ev_scale,
                        feasible_only=True))[1:]
                    ev_nr = run_nr_oracle(ev_cases)
                mm = compute_metrics(
                    ev_nr, run_gns(best.params, scfg, ev_cases)
                )
                row[key] = round(float(mm["v_mse"]), 6)
            sweep[str(scale)] = row
            print(f"D. scale {scale}: {row}", flush=True)
        out["scale_sweep"] = sweep

    if os.path.exists(args.json_out):
        with open(args.json_out) as f:
            prev = json.load(f)
        prev.update(out)  # partial re-runs (e.g. --skip-sweep) merge
        out = prev
    with open(args.json_out, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({"written": args.json_out}), flush=True)


if __name__ == "__main__":
    main()
