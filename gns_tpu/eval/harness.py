"""Evaluation harness: GNS vs the Newton-Raphson oracle.

Re-creates the reference's evaluation pipeline (reference: GNS/evaluate.py)
with its metric definitions kept intact:

  * per-grid wall time, GNS minus NR (evaluate.py:89-92)
  * |theta_GNS - theta_NR| mean/std in radians (NR degrees -> radians,
    evaluate.py:98-104)
  * |v_GNS - v_NR| mean/std in p.u. (evaluate.py:108-111)
  * final physics residual (last_loss) mean/std (evaluate.py:85,146)
  * active-line-flow %-difference: sorted, lowest 50% kept, then
    20th/50th/80th percentiles (evaluate.py:121-129) — convention preserved
  * per-bus v/theta error mean+-std errorbar plot (evaluate.py:151-178)
  * additionally: v/theta MSE (the BASELINE.json accuracy metric)

Two deliberate fixes (documented deviations):
  * the reference evaluates GNS on training grids 0..n-1 while the oracle
    solves the last n grids — quirk Q6, evaluate.py:76 — so the two
    methods never see the same grid. Here both run on the *same* grids.
  * predicted angles are decoded into the oracle's gauge by pinning the
    slack-bus angle to its known input value (align_slack_angle; the
    residual is shift-invariant, so the raw gauge is unidentified). The
    raw reference-convention theta metric (evaluate.py:101) is then
    computed on the decoded prediction.
"""

from __future__ import annotations

import json
import os
import pickle
import time
from typing import Dict, List, Optional

import jax
import numpy as np

from gns_tpu.eval.newton_raphson import newton_raphson_pf
from gns_tpu.models.gns import gns_forward
from gns_tpu.utils.config import GNSConfig
from gns_tpu.utils.prepare import pickle_path, prepare_case
from gns_tpu.utils.schema import LINE


def _np_active_line_flow(v, theta, x, src, dst):
    """numpy line flow on 1-based src/dst (reference evaluate.py:15-18)."""
    src = src.astype(int) - 1
    dst = dst.astype(int) - 1
    return (1.0 / x) * v[src] * v[dst] * np.sin(theta[src] - theta[dst])


def run_nr_oracle(cases: List[Dict], backend: str = "scipy"):
    """Solve each case with NR; returns dict of stacked results + times.

    backend="scipy": the float64 sequential oracle (eval.newton_raphson,
    pypower-equivalent; the parity-grade ground truth). backend="batched":
    the accelerator-batched solver (eval.nr_batched) — one dispatch for the
    whole shared-topology set, float32 (~1e-6 p.u. agreement with scipy);
    per-grid time is the amortized batch wall time.
    """
    if backend == "batched":
        from gns_tpu.eval.nr_batched import solve_batched

        # Full warm pass first: the chunked solve compiles one program per
        # chunk SHAPE, and a first compile is tens of seconds — it must not
        # pollute the reported per-grid time (the timed pass re-runs the
        # exact same programs warm).
        solve_batched(cases)
        t0 = time.perf_counter()
        res = solve_batched(cases)
        per_grid = (time.perf_counter() - t0) / len(cases)
        flows = []
        for i, case in enumerate(cases):
            br = np.asarray(case["branch"], dtype=np.float64)
            flows.append(
                _np_active_line_flow(
                    res["v"][i].astype(np.float64),
                    np.deg2rad(res["theta_deg"][i].astype(np.float64)),
                    br[:, 3], br[:, 0], br[:, 1],
                )
            )
        return {
            "time": np.full(len(cases), per_grid, np.float32),
            "v": res["v"],
            "theta_deg": res["theta_deg"],
            "line_flow": np.stack(flows).astype(np.float32),
            "converged": res["converged"],
        }
    if backend != "scipy":
        raise ValueError(f"backend must be scipy/batched, got {backend!r}")
    times, v_out, th_out, flows, ok = [], [], [], [], []
    for case in cases:
        t0 = time.perf_counter()
        res = newton_raphson_pf(case)
        times.append(time.perf_counter() - t0)
        v_out.append(res.vm)
        th_out.append(res.va_deg)
        br = np.asarray(case["branch"], dtype=np.float64)
        flows.append(
            _np_active_line_flow(
                res.vm, np.deg2rad(res.va_deg), br[:, 3], br[:, 0], br[:, 1]
            )
        )
        ok.append(res.success)
    return {
        "time": np.array(times, np.float32),
        "v": np.stack(v_out).astype(np.float32),
        "theta_deg": np.stack(th_out).astype(np.float32),
        "line_flow": np.stack(flows).astype(np.float32),
        "converged": np.array(ok),
    }


def align_slack_angle(theta: np.ndarray, case: Dict) -> np.ndarray:
    """Shift a predicted angle vector so the slack bus hits its known angle.

    The physics residual is invariant under a global angle shift (only
    angle *differences* enter every flow expression), so the GNS's raw
    angle gauge is unidentified — but the slack-bus angle is an INPUT of
    the power-flow problem, not a solved quantity: Newton-Raphson holds it
    fixed at the case's Va (pypower pins the ref-bus angle; the reference
    compares raw angles against that convention, GNS/evaluate.py:98-104).
    Decoding the prediction into NR's gauge is therefore a deterministic
    post-processing step using only problem inputs. It leaves v, every
    angle difference, every line flow, and the physics residual unchanged.
    """
    bus = np.asarray(case["bus"], dtype=np.float64)
    slack = np.flatnonzero(bus[:, 1] == 3)
    if slack.size == 0:
        return theta
    i = int(slack[0])
    va_rad = float(np.deg2rad(bus[i, 8]))
    return theta - theta[i] + va_rad


def run_gns(params, cfg: GNSConfig, cases: List[Dict], method: str = "auto",
            align_slack: bool = True):
    """Run the GNS forward on each case, timing per-grid jitted latency.

    align_slack: decode predicted angles into the oracle's gauge by pinning
    the slack-bus angle to its known (input) value — see align_slack_angle.
    Off reproduces the raw network output (round-1 behavior, where raw
    theta carried an arbitrary global offset of ~1 rad).

    Timing: on this environment the relay acknowledges dispatches AND
    `block_until_ready` before device execution finishes (CLAUDE.md), so
    the timed region is closed by a host VALUE fetch — the only
    trustworthy barrier — and the pure fetch round-trip (~33 ms on the
    remote relay, ~0 locally) is cancelled by timing a second fetch of a
    buffer produced by the same already-finished program. The reported
    per-grid time is therefore dispatch + device execution, matching what
    the reference's synchronous torch timing measures (evaluate.py:78-81).
    """
    fwd = jax.jit(
        lambda p, b, l, g: gns_forward(p, cfg, b, l, g, method=method)
    )
    times, v_out, th_out, losses, flows = [], [], [], [], []
    for case in cases:
        buses, lines, gens = prepare_case(
            case, paper_shunts=not cfg.true_shunts
        )
        out = fwd(params, buses, lines, gens)  # warm cache for this shape
        np.asarray(out.v)  # fetch: the only honest barrier on this relay
        t0 = time.perf_counter()
        out = fwd(params, buses, lines, gens)
        v = np.asarray(out.v)  # fetch closes the timed region
        t1 = time.perf_counter()
        # theta comes from the same (now finished) program: timing its
        # fetch measures the pure round-trip, which the timed region above
        # also paid exactly once — subtract it.
        r0 = time.perf_counter()
        th = np.asarray(out.theta)
        rtt = time.perf_counter() - r0
        times.append(max(t1 - t0 - rtt, 0.0))
        if align_slack:
            th = align_slack_angle(th, case)
        v_out.append(v)
        th_out.append(th)
        losses.append(float(out.last_loss))
        flows.append(
            _np_active_line_flow(
                v, th, np.asarray(lines[:, LINE["x"]]),
                np.asarray(lines[:, 0]), np.asarray(lines[:, 1]),
            )
        )
    return {
        "time": np.array(times, np.float32),
        "v": np.stack(v_out),
        "theta": np.stack(th_out),
        "last_loss": np.array(losses, np.float32),
        "line_flow": np.stack(flows).astype(np.float32),
    }


def _filter_converged(nr: Dict, gns: Dict):
    """Drop grids where the NR oracle did not converge from both result
    dicts (a non-converged runpf iterate is noise, |v| can be 1e9)."""
    conv = np.asarray(nr.get("converged", np.ones(len(nr["time"]), bool)), bool)
    frac = float(conv.mean())
    if not conv.any():
        raise ValueError(
            "NR oracle converged on 0 eval grids; accuracy metrics would be "
            "meaningless. Regenerate eval grids (different seed/augmentation)."
        )
    if not conv.all():
        s = len(conv)
        nr = {k: v[conv] if getattr(v, "shape", ())[:1] == (s,) else v
              for k, v in nr.items()}
        gns = {k: v[conv] if getattr(v, "shape", ())[:1] == (s,) else v
               for k, v in gns.items()}
    return nr, gns, frac


def compute_metrics(nr: Dict, gns: Dict) -> Dict:
    """Reference metric definitions (evaluate.py:89-148) + MSEs.

    Grids where the NR oracle did not converge are excluded from every
    error statistic (a non-converged runpf returns whatever iterate it
    stopped at — comparing against it is noise); `nr_converged_frac`
    reports how many survived. The reference never checks `success`
    (GNS/evaluate.py:34-40)."""
    nr, gns, nr_converged_frac = _filter_converged(nr, gns)
    time_diff = gns["time"] - nr["time"]
    nr_theta = np.deg2rad(nr["theta_deg"])
    theta_diff = np.abs(gns["theta"] - nr_theta)
    v_diff = np.abs(gns["v"] - nr["v"])

    # percent-error metrics (evaluate.py:116-119; the reference computes
    # them but only prints from commented lines). NR values near zero make
    # the ratio unbounded — non-finite entries are excluded from the
    # statistics (the reference would propagate inf/nan into a mean it
    # never prints).
    with np.errstate(divide="ignore", invalid="ignore"):
        theta_pct = np.abs((gns["theta"] - nr_theta) / nr_theta) * 100.0
        v_pct = np.abs((gns["v"] - nr["v"]) / nr["v"]) * 100.0
    theta_pct = theta_pct[np.isfinite(theta_pct)]
    v_pct = v_pct[np.isfinite(v_pct)]

    alf_diff = nr["line_flow"] - gns["line_flow"]
    with np.errstate(divide="ignore", invalid="ignore"):
        pct = np.abs(alf_diff / nr["line_flow"]) * 100.0
    # reference convention: sort flat, keep the lowest 50% (evaluate.py:126)
    pct_sorted = np.sort(pct, axis=None)[: pct.size // 2]

    # Offset-invariant theta comparison (mean-center both sides). With
    # slack alignment in run_gns the raw metric above already lives in the
    # oracle's gauge; this variant is kept as the alignment-independent
    # cross-check (raw ~= centered when alignment is on).
    th_g = gns["theta"] - gns["theta"].mean(axis=1, keepdims=True)
    th_n = nr_theta - nr_theta.mean(axis=1, keepdims=True)
    theta_centered_diff = np.abs(th_g - th_n)

    return {
        "time_diff_mean": float(time_diff.mean()),
        "time_diff_std": float(time_diff.std()),
        "theta_abs_diff_mean": float(theta_diff.mean()),
        "theta_abs_diff_std": float(theta_diff.std()),
        "v_abs_diff_mean": float(v_diff.mean()),
        "v_abs_diff_std": float(v_diff.std()),
        "theta_pct_err_mean": float(theta_pct.mean()) if theta_pct.size else float("nan"),
        "theta_pct_err_std": float(theta_pct.std()) if theta_pct.size else float("nan"),
        "v_pct_err_mean": float(v_pct.mean()) if v_pct.size else float("nan"),
        "v_pct_err_std": float(v_pct.std()) if v_pct.size else float("nan"),
        "v_mse": float((v_diff**2).mean()),
        "theta_mse": float((theta_diff**2).mean()),
        "theta_centered_mse": float((theta_centered_diff**2).mean()),
        "theta_centered_abs_mean": float(theta_centered_diff.mean()),
        "last_loss_mean": float(gns["last_loss"].mean()),
        "last_loss_std": float(gns["last_loss"].std()),
        "alf_pct_p20": float(np.percentile(pct_sorted, 20)),
        "alf_pct_median": float(np.median(pct_sorted)),
        "alf_pct_p80": float(np.percentile(pct_sorted, 80)),
        "nr_converged_frac": nr_converged_frac,
    }


def plot_per_bus_errors(nr, gns, cfg: GNSConfig, out_path: str) -> str:
    """Per-bus mean+-std errorbar plot (reference evaluate.py:151-178).

    Non-converged oracle grids are excluded, matching compute_metrics —
    one diverged iterate (|v| ~ 1e9) would otherwise dominate every
    errorbar."""
    nr, gns, _ = _filter_converged(nr, gns)
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    nr_theta = np.deg2rad(nr["theta_deg"])
    v_err = nr["v"] - gns["v"]
    th_err = np.abs(gns["theta"] - nr_theta)
    n = v_err.shape[1]
    xs = np.arange(1, n + 1)

    fig, ax = plt.subplots()
    ax.errorbar(xs, v_err.mean(0), v_err.std(0), color="tab:blue",
                marker="o", linestyle="None", label="V", capsize=5, capthick=1)
    ax.errorbar(xs, th_err.mean(0), th_err.std(0), color="tab:orange",
                marker="o", linestyle="None", label="theta", capsize=5, capthick=1)
    ax.set_xlabel("Bus number")
    ax.set_ylabel("Error of GNS compared to NR")
    ax.set_title(
        f"V and Theta error with K={cfg.K}, L={cfg.latent_dim}, "
        f"Distinct Phi={cfg.multiple_phi}"
    )
    ax.grid(True)
    fig.legend()
    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    fig.savefig(out_path)
    plt.close(fig)
    return out_path


def load_eval_cases(
    case_nr: int,
    nr_eval_samples: int,
    data_dir: Optional[str] = None,
    total_grids: int = 10001,
) -> List[Dict]:
    """Last nr_eval_samples pickles — the oracle's range (evaluate.py:31)."""
    out = []
    for i in range(total_grids - nr_eval_samples, total_grids):
        path = pickle_path(case_nr, i, data_dir)
        try:
            with open(path, "rb") as f:
                out.append(pickle.load(f))
        except FileNotFoundError:
            raise FileNotFoundError(
                f"{path} not found. The NR oracle needs raw case-dict "
                f"pickles: generate them with `python -m gns_tpu.utils "
                f"--case {case_nr} --num {total_grids - 1}` (without "
                f"--no-pickles), pass --total-grids to match a smaller "
                f"dataset, or use --from-base-case to generate eval grids "
                f"in memory."
            ) from None
    return out


def evaluate(
    params,
    cfg: GNSConfig,
    cases: List[Dict],
    method: str = "auto",
    plot_path: Optional[str] = None,
    verbose: bool = True,
    nr_backend: str = "scipy",
) -> Dict:
    """Full evaluation: NR + GNS on the SAME grids (Q6 fixed), metrics."""
    nr = run_nr_oracle(cases, backend=nr_backend)
    gns = run_gns(params, cfg, cases, method=method)
    m = compute_metrics(nr, gns)
    if plot_path:
        m["plot"] = plot_per_bus_errors(nr, gns, cfg, plot_path)
    if verbose:
        print(
            f"Time difference GNS and NR: Mean: {m['time_diff_mean']:.5f}, "
            f"Std: {m['time_diff_std']:.5f}"
        )
        print(
            f"Theta difference GNS and NR: Mean: {m['theta_abs_diff_mean']:.5f}, "
            f"Std: {m['theta_abs_diff_std']:.5f}"
        )
        print(
            f"V difference GNS and NR: Mean: {m['v_abs_diff_mean']:.5f}, "
            f"Std: {m['v_abs_diff_std']:.5f}"
        )
        print(
            f"GNS last loss: Mean: {m['last_loss_mean']:.5f}, "
            f"Std: {m['last_loss_std']:.5f}"
        )
        print(
            "Active line flow percentage difference GNS and NR: "
            f"20th percentile: {m['alf_pct_p20']:.5f}, "
            f"Median: {m['alf_pct_median']:.5f}, "
            f"80th percentile: {m['alf_pct_p80']:.5f}"
        )
        print(f"v MSE: {m['v_mse']:.6g}, theta MSE: {m['theta_mse']:.6g}")
    return m
