"""Capture + summarize a device trace of the headline train step.

Round-4 VERDICT weak #6: the "latency/occupancy-bound" verdict on
single-chip perf (MFU 14.4% at 10.1% HBM utilization) was analytic —
argued from the FLOP model and the dead-end A/B ledger — with no trace
confirming the gap structure. This tool captures a jax.profiler trace
of the production train step (case300 K=4 b256, bf16+fold+hybrid — the
bench.py config) THROUGH the axon relay, writes the raw artifact, and
prints the structural summary the argument needs:

  * per-module device time (the "XLA Modules" lane),
  * intra-module occupancy: sum of op durations / module span — if ~1,
    the device is never idle INSIDE a step and the bound is the op
    chain itself, not HBM stalls or bubbles;
  * op-size statistics (ops/step, mean op duration) — the tiny-op
    signature;
  * top ops by time (data movement vs compute).

Inter-step gaps in the trace are NOT meaningful on the relay (dispatch
round trips sit between steps); the per-step conclusions are.

Writes docs/TRACE_R5.json + keeps the compressed Perfetto trace at
docs/trace_r5.trace.json.gz (viewable in Perfetto/XProf).

Usage: python tools/capture_trace.py [--steps 6]
"""

from __future__ import annotations

import argparse
import collections
import glob
import gzip
import json
import os
import shutil
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=6)
    ap.add_argument("--out-json",
                    default=os.path.join(REPO, "docs", "TRACE_R5.json"))
    ap.add_argument("--out-trace",
                    default=os.path.join(REPO, "docs",
                                         "trace_r5.trace.json.gz"))
    args = ap.parse_args()

    import jax

    from gns_tpu.train.trainer import init_train_state, make_train_step
    from gns_tpu.utils.augment import generate_cases
    from gns_tpu.utils.config import preset
    from gns_tpu.utils.prepare import batch_from_cases, extract_shared_topology
    from gns_tpu.utils.profiling import trace

    cfg = preset("case300").replace(
        K=4, compute_dtype="bfloat16", fold_output="on",
        gather_method="hybrid",
    )
    batch = batch_from_cases(list(generate_cases(300, 255, seed=0)))
    state = init_train_state(jax.random.key(0), cfg)
    step = make_train_step(cfg, method="hybrid", donate=False,
                           topo=extract_shared_topology(batch))
    state, m = step(state, batch)  # compile + warm
    _ = float(m["loss"])

    tmp = "/tmp/gns_trace_cap"
    shutil.rmtree(tmp, ignore_errors=True)
    with trace(tmp):
        for _ in range(args.steps):
            state, m = step(state, batch)
        _ = float(m["loss"])  # execution barrier inside the trace window

    srcs = glob.glob(tmp + "/plugins/profile/*/*.trace.json.gz")
    if not srcs:
        raise SystemExit("no trace produced — relay capture unsupported?")
    shutil.copy(srcs[0], args.out_trace)

    with gzip.open(srcs[0]) as f:
        ev = json.load(f)["traceEvents"]
    names = {}
    for e in ev:
        if e.get("ph") == "M" and e.get("name") == "thread_name":
            names[(e["pid"], e["tid"])] = e["args"].get("name")
    dev_pid = {k[0] for k, v in names.items() if v == "XLA Ops"}
    if not dev_pid:
        raise SystemExit("no device op lane in trace")
    pid = dev_pid.pop()
    tid_of = {v: k[1] for k, v in names.items() if k[0] == pid}

    modules = sorted(
        (e for e in ev if e.get("ph") == "X" and e["pid"] == pid
         and e["tid"] == tid_of["XLA Modules"]),
        key=lambda e: e["ts"],
    )
    ops = [e for e in ev if e.get("ph") == "X" and e["pid"] == pid
           and e["tid"] == tid_of["XLA Ops"]]
    n_steps = len(modules)
    mod_us = [e["dur"] for e in modules]
    # intra-module occupancy: ops inside each module window
    occ = []
    for me in modules:
        lo, hi = me["ts"], me["ts"] + me["dur"]
        busy = sum(e["dur"] for e in ops if lo <= e["ts"] < hi)
        occ.append(busy / me["dur"])
    per_step_ops = len(ops) / max(n_steps, 1)
    mean_op_us = sum(e["dur"] for e in ops) / max(len(ops), 1)
    top = collections.Counter()
    for e in ops:
        top[e["name"]] += e["dur"]
    topk = [
        {"op": n, "us_per_step": round(d / n_steps, 1)}
        for n, d in top.most_common(10)
    ]
    out = {
        "config": "case300 K=4 b256 bf16+fold+hybrid (bench.py headline)",
        "steps_traced": n_steps,
        "module_ms_per_step": round(sum(mod_us) / n_steps / 1e3, 3),
        "intra_module_occupancy": round(sum(occ) / len(occ), 4),
        "ops_per_step": round(per_step_ops),
        "mean_op_us": round(mean_op_us, 2),
        "top_ops_us_per_step": topk,
        "note": ("occupancy ~1 => no intra-step idle: the step is a "
                 "serial chain of ~1k microscopic ops (tiny-op-bound), "
                 "not HBM- or FLOP-bound; inter-step gaps reflect relay "
                 "dispatch and are excluded"),
    }
    with open(args.out_json, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out, indent=1), flush=True)


if __name__ == "__main__":
    main()
