"""Verification gate for a candidate authentic IEEE 300-bus table.

The reference draws case300 from pypower (GNS/augment_grids.py:1,8; sizes
at GNS/utils.py:54-56). This environment has no pypower, no network, and
no case300 table anywhere on disk (checked: the reference ships only
case14 pickles), so an authentic table can only arrive by reconstruction
from memory — and a reconstruction is only shippable if it can be
VERIFIED against independently-known published figures (the discipline
that landed case30 and case118; see utils/cases.py module docstring).

This tool IS that gate, written ahead of the data: run it against any
candidate table and it checks every published anchor of the canonical
pypower/MATPOWER case300 that is independently recallable in this
environment, most importantly the case118-style whole-table checksum
(flat-start NR must reproduce the solved Vm/Va profile stored in the
bus table — impedances and profile are independent data channels that
only agree if the table is right).

The round-4 reconstruction ATTEMPT and why it could not close is
documented in docs/CASE300_ATTEMPT.md: the recallable anchors are the
aggregates below, but neither the 300x13 bus / 411x13 branch / 69x21
generator tables nor the published solved voltage profile are
recallable row-wise, and without an independently-recallable profile the
case118 discipline is circular (a table tuned to match remembered
aggregates would "verify" against the same memory it came from).
Against the shipped stand-in this gate documents exactly which anchors
fail (counts pass; numbering/slack/load/losses fail by construction —
the stand-in is labeled synthetic).

Published anchors checked (provenance + confidence in CASE300_ATTEMPT.md):
  * sizes 300 buses / 411 branches / 69 generators, baseMVA 100 (exact)
  * non-consecutive external bus numbering, max id 9533
  * reference (slack) bus external id 7049
  * total load 23525.85 MW (the figure OPF papers quote for case300)
  * base-case losses ~408.3 MW
  * flat-start NR convergence in <= 8 iterations
  * solved profile reproduces the stored Vm/Va columns (rms gates)

Usage:
  python tools/verify_case300.py                 # gate the shipped table
  python tools/verify_case300.py --pkl FILE.pkl  # gate a candidate pickle
Exits non-zero unless EVERY anchor passes (the shipped synthetic
stand-in is expected to fail; the tool says so).
"""

from __future__ import annotations

import argparse
import os
import pickle
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

from gns_tpu.eval.newton_raphson import newton_raphson_pf  # noqa: E402
from gns_tpu.utils.cases import load_case, renumber_case  # noqa: E402


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--pkl", help="candidate case300 pickle (pypower case dict)")
    args = ap.parse_args()

    if args.pkl:
        with open(args.pkl, "rb") as f:
            case = pickle.load(f)
        src = args.pkl
    else:
        case = load_case(300)
        src = "shipped gns_tpu case300 (LABELED SYNTHETIC stand-in)"
    print(f"verifying: {src}")

    bus = np.asarray(case["bus"], float)
    branch = np.asarray(case["branch"], float)
    gen = np.asarray(case["gen"], float)
    ids = bus[:, 0].astype(int)

    total_pd = bus[:, 2].sum()
    total_qd = bus[:, 3].sum()
    slack_ids = ids[np.flatnonzero(bus[:, 1] == 3)]
    external = not np.array_equal(ids, np.arange(1, bus.shape[0] + 1))
    stored_vm = bus[:, 7].copy()
    stored_va = bus[:, 8].copy()

    # flat-start solve (renumber external tables to consecutive ids first
    # — the ext2int analog `renumber_case` is a pure relabeling)
    solved = case
    if external:
        solved = renumber_case(case)
    flat = {
        k: (np.array(v, float) if isinstance(v, np.ndarray) else v)
        for k, v in solved.items()
    }
    flat["bus"] = np.array(flat["bus"], float)
    flat["bus"][:, 7] = 1.0
    flat["bus"][:, 8] = 0.0
    try:
        res = newton_raphson_pf(flat)
        nr_ok, iters = res.success, res.iterations
        losses = res.gen[:, 1].sum() - total_pd
        vm_rms = float(np.sqrt(((res.vm - stored_vm) ** 2).mean()))
        # gauge: align on the slack's stored angle
        sidx = int(np.flatnonzero(np.asarray(solved["bus"])[:, 1] == 3)[0])
        dva = (res.va_deg - res.va_deg[sidx]) - (stored_va - stored_va[sidx])
        va_rms = float(np.sqrt((dva**2).mean()))
    except Exception as e:  # singular / diverged
        print(f"  NR solve raised: {e}")
        nr_ok, iters, losses, vm_rms, va_rms = False, -1, np.nan, np.nan, np.nan

    checks = [
        ("counts 300/411/69",
         bus.shape[0] == 300 and branch.shape[0] == 411 and gen.shape[0] == 69),
        ("baseMVA 100", float(case["baseMVA"]) == 100.0),
        ("non-consecutive external numbering (authentic table)", external),
        ("max external bus id 9533", ids.max() == 9533),
        ("reference bus external id 7049",
         slack_ids.size == 1 and int(slack_ids[0]) == 7049),
        ("total load 23525.85 MW (published, +-1)",
         abs(total_pd - 23525.85) < 1.0),
        ("NR converges from flat start", nr_ok),
        ("<=8 iterations", 0 <= iters <= 8),
        ("losses ~408.3 MW (published band +-2)", abs(losses - 408.3) < 2.0),
        ("solved Vm reproduces stored profile (rms <= 1.5e-3)",
         vm_rms <= 1.5e-3),
        ("solved Va reproduces stored profile (rms <= 0.3 deg)",
         va_rms <= 0.3),
    ]
    ok = True
    for name, passed in checks:
        print(f"  [{'ok' if passed else 'FAIL'}] {name}")
        ok &= bool(passed)
    print(
        f"  figures: Pd {total_pd:.2f} MW, Qd {total_qd:.2f} MVAr, "
        f"slack id(s) {slack_ids.tolist()}, max id {ids.max()}, "
        f"losses {losses:.2f} MW, iters {iters}, "
        f"Vm rms {vm_rms:.2e}, Va rms {va_rms:.3f} deg"
    )
    if ok:
        print("VERIFIED: table passes every recallable published anchor")
    elif not args.pkl:
        print(
            "EXPECTED FAILURE: the shipped case300 is a labeled synthetic "
            "stand-in (utils/cases.py); see docs/CASE300_ATTEMPT.md for "
            "the reconstruction attempt record"
        )
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
