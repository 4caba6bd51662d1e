"""Verify the shipped IEEE 118-bus table against the published solution.

The pypower/MATPOWER case118 table carries its solved voltage profile in
the bus Vm/Va columns, and its headline figures are published: total load
4242.0 MW / 1438.0 MVAr, total generation ~4374.9 MW (non-slack scheduled
Pg exactly 3861.0), losses ~132.86 MW, voltage extremes 0.943 (bus 76) /
1.050 (bus 25). Reproducing the stored profile from a FLAT start is a
whole-table checksum: the Vm/Va columns and the impedance table are
independent data channels, and they only agree if the impedances are
right (a wrong branch parameter shows up as a localized power mismatch
under the stored profile — the analysis that was used to debug this
reconstruction).

Documented residual: losses come to 132.67 MW vs ~132.86 published
(0.15%) — a handful of third-decimal entries spread diffusely. This gate
checks the reconstruction to its VERIFIED tolerances and fails if any of
them regresses; the loss gap is asserted to stay within its documented
band rather than claimed exact (unlike tools/verify_case30.py, which
reproduces its published loss figure to all digits).

Usage: python tools/verify_case118.py   (exits non-zero on mismatch)
"""

from __future__ import annotations

import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

from gns_tpu.eval.newton_raphson import newton_raphson_pf  # noqa: E402
from gns_tpu.utils.cases import load_case  # noqa: E402


def main() -> int:
    case = load_case(118)
    bus = case["bus"]
    gen = case["gen"]
    stored_vm = bus[:, 7].copy()
    stored_va = bus[:, 8].copy()

    total_pd = bus[:, 2].sum()
    total_qd = bus[:, 3].sum()
    slack_row = int(np.flatnonzero(gen[:, 0] == 69)[0])
    nonslack_pg = gen[:, 1].sum() - gen[slack_row, 1]

    # flat start: wipe the stored profile so the solve cannot cheat
    flat = {k: (v.copy() if hasattr(v, "copy") else v) for k, v in case.items()}
    flat["bus"] = flat["bus"].copy()
    flat["bus"][:, 7] = 1.0
    flat["bus"][:, 8] = 0.0
    res = newton_raphson_pf(flat)

    losses = res.gen[:, 1].sum() - total_pd
    dvm = res.vm - stored_vm
    dva = res.va_deg + 30.0 - stored_va  # decode into the stored gauge
    vm_rms = float(np.sqrt((dvm**2).mean()))
    va_rms = float(np.sqrt((dva**2).mean()))

    checks = [
        ("counts 118/186/54", bus.shape[0] == 118 and case["branch"].shape[0] == 186 and gen.shape[0] == 54),
        ("NR converges from flat start", res.success),
        ("<=5 iterations", res.iterations <= 5),
        ("total load 4242.0 MW (published, exact)", abs(total_pd - 4242.0) < 1e-9),
        ("total load 1438.0 MVAr (published, exact)", abs(total_qd - 1438.0) < 1e-9),
        ("non-slack Pg 3861.0 MW (published checksum, exact)", abs(nonslack_pg - 3861.0) < 1e-9),
        ("losses in documented band 132.67 +- 0.25 MW (~132.86 published)", abs(losses - 132.67) < 0.25),
        ("solved Vm reproduces stored profile (rms <= 1e-3)", vm_rms <= 1e-3),
        ("solved Va reproduces stored profile (rms <= 0.25 deg)", va_rms <= 0.25),
        ("min Vm 0.943 at bus 76 (published)", abs(res.vm.min() - 0.943) < 1e-3 and int(np.argmin(res.vm)) + 1 == 76),
        ("max Vm 1.050 at bus 25 (published)", abs(res.vm.max() - 1.050) < 1e-3 and int(np.argmax(res.vm)) + 1 == 25),
        ("total Qg ~795.7 MVAr (published, +-2)", abs(res.gen[:, 2].sum() - 795.7) < 2.0),
    ]
    ok = True
    for name, passed in checks:
        print(f"  [{'ok' if passed else 'FAIL'}] {name}")
        ok &= bool(passed)
    print(
        f"  solution: losses {losses:.3f} MW, slack Pg {res.gen[slack_row, 1]:.2f} MW, "
        f"iters {res.iterations}, Vm rms {vm_rms:.2e}, Va rms {va_rms:.3f} deg"
    )
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
