"""Verify the shipped IEEE 30-bus table against the published solution.

The IEEE 30-bus power-flow solution is canonically published (total system
losses 17.557 MW, slack generation ~260.96 MW on a 283.4 MW load, bus-30
voltage ~0.992 p.u.). A subtly wrong impedance, tap, shunt or load anywhere
in the table would shift those figures, so reproducing them to all
published digits from a flat start is a whole-table checksum for the
reconstruction shipped in gns_tpu/utils/cases.py.

Usage: python tools/verify_case30.py   (exits non-zero on mismatch)
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
    case = load_case(30)
    bus = case["bus"]
    total_pd = bus[:, 2].sum()
    res = newton_raphson_pf(case)
    total_gen = res.gen[:, 1].sum()
    losses = total_gen - total_pd
    checks = [
        ("NR converges", res.success),
        ("<=5 iterations from flat start", res.iterations <= 5),
        ("total load 283.4 MW (published)", abs(total_pd - 283.4) < 1e-9),
        ("losses 17.557 MW (published)", abs(losses - 17.557) < 5e-3),
        ("slack Pg ~260.96 MW (published)", abs(res.gen[0, 1] - 260.96) < 0.05),
        ("bus 30 Vm ~0.992 p.u. (published)", abs(res.vm[-1] - 0.992) < 1e-3),
        ("all Vm in [0.94, 1.09]", bool(np.all((res.vm > 0.94) & (res.vm < 1.09)))),
    ]
    ok = True
    for name, passed in checks:
        print(f"  [{'ok' if passed else 'FAIL'}] {name}")
        ok &= bool(passed)
    print(
        f"  solution: losses {losses:.3f} MW, slack Pg {res.gen[0, 1]:.3f} MW, "
        f"iters {res.iterations}"
    )
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
