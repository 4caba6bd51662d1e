"""Batched DC power flow (eval/dcpf.py): exactness in the DC limit,
realistic-grid approximation quality, and slack/flow bookkeeping."""

import copy

import numpy as np

from gns_tpu.eval.dcpf import solve_batched_dc
from gns_tpu.eval.newton_raphson import newton_raphson_pf
from gns_tpu.utils.cases import load_case


def _dc_limit_case(scale=1e-2):
    """case14 pushed into the DC regime: lossless branches (r=0), no
    charging/shunts, unit voltage set-points, loads/generation scaled
    down so angles are small — there the AC solution IS the DC solution
    up to O(theta^2)."""
    case = copy.deepcopy(load_case(14))
    bus = np.asarray(case["bus"], float)
    br = np.asarray(case["branch"], float)
    gen = np.asarray(case["gen"], float)
    br[:, 2] = 0.0  # r
    br[:, 4] = 0.0  # charging
    bus[:, 4] = 0.0  # Gs
    bus[:, 5] = 0.0  # Bs
    bus[:, 7] = 1.0  # Vm
    gen[:, 5] = 1.0  # vg
    bus[:, 2] *= scale
    bus[:, 3] *= scale
    gen[:, 1] *= scale
    case["bus"], case["branch"], case["gen"] = bus, br, gen
    return case


def test_dc_exact_in_dc_limit():
    case = _dc_limit_case()
    ref = newton_raphson_pf(case)
    assert ref.success
    dc = solve_batched_dc([case])
    np.testing.assert_allclose(dc["theta_deg"][0], ref.va_deg, atol=2e-3)


def test_dc_approximates_realistic_grids():
    """On the authentic case118 base case the DC angles track the AC
    solution to within the textbook few-degree band and the flow
    pattern is essentially the AC one."""
    case = load_case(118)
    ref = newton_raphson_pf(case)
    assert ref.success
    dc = solve_batched_dc([case])
    err = np.abs(dc["theta_deg"][0] - ref.va_deg)
    assert err.mean() < 3.0 and err.max() < 8.0  # measured 2.3 / 5.3
    # slack injection balances the lossless system: equals total load
    # plus shunt draw minus the other generators' schedule
    bus = np.asarray(case["bus"], float)
    gen = np.asarray(case["gen"], float)
    types = bus[:, 1].astype(int)
    slack_bus = int(bus[np.flatnonzero(types == 3)[0], 0])
    others = gen[gen[:, 0] != slack_bus]
    expect = bus[:, 2].sum() + bus[:, 4].sum() - others[:, 1].sum()
    np.testing.assert_allclose(dc["p_slack_mw"][0], expect, rtol=1e-4)


def test_dc_batched_consistent_and_shift_aware():
    """Batching returns per-grid solutions; a phase-shifter moves DC
    flow exactly like the textbook says (flow through the shifted
    branch changes by ~b*shift)."""
    base = load_case(14)
    shifted = copy.deepcopy(base)
    br = np.asarray(shifted["branch"], float)
    br[0, 9] = 3.0  # 3-degree shift on branch 0
    shifted["branch"] = br
    out = solve_batched_dc([base, shifted])
    assert out["theta_deg"].shape[0] == 2
    assert not np.allclose(out["pf_mw"][0, 0], out["pf_mw"][1, 0])
    # and the batch rows match the single-grid solves exactly
    single = solve_batched_dc([shifted])
    np.testing.assert_allclose(out["pf_mw"][1], single["pf_mw"][0],
                               atol=1e-4)


def test_lodf_matches_outaged_dc_resolve():
    """LODF closed form == actually re-solving the outaged case: for a
    non-bridge outage, post-outage DC flows predicted by one
    factorization match the DC solution of the status-zeroed case."""
    from gns_tpu.eval.contingency import find_bridges
    from gns_tpu.eval.dcpf import lodf_matrix

    case = load_case(14)
    bridges = set(find_bridges(case).tolist())
    base = solve_batched_dc([case])
    f0 = base["pf_mw"][0].astype(np.float64)
    lodf = lodf_matrix(case)
    k = next(i for i in range(len(f0)) if i not in bridges)
    outaged = copy.deepcopy(case)
    br = np.asarray(outaged["branch"], float)
    br[k, 10] = 0.0
    outaged["branch"] = br
    resolved = solve_batched_dc([outaged])["pf_mw"][0]
    predicted = f0 + lodf[:, k] * f0[k]
    predicted[k] = 0.0
    np.testing.assert_allclose(predicted, resolved, atol=5e-3)


def test_lodf_bridges_match_tarjan():
    """LODF's singular columns (self-PTDF -> 1) are exactly the Tarjan
    bridge set on every authentic table — the same structural-islanding
    equivalence the ranked screen's stage 1 rests on."""
    from gns_tpu.eval.contingency import find_bridges
    from gns_tpu.eval.dcpf import dc_outage_severity

    for c in (14, 30, 118):
        case = load_case(c)
        sev = dc_outage_severity(case)
        assert (
            set(find_bridges(case).tolist())
            == set(np.flatnonzero(sev["islanded"]).tolist())
        )
