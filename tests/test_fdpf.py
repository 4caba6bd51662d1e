"""Fast-decoupled batched solver (eval/fdpf.py): fixed-point agreement
with the float64 Newton oracle, edge-list injection correctness against
the dense trig kernel, warm-start semantics, and stiff-network
convergence. The reference's only solver path is pypower runpf called
one grid at a time (GNS/evaluate.py:25-40)."""

import numpy as np
import pytest

from gns_tpu.eval.fdpf import calc_injections, solve_batched_fdpf
from gns_tpu.eval.newton_raphson import newton_raphson_pf
from gns_tpu.eval.nr_batched import build_nr_batch, solve_batched
from gns_tpu.utils.augment import generate_cases


def test_fdpf_matches_scipy_oracle():
    """Same fixed point as the float64 sequential oracle (~the f32
    mismatch floor), same convergence verdicts — the contract that makes
    fdpf an exact solver despite the decoupled update operators."""
    cases = list(generate_cases(30, 6, seed=3, feasible_only=True))[1:]
    res = solve_batched_fdpf(cases, chunk_size=4)  # exercises chunking
    assert res["converged"].all()
    assert res["method"] == "fdpf"
    for i, c in enumerate(cases):
        ref = newton_raphson_pf(c)
        assert ref.success
        np.testing.assert_allclose(res["v"][i], ref.vm, atol=3e-5)
        np.testing.assert_allclose(res["theta_deg"][i], ref.va_deg,
                                   atol=3e-3)


def test_edge_list_injections_match_dense_kernel():
    """The O(S*E) edge-list injection evaluation equals the dense
    (S, N, N) trig-kernel formula the Newton solver uses — on the raw
    stored voltage profile of perturbed grids (taps, shifts, shunts and
    branch status all exercised by the augmentation)."""
    cases = list(generate_cases(30, 4, seed=11))[1:]
    p, q = calc_injections(cases)
    nb = build_nr_batch(cases)
    vm = np.stack([np.asarray(c["bus"])[:, 7] for c in cases]).astype(
        np.float32
    )
    va = np.deg2rad(
        np.stack([np.asarray(c["bus"])[:, 8] for c in cases])
    ).astype(np.float32)
    cosmk = np.cos(va[:, :, None] - va[:, None, :])
    sinmk = np.sin(va[:, :, None] - va[:, None, :])
    a1 = nb.gmat * cosmk + nb.bmat * sinmk
    a2 = nb.gmat * sinmk - nb.bmat * cosmk
    p_dense = vm * np.einsum("snk,sk->sn", a1, vm)
    q_dense = vm * np.einsum("snk,sk->sn", a2, vm)
    np.testing.assert_allclose(p, p_dense, atol=2e-4)
    np.testing.assert_allclose(q, q_dense, atol=2e-4)


@pytest.mark.parametrize("alg", ["XB", "BX"])
def test_fdpf_converges_stiff_case118(alg):
    """Both classical Stott-Alsac variants converge on the authentic
    stiff IEEE case118 (345 kV branches, |y| ~ 250 p.u.) despite the
    float32 B-matrix inverse — the inverse only shapes the update
    direction; the gate is the true mismatch."""
    cases = list(generate_cases(118, 3, seed=5, feasible_only=True))[1:]
    res = solve_batched_fdpf(cases, alg=alg)
    assert res["converged"].all()
    nr = solve_batched(cases)
    np.testing.assert_allclose(res["v"], nr["v"], atol=3e-5)


def test_fdpf_warm_start_same_fixed_point_fewer_iterations():
    """Warm-start seeding (PQ magnitudes + PV/PQ angles only, like every
    other arm): the fixed point is unchanged and a near-solution start
    converges in <= 2 half-step pairs vs ~10+ flat."""
    cases = list(generate_cases(30, 4, seed=7, feasible_only=True))[1:]
    flat = solve_batched_fdpf(cases)
    assert flat["converged"].all()
    ws = (flat["v"], np.deg2rad(flat["theta_deg"]))
    warm = solve_batched_fdpf(cases, warm_start=ws)
    assert warm["converged"].all()
    np.testing.assert_allclose(warm["v"], flat["v"], atol=5e-5)
    assert (warm["iterations_per_grid"] <= 2).all()
    assert warm["iterations"] < flat["iterations"]


def test_fdpf_bad_alg_raises():
    cases = list(generate_cases(14, 2, seed=0))[1:]
    with pytest.raises(ValueError):
        solve_batched_fdpf(cases, alg="ZZ")
