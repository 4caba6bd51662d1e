"""DP-sharded solver/serving family == single-device (simulated 8-dev mesh).

Round-5 surface (parallel/solver_dp.py): every batched solver and the
serving predictor accept a mesh and shard the batch axis over its "dp"
axis. Grids never interact inside a solve, so the sharded fixed points,
verdicts and predictions must equal the unsharded ones — asserted here on
the CPU-simulated 8-device mesh (conftest.py), including the
non-divisible-batch padding path.
"""

import numpy as np
import pytest

import jax


@pytest.fixture(scope="module", autouse=True)
def _clear_jit_caches_after_module():
    """This module compiles many 8-device SPMD solver programs; drop the
    executables when done so later modules (the pipeline-parallel tests
    compile large programs) don't abort on accumulated compiler/runtime
    resources (observed: full-suite SIGABRT inside backend_compile at
    test_tp_pp only when these modules ran first)."""
    yield
    jax.clear_caches()


from gns_tpu.eval.contingency import screen_n1
from gns_tpu.eval.dcpf import solve_batched_dc
from gns_tpu.eval.fdpf import solve_batched_fdpf
from gns_tpu.eval.nr_batched import solve_batched, solve_mixed
from gns_tpu.eval.solve import solve_ac
from gns_tpu.parallel.solver_dp import padded_rows, solver_mesh
from gns_tpu.utils.augment import generate_cases
from gns_tpu.utils.cases import load_case


@pytest.fixture(scope="module")
def mesh():
    return solver_mesh()


@pytest.fixture(scope="module")
def grids14():
    # 12 grids: NOT divisible by 8, so the pad-and-trim path is exercised
    return list(generate_cases(14, 12, seed=77, feasible_only=True))[:12]


def _assert_solver_equal(a, b):
    assert np.array_equal(a["converged"], b["converged"])
    np.testing.assert_allclose(a["v"], b["v"], rtol=0, atol=2e-6)
    np.testing.assert_allclose(
        a["theta_deg"], b["theta_deg"], rtol=0, atol=2e-4
    )


def test_padded_rows(mesh):
    assert padded_rows(12, mesh) == 16
    assert padded_rows(16, mesh) == 16
    assert padded_rows(1, mesh) == 8
    assert padded_rows(12, None) == 12


def test_nr_sharded_equals_single_device(mesh, grids14):
    ref = solve_batched(grids14)
    out = solve_batched(grids14, mesh=mesh)
    _assert_solver_equal(out, ref)
    # duplicate padding rows converge like their source: same lock-step
    # iteration count
    assert out["iterations"] == ref["iterations"]


def test_fdpf_sharded_equals_single_device(mesh, grids14):
    ref = solve_batched_fdpf(grids14)
    out = solve_batched_fdpf(grids14, mesh=mesh)
    _assert_solver_equal(out, ref)


def test_dc_sharded_equals_single_device(mesh, grids14):
    ref = solve_batched_dc(grids14)
    out = solve_batched_dc(grids14, mesh=mesh)
    np.testing.assert_allclose(
        out["theta_deg"], ref["theta_deg"], rtol=0, atol=2e-4
    )
    np.testing.assert_allclose(out["pf_mw"], ref["pf_mw"], rtol=0, atol=2e-3)
    np.testing.assert_allclose(
        out["p_slack_mw"], ref["p_slack_mw"], rtol=0, atol=2e-3
    )


def test_solve_ac_auto_sharded_equals_single_device(mesh, grids14):
    ref = solve_ac(grids14)  # method auto -> fdpf + NR fallback
    out = solve_ac(grids14, mesh=mesh)
    assert out["method"] == ref["method"] == "fdpf"
    _assert_solver_equal(out, ref)


def test_solve_mixed_sharded(mesh):
    cases = (list(generate_cases(14, 5, seed=3, feasible_only=True))[:5]
             + list(generate_cases(30, 5, seed=4, feasible_only=True))[:5])
    ref = solve_mixed(cases, method="auto")
    out = solve_mixed(cases, method="auto", mesh=mesh)
    assert np.array_equal(out["converged"], ref["converged"])
    mask = np.isfinite(ref["v"])
    np.testing.assert_allclose(out["v"][mask], ref["v"][mask], atol=2e-6)


def test_screen_sharded_same_verdicts(mesh):
    case = load_case(14)
    ref = screen_n1(case, gen_outages=True)
    out = screen_n1(case, gen_outages=True, mesh=mesh)
    assert np.array_equal(out["converged"], ref["converged"])
    assert np.array_equal(out["v_violations"], ref["v_violations"])
    assert np.array_equal(out["worst"], ref["worst"])
    conv = ref["converged"]
    np.testing.assert_allclose(out["v"][conv], ref["v"][conv], atol=2e-6)


def test_predictor_sharded_equals_single_device(mesh, grids14):
    import jax

    from gns_tpu.models.gns import init_gns_params
    from gns_tpu.serve import GNSPredictor
    from gns_tpu.utils.config import GNSConfig

    cfg = GNSConfig(K=2, latent_dim=8, hidden_dim=8, multiple_phi=True,
                    seed=0)
    params = init_gns_params(jax.random.key(0), cfg)
    ref = GNSPredictor(params, cfg, batch_size=16).predict(grids14)
    out = GNSPredictor(params, cfg, batch_size=16, mesh=mesh).predict(
        grids14
    )
    np.testing.assert_allclose(out["v"], ref["v"], rtol=2e-5, atol=1e-6)
    np.testing.assert_allclose(
        out["theta"], ref["theta"], rtol=2e-5, atol=1e-5
    )


def test_predictor_batch_size_must_divide_mesh(mesh):
    import jax

    from gns_tpu.models.gns import init_gns_params
    from gns_tpu.serve import GNSPredictor
    from gns_tpu.utils.config import GNSConfig

    cfg = GNSConfig(K=2, latent_dim=8, hidden_dim=8, multiple_phi=True)
    params = init_gns_params(jax.random.key(0), cfg)
    with pytest.raises(ValueError, match="must divide"):
        GNSPredictor(params, cfg, batch_size=12, mesh=mesh)
