"""N-2 screen (eval/n2.py): device-built variants == explicit variants,
structural islanding exactness, ranked-screen plumbing."""

import copy

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


from gns_tpu.eval.n2 import (
    n2_islanding_pairs,
    n2_pairs,
    screen_n2,
    screen_n2_ranked,
)
from gns_tpu.eval.nr_batched import solve_batched
from gns_tpu.utils.cases import load_case


@pytest.fixture(scope="module")
def case14():
    return load_case(14)


@pytest.fixture(scope="module")
def pairs14(case14):
    return n2_pairs(case14)


def test_n2_pairs_shape(case14, pairs14):
    e = np.asarray(case14["branch"]).shape[0]
    assert pairs14.shape == (e * (e - 1) // 2, 2)
    assert (pairs14[:, 0] < pairs14[:, 1]).all()


def test_device_built_variants_match_explicit(case14, pairs14):
    """The in-program status-scatter must reproduce the explicit
    deep-copied double-outage variants exactly (same solver, same
    verdicts, identical states)."""
    rng = np.random.default_rng(0)
    sel = rng.choice(pairs14.shape[0], 24, replace=False)
    rep = screen_n2(case14, pairs14[sel], method="nr")
    variants = []
    for a, b in pairs14[sel]:
        v = copy.deepcopy(case14)
        v["branch"] = np.asarray(v["branch"], np.float64).copy()
        v["branch"][a, 10] = 0.0
        v["branch"][b, 10] = 0.0
        variants.append(v)
    ref = solve_batched(variants)
    assert np.array_equal(rep["converged"], ref["converged"])
    both = rep["converged"] & ref["converged"]
    np.testing.assert_allclose(
        rep["v"][both], ref["v"][both], rtol=0, atol=1e-6
    )


def test_structural_islanding_exact(case14, pairs14):
    """Brute-force connectivity check: a pair islands iff the in-service
    graph minus both branches is disconnected."""
    isl = n2_islanding_pairs(case14)
    br = np.asarray(case14["branch"], np.float64)
    n = np.asarray(case14["bus"]).shape[0]
    f = br[:, 0].astype(int) - 1
    t = br[:, 1].astype(int) - 1
    for i, (a, b) in enumerate(pairs14):
        keep = np.ones(br.shape[0], bool)
        keep[[a, b]] = False
        # union-find connectivity
        parent = list(range(n))

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for j in np.flatnonzero(keep):
            ra, rb = find(int(f[j])), find(int(t[j]))
            parent[ra] = rb
        connected = len({find(x) for x in range(n)}) == 1
        assert isl[i] == (not connected), (i, pairs14[i])


def test_screen_worst_unions_structural_and_solver(case14, pairs14):
    rep = screen_n2(case14, pairs14)
    worst = set(rep["worst"].tolist())
    assert set(np.flatnonzero(rep["islanded"]).tolist()) <= worst
    assert set(np.flatnonzero(~rep["converged"]).tolist()) <= worst
    assert set(np.flatnonzero(rep["v_violations"] > 0).tolist()) <= worst


def test_ranked_screen_verifies_topk(case14, pairs14):
    from gns_tpu.models.pretrained import load_pretrained

    params, cfg = load_pretrained("14-n1")
    pairs = pairs14[~n2_islanding_pairs(case14)]
    rep = screen_n2_ranked(case14, params, cfg, pairs, top_k=16)
    assert rep["n_solves"] == 16
    assert rep["verified_idx"].size == 16
    # severity is finite on rankable pairs, +inf never (islanding was
    # pre-filtered from `pairs`)
    assert np.isfinite(rep["severity"]).all()
    # verified converged states agree with a direct solve
    vi = rep["verified_idx"]
    direct = screen_n2(case14, pairs[vi])
    both = rep["converged"][vi] & direct["converged"]
    np.testing.assert_allclose(
        rep["v"][vi][both], direct["v"][both], rtol=0, atol=5e-5
    )


def test_warm_start_same_fixed_point(case14, pairs14):
    pairs = pairs14[~n2_islanding_pairs(case14)][:32]
    flat = screen_n2(case14, pairs)
    n = np.asarray(case14["bus"]).shape[0]
    wv = np.ones((32, n), np.float32)
    wth = np.zeros((32, n), np.float32)
    warm = screen_n2(case14, pairs, warm_start=(wv, wth))
    assert np.array_equal(flat["converged"], warm["converged"])
    both = flat["converged"]
    np.testing.assert_allclose(
        flat["v"][both], warm["v"][both], rtol=0, atol=5e-5
    )


def test_screen_n2_sharded_equals_single_device(case14, pairs14):
    from gns_tpu.parallel.solver_dp import solver_mesh

    pairs = pairs14[:44]  # not divisible by 8: exercises padding
    ref = screen_n2(case14, pairs)
    out = screen_n2(case14, pairs, mesh=solver_mesh())
    assert np.array_equal(ref["converged"], out["converged"])
    both = ref["converged"]
    np.testing.assert_allclose(
        ref["v"][both], out["v"][both], rtol=0, atol=2e-6
    )


def test_n2_flow_screening_case30():
    """N-2 flow columns: the pairwise loading computation must equal the
    explicit-variant ac_branch_loading, and the screen must report flow
    violations on case30 (real published ratings; the base operating
    point is already overloaded so every converged pair inherits >=1)."""
    from gns_tpu.eval.contingency import ac_branch_loading
    from gns_tpu.eval.n2 import n2_branch_loading

    case = load_case(30)
    pairs = n2_pairs(case)
    rep = screen_n2(case, pairs)
    conv = rep["converged"]
    assert (rep["flow_violations"][conv] >= 1).all()
    assert (rep["flow_violations"][~conv] == 0).all()
    assert set(np.flatnonzero(rep["flow_violations"] > 0).tolist()) <= set(
        rep["worst"].tolist()
    )
    # cross-check the no-materialization loading against explicit variants
    sel = np.flatnonzero(conv)[:12]
    fast = n2_branch_loading(case, pairs[sel], rep["v"][sel],
                             rep["theta_deg"][sel])
    variants = []
    for a, b in pairs[sel]:
        va = copy.deepcopy(case)
        va["branch"] = np.asarray(va["branch"], np.float64).copy()
        va["branch"][a, 10] = 0.0
        va["branch"][b, 10] = 0.0
        variants.append(va)
    slow = ac_branch_loading(variants, rep["v"][sel], rep["theta_deg"][sel])
    np.testing.assert_allclose(fast, slow, rtol=1e-12, atol=1e-9)
