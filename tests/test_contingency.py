"""N-1 contingency screening (eval/contingency.py)."""

import copy

import numpy as np
import pytest

from gns_tpu.eval.contingency import n1_variants, screen_n1
from gns_tpu.utils.cases import load_case


def test_screen_n1_case14_flags_islanding_and_matches_oracle():
    """All 20 branch + 4 non-slack-gen outages of case14 solve in one
    batched dispatch; the bridge outage that islands bus 8 (its only
    connection is the 7-8 transformer) must be flagged non-converged, and
    converged contingencies must match the float64 oracle."""
    from gns_tpu.eval.newton_raphson import newton_raphson_pf

    case = load_case(14)
    rep = screen_n1(case, gen_outages=True)
    assert len(rep["outages"]) == 24  # 20 branches + 4 non-slack gens
    assert rep["v"].shape == (24, 14)

    # the islanding outage: the branch whose removal disconnects bus 8
    br = np.asarray(case["branch"])
    bridge = next(
        i for i in range(br.shape[0])
        if sorted((int(br[i, 0]), int(br[i, 1]))) == [7, 8]
    )
    assert not rep["converged"][bridge]
    assert bridge in rep["worst"]
    # everything else converges
    assert rep["converged"].sum() == 23

    # spot-check two converged contingencies against the f64 oracle,
    # solving the ACTUAL variant dicts (a gen-outage variant may carry a
    # PV->PQ converted bus; the oracle must see the same bus types)
    variants = n1_variants(case, gen_outages=True)
    for i in (0, 21):
        r = newton_raphson_pf(variants[i])
        assert r.success
        np.testing.assert_allclose(rep["v"][i], r.vm, atol=2e-5)

    # violations counted at PQ buses only (gen magnitudes are set-points)
    assert (rep["v_violations"][~rep["converged"]] == 0).all()
    assert np.isnan(rep["v_min"][bridge])


def test_screen_n1_warm_started_matches_flat():
    """The GNS-warm-started screen (fused hybrid) reaches the same fixed
    points and flags as the flat-start screen."""
    from gns_tpu.models.pretrained import available_cases, load_pretrained

    if "14-sup" not in available_cases():
        pytest.skip("14-sup checkpoint not shipped")
    params, cfg = load_pretrained("14-sup")
    case = load_case(14)
    flat = screen_n1(case)
    warm = screen_n1(case, params=params, cfg=cfg)
    np.testing.assert_array_equal(warm["converged"], flat["converged"])
    ok = flat["converged"]
    np.testing.assert_allclose(warm["v"][ok], flat["v"][ok], atol=5e-4)


def test_encode_impedance_keeps_newton_solution():
    """encode_impedance rewrites the outaged branch to r=x=1e6, b=0 so
    the GNS can see it; the Newton solution must be IDENTICAL to the
    status-only variant (status already zeroes the admittance)."""
    from gns_tpu.eval.nr_batched import solve_batched

    case = load_case(14)
    plain = n1_variants(case)[:5]
    enc = n1_variants(case, encode_impedance=True)[:5]
    a = solve_batched(plain)
    b = solve_batched(enc)
    np.testing.assert_array_equal(a["converged"], b["converged"])
    ok = a["converged"]
    np.testing.assert_allclose(b["v"][ok], a["v"][ok], atol=1e-6)


def test_admittance_inputs_change_messages_not_physics():
    """GNSConfig.admittance_inputs transforms ONLY the message-MLP input
    representation: with an outaged branch encoded r=x=1e6 the residual
    (physics, raw r/x/b) is finite and the forward differs from the raw-
    feature forward; parity mode must reject the knob."""
    import jax
    import pytest as _pytest

    from gns_tpu.models.gns import gns_forward, init_gns_params
    from gns_tpu.utils.config import GNSConfig
    from gns_tpu.utils.prepare import prepare_case

    case = n1_variants(load_case(14), encode_impedance=True)[0]
    cfg = GNSConfig(K=2, latent_dim=8, hidden_dim=8,
                    reference_parity=False, qg_gen_only=True,
                    admittance_inputs=True)
    params = init_gns_params(jax.random.key(0), cfg)
    buses, lines, gens = prepare_case(case, paper_shunts=False)
    out = gns_forward(params, cfg, buses, lines, gens, method="scatter")
    assert np.isfinite(float(out.total_loss))
    raw = gns_forward(params, cfg.replace(admittance_inputs=False),
                      buses, lines, gens, method="scatter")
    assert not np.allclose(np.asarray(out.v), np.asarray(raw.v))

    with _pytest.raises(ValueError):
        gns_forward(
            params,
            GNSConfig(K=2, latent_dim=8, hidden_dim=8,
                      reference_parity=True, admittance_inputs=True),
            buses, lines, gens, method="scatter",
        )


def test_gen_outage_pq_conversion():
    """A bus whose last in-service generator is outaged converts PV -> PQ
    (pypower bustypes semantics): its magnitude becomes a SOLVED value
    and sags below the lost set-point, instead of being held with
    implicit unbounded reactive support. In case14 every non-slack PV bus
    has exactly one generator, so all 4 gen outages convert."""
    from gns_tpu.eval.newton_raphson import newton_raphson_pf

    case = load_case(14)
    gen = np.asarray(case["gen"])
    conv_vs = n1_variants(case, branch_outages=False, gen_outages=True)
    held_vs = n1_variants(
        case, branch_outages=False, gen_outages=True,
        gen_pq_conversion=False,
    )
    assert len(conv_vs) == 4
    for conv_v, held_v in zip(conv_vs, held_vs):
        _, i = conv_v["outage"]
        row = int(gen[i, 0]) - 1
        assert int(np.asarray(conv_v["bus"])[row, 1]) == 1  # PQ
        assert int(np.asarray(held_v["bus"])[row, 1]) == 2  # legacy PV
        rc = newton_raphson_pf(conv_v)
        rh = newton_raphson_pf(held_v)
        assert rc.success and rh.success
        # the held variant pins the set-point; the converted one solves a
        # genuinely lower post-contingency magnitude (voltage sag)
        vg = float(gen[i, 5])
        np.testing.assert_allclose(rh.vm[row], vg, atol=1e-8)
        assert rc.vm[row] < vg - 1e-4

    # the screen consumes the converted variants, grouped by bus-type
    # signature, and counts the converted bus's violations as PQ
    rep = screen_n1(case, branch_outages=False, gen_outages=True)
    assert rep["converged"].all()
    for k, conv_v in enumerate(conv_vs):
        _, i = conv_v["outage"]
        row = int(gen[i, 0]) - 1
        r = newton_raphson_pf(conv_v)
        np.testing.assert_allclose(rep["v"][k], r.vm, atol=2e-5)


def test_find_bridges_matches_nr_nonconvergence():
    """Graph bridge detection must flag EXACTLY the branch outages the
    full NR screen reports non-converged (islanding is structural)."""
    from gns_tpu.eval.contingency import find_bridges

    for case_nr in (14, 118):
        case = load_case(case_nr)
        bridges = set(find_bridges(case).tolist())
        full = screen_n1(case)
        nonconv = {
            full["outages"][i][1]
            for i in np.flatnonzero(~full["converged"])
        }
        assert bridges == nonconv, (case_nr, bridges, nonconv)


def test_screen_n1_ranked_structure_and_recall():
    """The ranked screen flags islanding structurally (severity inf, in
    'worst', zero Newton budget spent on it), verifies exactly top_k
    rankable contingencies, and its verified results match the full
    screen's fixed points."""
    from gns_tpu.eval.contingency import screen_n1_ranked
    from gns_tpu.models.pretrained import available_cases, load_pretrained

    if "14-n1" not in available_cases():
        pytest.skip("14-n1 checkpoint not shipped")
    params, cfg = load_pretrained("14-n1")
    case = load_case(14)
    rep = screen_n1_ranked(case, params, cfg, gen_outages=True, top_k=8)
    assert len(rep["outages"]) == 24
    assert rep["n_newton_solves"] == 8
    # bridge outage: flagged, severity inf, ranked first, NOT NR-verified
    isl = np.flatnonzero(rep["islanded"])
    assert isl.size == 1
    assert np.isinf(rep["severity"][isl]).all()
    assert rep["order"][0] == isl[0]
    assert isl[0] in rep["worst"]
    assert isl[0] not in rep["verified_idx"]
    # verified solves agree with the full screen
    full = screen_n1(case, gen_outages=True)
    ok = rep["verified_idx"][rep["converged"][rep["verified_idx"]]]
    np.testing.assert_allclose(
        rep["v"][ok], full["v"][ok], atol=5e-4
    )
    # every worst it reports is genuinely worst (precision 1.0; recall is
    # the measured quantity in docs/N1_SCREEN.json, not asserted here)
    true_worst = set(full["worst"].tolist())
    assert set(rep["worst"].tolist()) <= true_worst


def test_n1_variants_reject_missing_status_column():
    case = load_case(14)
    case = dict(case)
    case["branch"] = np.asarray(case["branch"])[:, :10]
    with pytest.raises(ValueError):
        n1_variants(case)


def test_screen_method_fdpf_same_verdicts():
    """The screen inherits solve_ac's solver axis: method='fdpf' (the
    round-4 fast-decoupled solver) reproduces full Newton's convergence
    verdicts — including islanded variants, whose singular B' yields a
    non-finite iterate that is reported non-converged exactly like
    Newton's divergence — and the same violation counts. Measured on the
    authentic case118 screen: identical verdicts at 2.2x (branch-only)
    / 1.3x (incl. gen-outage groups) wall speedup (docs/N1_SCREEN.md)."""
    case = load_case(14)
    nr = screen_n1(case, gen_outages=True, method="nr")
    fd = screen_n1(case, gen_outages=True, method="fdpf")
    assert (nr["converged"] == fd["converged"]).all()
    both = nr["converged"] & fd["converged"]
    assert np.nanmax(np.abs(nr["v"][both] - fd["v"][both])) < 5e-5
    assert (
        np.asarray(nr["v_violations"])[both]
        == np.asarray(fd["v_violations"])[both]
    ).all()


# --- flow-limit screening (round 5: published MVA ratings shipped) ---


def test_ac_branch_flows_reproduce_published_losses():
    """Power balance: Re(S_f + S_t) summed over branches is the system's
    series loss — 17.557 MW at case30's published solution, the same
    checksum tools/verify_case30.py anchors the table with."""
    from gns_tpu.eval.contingency import ac_branch_flows
    from gns_tpu.eval.newton_raphson import newton_raphson_pf

    case = load_case(30)
    r = newton_raphson_pf(case)
    assert r.success
    sf, st = ac_branch_flows([case], r.vm[None, :], r.va_deg[None, :])
    losses = float(np.real(sf + st).sum())
    assert abs(losses - 17.557) < 0.01


def test_screen_flow_violations_case30():
    """case30 carries real published ratings (its operating point is
    famously overloaded on branch 1-2 at ~1.35x), so the screen's flow
    columns are live: every converged variant inherits >= 1 violation,
    islanded variants count 0, and the outaged branch itself never
    violates (status 0 -> zero flow)."""
    from gns_tpu.eval.contingency import find_bridges

    case = load_case(30)
    rep = screen_n1(case)
    conv = rep["converged"]
    assert (rep["flow_violations"][conv] >= 1).all()
    assert (rep["flow_violations"][~conv] == 0).all()
    bridges = set(find_bridges(case).tolist())
    assert set(np.flatnonzero(~conv).tolist()) == bridges
    loading = np.asarray(rep["branch_loading_mva"])
    for i in np.flatnonzero(conv):
        assert loading[i, i] < 1e-6  # the outaged branch loads 0
    # flow-violating outages are in "worst" now
    assert set(np.flatnonzero(rep["flow_violations"] > 0).tolist()) <= set(
        rep["worst"].tolist()
    )


def test_screen_flow_violations_unrated_case14():
    """case14 publishes no meaningful limits (pypower ships 9900 =
    effectively unlimited); the screen must report ZERO flow violations
    rather than comparing against the placeholder."""
    case = load_case(14)
    rep = screen_n1(case)
    assert (rep["flow_violations"] == 0).all()
    # loadings themselves are still reported (finite for converged)
    conv = rep["converged"]
    assert np.isfinite(
        np.asarray(rep["branch_loading_mva"])[conv]
    ).all()
