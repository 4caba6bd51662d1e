"""Serving API: batched prediction with program reuse + gauge decode."""

import numpy as np
import pytest

import jax

from gns_tpu.models.gns import gns_forward, init_gns_params
from gns_tpu.serve import GNSPredictor, predict
from gns_tpu.utils.augment import generate_cases
from gns_tpu.utils.config import GNSConfig
from gns_tpu.utils.prepare import prepare_case

CFG = GNSConfig(K=2, latent_dim=8, hidden_dim=8, reference_parity=False)


@pytest.fixture(scope="module")
def model():
    return init_gns_params(jax.random.key(0), CFG)


def test_predict_matches_single_grid_forward(model):
    cases = list(generate_cases(14, 3, seed=31))
    out = predict(model, CFG, cases, method="scatter", align_slack=False)
    assert out["v"].shape == (4, 14) and out["theta"].shape == (4, 14)
    for i, case in enumerate(cases):
        buses, lines, gens = prepare_case(case)
        ref = gns_forward(model, CFG, buses, lines, gens, method="scatter")
        np.testing.assert_allclose(out["v"][i], np.asarray(ref.v),
                                   rtol=2e-5, atol=1e-6)
        np.testing.assert_allclose(out["theta"][i], np.asarray(ref.theta),
                                   rtol=2e-5, atol=1e-5)


def test_predict_decodes_slack_gauge(model):
    cases = list(generate_cases(14, 2, seed=32))
    out = predict(model, CFG, cases, method="scatter")
    bus = np.asarray(cases[0]["bus"])
    slack = int(np.flatnonzero(bus[:, 1] == 3)[0])
    np.testing.assert_allclose(
        out["theta"][:, slack], np.deg2rad(bus[slack, 8]), atol=1e-6
    )


def test_predictor_pads_and_reuses_program(model):
    pred = GNSPredictor(model, CFG, batch_size=8, method="scatter")
    a = pred.predict(list(generate_cases(9, 2, seed=33)))   # 3 grids -> pad 8
    b = pred.predict(list(generate_cases(9, 4, seed=34)))   # 5 grids -> pad 8
    assert a["v"].shape == (3, 9) and b["v"].shape == (5, 9)
    assert len(pred._compiled) == 1  # one program served both requests
    with pytest.raises(ValueError):
        pred.predict([])


def test_predict_mixed_size_request(model):
    """A single request mixing case9 and case14 grids takes the padded
    masked path (no shared topology across all grids) and still matches
    the per-grid forward for every member."""
    c9 = list(generate_cases(9, 2, seed=51))
    c14 = list(generate_cases(14, 2, seed=52))
    mixed = [c9[0], c14[0], c9[1], c14[1]]
    out = predict(model, CFG, mixed, method="scatter", align_slack=False)
    assert out["v"].shape == (4, 14)  # padded to the larger bus count
    for i, case in enumerate(mixed):
        buses, lines, gens = prepare_case(case)
        ref = gns_forward(model, CFG, buses, lines, gens, method="scatter")
        n = buses.shape[0]
        np.testing.assert_allclose(out["v"][i, :n], np.asarray(ref.v),
                                   rtol=2e-5, atol=1e-5)


def test_predictor_chunks_large_requests(model):
    """Requests larger than batch_size split into batch_size dispatches of
    the single cached program (bounded HBM + program reuse), and the
    chunked result equals the per-grid forward on every grid."""
    pred = GNSPredictor(model, CFG, batch_size=8, method="scatter",
                        align_slack=False)
    for n_req in (3, 8, 20, 37):
        cases = list(generate_cases(9, n_req - 1, seed=40 + n_req))
        out = pred.predict(cases)
        assert out["v"].shape == (n_req, 9)
        assert out["last_loss"].shape == (n_req,)
        # spot-check first/last grid against the unbatched forward
        for i in (0, n_req - 1):
            buses, lines, gens = prepare_case(cases[i])
            ref = gns_forward(model, CFG, buses, lines, gens,
                              method="scatter")
            np.testing.assert_allclose(out["v"][i], np.asarray(ref.v),
                                       rtol=2e-5, atol=1e-6)
    assert len(pred._compiled) == 1  # one program across all request sizes
