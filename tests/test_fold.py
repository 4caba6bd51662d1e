"""Aggregate-then-project fold tests (utils/config.py fold_output).

The fold rewrites the per-step linear algebra exactly:
    agg((H2 @ W4phi + b4phi) * mask) @ W1a
      == agg(H2 * mask) @ (W4phi @ W1a) + deg * (b4phi @ W1a)
so forward outputs and parameter gradients must match the unfolded fused
path to float reassociation noise, in both physics modes, with and without
padding masks.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gns_tpu.models.gns import gns_forward_batch, init_gns_params
from gns_tpu.utils.augment import generate_cases
from gns_tpu.utils.config import GNSConfig
from gns_tpu.utils.prepare import batch_from_cases, extract_shared_topology


def _cfg(**kw):
    base = dict(
        case_nr=14, K=3, latent_dim=8, hidden_dim=8, multiple_phi=True,
        compute_dtype="float32", fold_output="off",
    )
    base.update(kw)
    return GNSConfig(**base)


@pytest.fixture(scope="module")
def batch14():
    return batch_from_cases(list(generate_cases(14, 6, seed=1)))


@pytest.mark.parametrize("parity", [True, False])
def test_fold_forward_matches(batch14, parity):
    cfg0 = _cfg(reference_parity=parity)
    cfg1 = cfg0.replace(fold_output="on")
    params = init_gns_params(jax.random.key(0), cfg0)
    topo = extract_shared_topology(batch14)
    o0 = gns_forward_batch(params, cfg0, batch14, topo=topo)
    o1 = gns_forward_batch(params, cfg1, batch14, topo=topo)
    for name in ("v", "theta", "total_loss", "last_loss"):
        np.testing.assert_allclose(
            np.asarray(getattr(o1, name)),
            np.asarray(getattr(o0, name)),
            rtol=2e-4, atol=1e-5, err_msg=name,
        )


def test_fold_grads_match(batch14):
    cfg0 = _cfg(reference_parity=False)
    cfg1 = cfg0.replace(fold_output="on")
    params = init_gns_params(jax.random.key(0), cfg0)
    topo = extract_shared_topology(batch14)

    def loss(p, cfg):
        return jnp.mean(gns_forward_batch(p, cfg, batch14, topo=topo).total_loss)

    g0 = jax.grad(lambda p: loss(p, cfg0))(params)
    g1 = jax.grad(lambda p: loss(p, cfg1))(params)
    scale = max(float(jnp.max(jnp.abs(x))) for x in jax.tree.leaves(g0))

    def check(path, a, b):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a),
            rtol=5e-3, atol=5e-4 * scale, err_msg=jax.tree_util.keystr(path),
        )

    jax.tree_util.tree_map_with_path(check, g0, g1)


def test_fold_respects_masks():
    """Padded (masked) edges/buses must not leak through the deg feature."""
    # pad case14 grids to a larger bucket by batching with case30 shapes:
    # build a batch where line_mask has zeros.
    cases = list(generate_cases(14, 4, seed=2))
    batch = batch_from_cases(cases, pad_sizes=(20, 26, 7))
    assert float(batch.line_mask.min()) == 0.0
    cfg0 = _cfg(reference_parity=False)
    cfg1 = cfg0.replace(fold_output="on")
    params = init_gns_params(jax.random.key(0), cfg0)
    o0 = gns_forward_batch(params, cfg0, batch)
    o1 = gns_forward_batch(params, cfg1, batch)
    np.testing.assert_allclose(
        np.asarray(o1.total_loss), np.asarray(o0.total_loss), rtol=2e-4
    )
    np.testing.assert_allclose(
        np.asarray(o1.v), np.asarray(o0.v), rtol=2e-4, atol=1e-5
    )


def test_fold_auto_resolution():
    assert not _cfg().resolved_fold_output  # f32 auto -> off
    assert _cfg(fold_output="auto", compute_dtype="bfloat16").resolved_fold_output
    assert not _cfg(
        fold_output="auto", compute_dtype="bfloat16", multiple_phi=False
    ).resolved_fold_output
    assert _cfg(fold_output="on").resolved_fold_output
    with pytest.raises(ValueError):
        _cfg(fold_output="yes").resolved_fold_output
