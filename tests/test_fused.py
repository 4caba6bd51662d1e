"""Fused edge-stage Pallas kernel tests (interpreter mode on CPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gns_tpu.models.blocks import init_learning_block
from gns_tpu.ops.pallas_fused import _xla_reference, fused_edge_stage

S, N, E, L, H = 3, 14, 20, 8, 8


@pytest.fixture(scope="module")
def problem():
    m = jax.random.normal(jax.random.key(0), (S, N, L))
    feats = jax.random.normal(jax.random.key(1), (S, E, 5))
    mask = jnp.ones((S, E)).at[:, -2:].set(0.0)
    seg = jax.random.randint(jax.random.key(2), (E,), 0, N)
    sp = {
        h: init_learning_block(jax.random.key(i + 3), L + 5, H, L)
        for i, h in enumerate(("phi_v", "phi_theta", "phi_m"))
    }
    return m, feats, mask, seg, sp


def test_fused_matches_xla(problem):
    m, feats, mask, seg, sp = problem
    ref = _xla_reference(m, feats, mask, seg, sp, 0.01)
    out = fused_edge_stage(m, feats, mask, seg, sp, 0.01, True)
    for r, o in zip(ref, out):
        np.testing.assert_allclose(np.asarray(o), np.asarray(r), rtol=1e-5, atol=1e-6)


def test_fused_respects_mask(problem):
    m, feats, mask, seg, sp = problem
    out_masked = fused_edge_stage(m, feats, mask, seg, sp, 0.01, True)
    # zeroing the masked edges' features must not change the result
    feats2 = feats * mask[..., None]
    m2 = m  # gather depends on dst only; masked rows contribute 0 anyway
    out2 = fused_edge_stage(m2, feats2, mask, seg, sp, 0.01, True)
    for a, b in zip(out_masked, out2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6)


def test_fused_vjp_matches_xla(problem):
    m, feats, mask, seg, sp = problem

    def loss_f(mm, sp_):
        o = fused_edge_stage(mm, feats, mask, seg, sp_, 0.01, True)
        return sum((x ** 2).sum() for x in o)

    def loss_r(mm, sp_):
        o = _xla_reference(mm, feats, mask, seg, sp_, 0.01)
        return sum((x ** 2).sum() for x in o)

    g1 = jax.grad(loss_f, argnums=(0, 1))(m, sp)
    g2 = jax.grad(loss_r, argnums=(0, 1))(m, sp)
    for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-4, atol=1e-5)
