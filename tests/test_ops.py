"""Kernel tests: segment-sum/gather across all lowerings, forward and VJP,
including padded/empty segments (SURVEY.md §4 'Kernel tests').

Pallas kernels run in interpreter mode on the CPU test mesh; the real-TPU
path is exercised by bench/TPU smoke scripts.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gns_tpu.ops import segment_sum
from gns_tpu.ops.pallas_segment import pallas_gather, pallas_segment_sum
from gns_tpu.ops.segment import broadcast_col0_segment_sum


def _random_problem(key, e=37, n=17, d=8, batch=None):
    k1, k2 = jax.random.split(jax.random.key(key))
    shape = (e, d) if batch is None else (batch, e, d)
    data = jax.random.normal(k1, shape, jnp.float32)
    seg = jax.random.randint(k2, (e,), 0, n, jnp.int32)
    return data, seg, n


@pytest.mark.parametrize("method", ["scatter", "onehot", "hybrid"])
def test_segment_sum_methods_agree(method):
    data, seg, n = _random_problem(0)
    ref = np.zeros((n, data.shape[1]), np.float32)
    np.add.at(ref, np.asarray(seg), np.asarray(data))
    out = segment_sum(data, seg, n, method=method)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-5, atol=1e-6)


def test_segment_sum_1d():
    data, seg, n = _random_problem(1)
    data = data[:, 0]
    ref = np.zeros(n, np.float32)
    np.add.at(ref, np.asarray(seg), np.asarray(data))
    for method in ("scatter", "onehot"):
        np.testing.assert_allclose(
            np.asarray(segment_sum(data, seg, n, method=method)), ref,
            rtol=1e-5, atol=1e-6,
        )


def test_empty_segments_and_out_of_range():
    """Buses with no edges stay zero; out-of-range ids are dropped."""
    data = jnp.ones((4, 3), jnp.float32)
    seg = jnp.array([0, 0, 2, 9], jnp.int32)  # 9 >= n -> dropped
    for method in ("scatter", "onehot"):
        out = np.asarray(segment_sum(data, seg, 5, method=method))
        assert out[0].sum() == 6.0  # two edges
        assert np.all(out[1] == 0) and np.all(out[3] == 0) and np.all(out[4] == 0)
        assert out[2].sum() == 3.0


def test_hybrid_vjps_match():
    """'hybrid' custom-VJP lowerings: values and grads equal the plain paths."""
    from gns_tpu.ops.segment import gather

    data, seg, n = _random_problem(7)
    nodes = jax.random.normal(jax.random.key(9), (n, data.shape[1]))
    g0 = jax.grad(lambda a: jnp.sum(jnp.sin(segment_sum(a, seg, n, method="scatter"))))(data)
    g1 = jax.grad(lambda a: jnp.sum(jnp.sin(segment_sum(a, seg, n, method="hybrid"))))(data)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g0), rtol=1e-5, atol=1e-6)
    h0 = jax.grad(lambda a: jnp.sum(jnp.sin(gather(a, seg, method="take"))))(nodes)
    h1 = jax.grad(lambda a: jnp.sum(jnp.sin(gather(a, seg, method="hybrid"))))(nodes)
    np.testing.assert_allclose(np.asarray(h1), np.asarray(h0), rtol=1e-5, atol=1e-6)
    # bf16 primals keep bf16 cotangents (the one-hot path accumulates f32)
    b16 = data.astype(jnp.bfloat16)
    gb = jax.grad(
        lambda a: jnp.sum(segment_sum(a, seg, n, method="hybrid").astype(jnp.float32))
    )(b16)
    assert gb.dtype == jnp.bfloat16


def test_degree_segment_sum():
    """Static-topology degree-slot take-tree: exact vs scatter, fwd+bwd,
    1-D and vmap; empty segments stay zero."""
    from gns_tpu.ops.segment import make_degree_segment_sum

    rng = np.random.RandomState(3)
    e, n, d = 37, 25, 4
    ids = rng.randint(0, n - 3, e).astype(np.int32)  # last 3 segments empty
    data = jnp.asarray(rng.randn(e, d), jnp.float32)
    f = make_degree_segment_sum(ids, n)
    ref = segment_sum(data, jnp.asarray(ids), n, method="scatter")
    np.testing.assert_array_equal(np.asarray(f(data)), np.asarray(ref))
    assert np.all(np.asarray(f(data))[-3:] == 0)
    g0 = jax.grad(lambda a: jnp.sum(jnp.sin(segment_sum(a, jnp.asarray(ids), n, method="scatter"))))(data)
    g1 = jax.grad(lambda a: jnp.sum(jnp.sin(f(a))))(data)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g0), rtol=1e-6, atol=1e-7)
    np.testing.assert_array_equal(
        np.asarray(f(data[:, 0])),
        np.asarray(segment_sum(data[:, 0], jnp.asarray(ids), n, method="scatter")),
    )
    batched = jax.vmap(f)(jnp.stack([data, 2 * data]))
    assert batched.shape == (2, n, d)


def test_physics_degree_matches_scatter():
    """physics_refresh(method='degree') == scatter path, both parity modes."""
    from gns_tpu.physics.fused import physics_refresh
    from gns_tpu.utils.augment import generate_cases
    from gns_tpu.utils.prepare import batch_from_cases, extract_shared_topology

    batch = batch_from_cases(list(generate_cases(30, 2, seed=4)))
    topo = extract_shared_topology(batch)
    v = jnp.ones(batch.buses.shape[1]) * 1.01
    th = jnp.zeros(batch.buses.shape[1])
    for parity in (True, False):
        a = physics_refresh(v, th, batch.buses[0], batch.lines[0],
                            batch.generators[0], reference_parity=parity,
                            method="scatter", topo=topo)
        b = physics_refresh(v, th, batch.buses[0], batch.lines[0],
                            batch.generators[0], reference_parity=parity,
                            method="degree", topo=topo)
        for x, y in zip(a, b):
            np.testing.assert_allclose(np.asarray(y), np.asarray(x), atol=1e-6)


def test_physics_stacked_matches_unstacked():
    """The stacked-incidence paper-mode physics lowerings (fused.py
    _STACK_GATHER: one (2E,2) gather; _STACK_AGG: one (N,2E+G)
    aggregation) are exact restructurings — forward AND gradients match
    the default two-sided path. Kept as measured opt-ins (a wash-to-3%-
    loss at the headline config; see the module comment)."""
    import gns_tpu.physics.fused as fused
    from gns_tpu.physics.fused import physics_refresh
    from gns_tpu.utils.augment import generate_cases
    from gns_tpu.utils.prepare import batch_from_cases, extract_shared_topology

    batch = batch_from_cases(list(generate_cases(30, 2, seed=4)))
    topo = extract_shared_topology(batch)
    n = batch.buses.shape[1]
    v = jnp.ones(n) * 1.01 + 0.01 * jnp.arange(n) / n
    th = 0.02 * jnp.sin(jnp.arange(n).astype(jnp.float32))

    def run(qg_gen_only):
        def f(v, th):
            out = physics_refresh(
                v, th, batch.buses[0], batch.lines[0], batch.generators[0],
                reference_parity=False, method="onehot", topo=topo,
                qg_gen_only=qg_gen_only,
            )
            return sum((x ** 2).sum() for x in out[1:])
        return float(f(v, th)), jax.grad(f, argnums=(0, 1))(v, th)

    try:
        fused._STACK_GATHER, fused._STACK_AGG = False, False
        base_l, base_g = run(True)
        for flags in ((True, False), (False, True), (True, True)):
            fused._STACK_GATHER, fused._STACK_AGG = flags
            l, g = run(True)
            np.testing.assert_allclose(l, base_l, rtol=1e-6)
            # exact in real arithmetic; f32 reassociation noise only (the
            # stacked contraction sums in a different order)
            for a, b in zip(jax.tree.leaves(g), jax.tree.leaves(base_g)):
                np.testing.assert_allclose(
                    np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5
                )
    finally:
        fused._STACK_GATHER, fused._STACK_AGG = False, False


def test_broadcast_col0_quirk():
    data, seg, n = _random_problem(2, d=1)
    out = np.asarray(broadcast_col0_segment_sum(data, seg, n, latent_dim=6))
    assert out.shape == (n, 6)
    assert np.all(out[:, 1:] == 0)
    ref = np.asarray(segment_sum(data[:, 0], seg, n, method="scatter"))
    np.testing.assert_allclose(out[:, 0], ref, rtol=1e-6)


@pytest.mark.parametrize("batch", [None, 3])
def test_pallas_segment_sum_interpret(batch):
    data, seg, n = _random_problem(3, batch=batch)
    ref = segment_sum(
        data if batch is None else data.reshape(-1, data.shape[-1]),
        jnp.tile(seg, batch or 1)
        + jnp.repeat(jnp.arange(batch or 1) * n, seg.shape[0]),
        n * (batch or 1),
        method="scatter",
    )
    ref = np.asarray(ref).reshape((batch or 1), n, data.shape[-1])
    out = np.asarray(pallas_segment_sum(data, seg, n, True))
    out = out.reshape((batch or 1), n, data.shape[-1])
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-6)


def test_pallas_gather_interpret():
    key = jax.random.key(7)
    data = jax.random.normal(key, (11, 4), jnp.float32)
    seg = jnp.array([0, 3, 3, 10, 5], jnp.int32)
    out = np.asarray(pallas_gather(data, seg, 5, interpret=True))
    np.testing.assert_allclose(out, np.asarray(data)[np.asarray(seg)], rtol=1e-6)


def test_pallas_segment_sum_vjp_matches_xla():
    data, seg, n = _random_problem(4)

    def f_pallas(x):
        return (pallas_segment_sum(x, seg, n, True) ** 2).sum()

    def f_xla(x):
        return (segment_sum(x, seg, n, method="scatter") ** 2).sum()

    g_pallas = jax.grad(f_pallas)(data)
    g_xla = jax.grad(f_xla)(data)
    np.testing.assert_allclose(
        np.asarray(g_pallas), np.asarray(g_xla), rtol=1e-5, atol=1e-6
    )
