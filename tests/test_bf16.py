"""Mixed-precision (bfloat16 MLP compute) tests."""

import numpy as np

import jax

from gns_tpu.models.gns import gns_forward_batch, init_gns_params
from gns_tpu.train.trainer import init_train_state, make_train_step
from gns_tpu.utils.augment import generate_cases
from gns_tpu.utils.config import GNSConfig
from gns_tpu.utils.prepare import batch_from_cases

F32 = GNSConfig(K=2, latent_dim=8, hidden_dim=8, reference_parity=False)
BF16 = F32.replace(compute_dtype="bfloat16")


def test_bf16_forward_close_to_f32():
    data = batch_from_cases(list(generate_cases(14, 3, seed=4)))
    params = init_gns_params(jax.random.key(0), F32)
    out32 = gns_forward_batch(params, F32, data, method="scatter")
    out16 = gns_forward_batch(params, BF16, data, method="scatter")
    # bf16 has ~3 decimal digits; K=2 steps of compounding.
    np.testing.assert_allclose(
        np.asarray(out16.v), np.asarray(out32.v), rtol=0.05, atol=0.05
    )
    assert np.all(np.isfinite(np.asarray(out16.total_loss)))


def test_bf16_training_learns():
    data = batch_from_cases(list(generate_cases(14, 7, seed=6)))
    state = init_train_state(jax.random.key(1), BF16)
    step = make_train_step(BF16, method="scatter", donate=False)
    _, m0 = step(state, data)
    for _ in range(40):
        state, m = step(state, data)
    assert float(m["loss"]) < float(m0["loss"])
    # params remain float32 (mixed precision, not low-precision storage)
    assert all(x.dtype == np.float32 for x in jax.tree.leaves(state.params))
