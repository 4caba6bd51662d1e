"""Determinism and recovery tests (SURVEY.md §5: the TPU-native analog of
race detection is cross-sharding determinism; the recovery story is
checkpoint-resume equivalence)."""

import numpy as np
import pytest

import jax

from gns_tpu.models.gns import gns_forward_batch, init_gns_params
from gns_tpu.train.checkpoint import load_checkpoint, save_checkpoint
from gns_tpu.train.trainer import init_train_state, make_train_step
from gns_tpu.utils.augment import generate_cases
from gns_tpu.utils.config import GNSConfig
from gns_tpu.utils.prepare import batch_from_cases

CFG = GNSConfig(K=2, latent_dim=8, hidden_dim=8, seed=0)


@pytest.fixture(scope="module")
def data():
    return batch_from_cases(list(generate_cases(14, 7, seed=8)))


def test_forward_bitwise_deterministic(data):
    params = init_gns_params(jax.random.key(0), CFG)
    a = gns_forward_batch(params, CFG, data, method="onehot")
    b = gns_forward_batch(params, CFG, data, method="onehot")
    np.testing.assert_array_equal(np.asarray(a.v), np.asarray(b.v))
    np.testing.assert_array_equal(
        np.asarray(a.total_loss), np.asarray(b.total_loss)
    )


def test_train_bitwise_deterministic(data):
    def run():
        state = init_train_state(jax.random.key(1), CFG)
        step = make_train_step(CFG, method="scatter", donate=False)
        for _ in range(5):
            state, m = step(state, data)
        return jax.device_get(state.params), float(m["loss"])

    p1, l1 = run()
    p2, l2 = run()
    assert l1 == l2
    for a, b in zip(jax.tree.leaves(p1), jax.tree.leaves(p2)):
        np.testing.assert_array_equal(a, b)


def test_checkpoint_resume_equivalence(tmp_path, data):
    """2 steps + checkpoint + restore + 2 steps == 4 uninterrupted steps."""
    step = make_train_step(CFG, method="scatter", donate=False)

    state = init_train_state(jax.random.key(2), CFG)
    for _ in range(4):
        state, _ = step(state, data)
    uninterrupted = jax.device_get(state.params)

    state = init_train_state(jax.random.key(2), CFG)
    for _ in range(2):
        state, _ = step(state, data)
    path = str(tmp_path / "mid")
    save_checkpoint(path, state)
    restored = load_checkpoint(path, CFG)
    for _ in range(2):
        restored, _ = step(restored, data)
    resumed = jax.device_get(restored.params)

    for a, b in zip(jax.tree.leaves(uninterrupted), jax.tree.leaves(resumed)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
