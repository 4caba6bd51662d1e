"""Training-layer tests: the jitted vmapped step learns, checkpoints
round-trip (Orbax and torch interop), early stop fires."""

import numpy as np
import pytest

import jax

from gns_tpu.train.checkpoint import (
    export_torch,
    import_torch,
    load_checkpoint,
    save_checkpoint,
)
from gns_tpu.train.trainer import init_train_state, make_train_step, train
from gns_tpu.utils.augment import generate_cases
from gns_tpu.utils.config import GNSConfig
from gns_tpu.utils.prepare import batch_from_cases

CFG = GNSConfig(
    K=2, latent_dim=8, hidden_dim=8, multiple_phi=True,
    batch_size=8, nr_samples=16, epochs=8, seed=0,
)


@pytest.fixture(scope="module")
def data14():
    cases = list(generate_cases(14, 16, seed=3))[1:]
    return batch_from_cases(cases)


def test_init_correction_scale_near_identity(data14):
    """init_correction_scale < 1 scales the update heads' output-layer
    init so fresh deep models start near identity (finite loss on stiff
    cases — the K8/L40-on-case118 NaN-at-init fix); parity mode rejects
    the knob (the reference's init has no equivalent)."""
    from gns_tpu.models.gns import gns_forward_batch, init_gns_params

    cfg = GNSConfig(
        K=2, latent_dim=8, hidden_dim=8, multiple_phi=True, seed=0,
        reference_parity=False, qg_gen_only=True,
        init_correction_scale=0.1,
    )
    p = init_gns_params(jax.random.key(0), cfg)
    p1 = init_gns_params(jax.random.key(0), cfg.replace(init_correction_scale=1.0))
    # only the output layers of the L heads are scaled
    np.testing.assert_allclose(
        np.asarray(p["L_v"]["w4"]), 0.1 * np.asarray(p1["L_v"]["w4"]), rtol=1e-6
    )
    np.testing.assert_array_equal(
        np.asarray(p["L_v"]["w1"]), np.asarray(p1["L_v"]["w1"])
    )
    np.testing.assert_array_equal(
        np.asarray(p["phi_v"]["w4"]), np.asarray(p1["phi_v"]["w4"])
    )
    out = gns_forward_batch(p, cfg, data14)
    assert np.isfinite(float(np.asarray(out.total_loss).mean()))

    with pytest.raises(ValueError):
        init_gns_params(
            jax.random.key(0),
            GNSConfig(K=2, latent_dim=8, hidden_dim=8,
                      reference_parity=True, init_correction_scale=0.5),
        )


def test_loss_decreases(data14):
    state = init_train_state(jax.random.key(0), CFG)
    step = make_train_step(CFG, method="scatter", donate=False)
    batch = data14[:8]
    _, m0 = step(state, batch)
    for _ in range(60):
        state, m = step(state, batch)
    assert float(m["loss"]) < float(m0["loss"]) * 0.75, (
        f"loss did not decrease: {float(m0['loss'])} -> {float(m['loss'])}"
    )
    assert np.isfinite(float(m["loss"]))


def test_train_driver_early_stop(data14):
    cfg = CFG.replace(epochs=50, early_stop_patience=1, learning_rate=0.0)
    # lr=0 -> loss constant -> early stop must fire after patience+1 epochs.
    best, history = train(cfg, data14, method="scatter")
    assert len(history) <= 4


def test_train_driver_improves(data14):
    cfg = CFG.replace(epochs=5)
    best, history = train(cfg, data14, method="scatter")
    assert history[-1]["final_loss"] < history[0]["final_loss"]
    # regression: best params must stay readable after donated steps
    assert all(np.isfinite(np.asarray(x)).all() for x in jax.tree.leaves(best.params))


def test_checkpoint_roundtrip(tmp_path, data14):
    state = init_train_state(jax.random.key(1), CFG)
    step = make_train_step(CFG, method="scatter", donate=False)
    state, _ = step(state, data14[:8])

    path = str(tmp_path / "ckpt")
    save_checkpoint(path, state)
    restored = load_checkpoint(path, CFG)
    for a, b in zip(jax.tree.leaves(state.params), jax.tree.leaves(restored.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(jax.tree.leaves(state.opt_state), jax.tree.leaves(restored.opt_state)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_torch_interop_roundtrip(tmp_path):
    state = init_train_state(jax.random.key(2), CFG)
    path = str(tmp_path / "model.pth")
    export_torch(path, state, CFG)
    back = import_torch(path, CFG)
    for a, b in zip(jax.tree.leaves(state.params), jax.tree.leaves(back.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)


def test_train_multi_groups():
    """train_multi: one model over per-case groups (own buckets + topo)."""
    from gns_tpu.train.trainer import train_multi
    from gns_tpu.utils.augment import generate_cases
    from gns_tpu.utils.prepare import batch_from_cases

    cfg = GNSConfig(K=2, latent_dim=6, hidden_dim=6, epochs=3,
                    batch_size=4, reference_parity=False, seed=0)
    datasets = [
        batch_from_cases(list(generate_cases(9, 4, seed=1))[1:]),
        batch_from_cases(list(generate_cases(14, 4, seed=2))[1:]),
    ]
    best, history = train_multi(cfg, datasets)
    assert len(history) >= 1
    assert len(history[0]["group_losses"]) == 2
    assert all(l == l for l in history[-1]["group_losses"])  # finite
    # loss should improve over epochs on at least one group
    assert history[-1]["final_loss"] <= history[0]["final_loss"]


def test_supervised_training_decreases_label_error():
    """train/supervised.py: the supervised metric (v/theta MSE vs NR
    labels) must drop under training; labels require feasible grids."""
    import jax

    from gns_tpu.train.supervised import nr_labels, train_supervised
    from gns_tpu.utils.augment import generate_cases
    from gns_tpu.utils.config import GNSConfig
    from gns_tpu.utils.prepare import batch_from_cases

    cases = list(generate_cases(14, 16, seed=0, feasible_only=True))[1:]
    data = batch_from_cases(cases)
    labels = nr_labels(cases, n_pad=data.buses.shape[1])
    cfg = GNSConfig(case_nr=14, K=2, latent_dim=8, hidden_dim=8,
                    reference_parity=False, qg_gen_only=True,
                    epochs=15, early_stop_patience=15, batch_size=16, seed=0)
    best, hist = train_supervised(cfg, data, labels, w_physics=0.1)
    assert hist[-1]["sup"] < hist[0]["sup"]
    assert all(not h["diverged"] for h in hist)

    # labels for a non-feasible set must be refused
    import pytest as _pytest

    bad = list(generate_cases(300, 3, seed=5))[1:]  # full-strength: diverges
    with _pytest.raises(ValueError):
        nr_labels(bad)


def test_supervised_multi_trains_one_model_over_cases():
    """train_supervised_multi (the multi-sup generalist's trainer): one
    parameter set over per-case (GridBatch, NRLabels) buckets; the mean
    supervised metric must drop and per-case metrics must be tracked."""
    from gns_tpu.train.supervised import nr_labels, train_supervised_multi
    from gns_tpu.utils.augment import generate_cases
    from gns_tpu.utils.config import GNSConfig
    from gns_tpu.utils.prepare import batch_from_cases

    cfg = GNSConfig(case_nr=0, K=2, latent_dim=8, hidden_dim=8,
                    reference_parity=False, qg_gen_only=True,
                    epochs=10, early_stop_patience=10, batch_size=8, seed=0)
    datasets, label_sets = [], []
    for i, c in enumerate((9, 14)):
        cs = list(generate_cases(c, 8, seed=i, feasible_only=True))[1:]
        data = batch_from_cases(cs)
        datasets.append(data)
        label_sets.append(nr_labels(cs, n_pad=data.buses.shape[1]))
    best, hist = train_supervised_multi(cfg, datasets, label_sets)
    assert hist[-1]["sup"] < hist[0]["sup"]
    assert len(hist[0]["group_sups"]) == 2
    assert all(not h["diverged"] for h in hist)
