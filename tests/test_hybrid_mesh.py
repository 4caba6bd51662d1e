"""Hybrid (dcn, dp, gp) multi-host mesh layout (BASELINE.json config #5).

Simulates 2 hosts x 4 chips on the 8-device CPU mesh (tests/conftest.py):
the outer 'dcn' axis plays the inter-host DCN dimension, ('dp','gp') the
intra-host ICI dimensions. The gradient all-reduce spans dcn+dp; the
edge-partition collectives stay inside 'gp'. Numerics must match the
single-device step."""

import numpy as np
import pytest

import jax

from gns_tpu.parallel.mesh import make_hybrid_mesh
from gns_tpu.parallel.sharding import (
    make_sharded_train_step,
    replicate,
    shard_batch,
)
from gns_tpu.train.trainer import init_train_state, make_train_step
from gns_tpu.utils.augment import generate_cases
from gns_tpu.utils.config import GNSConfig
from gns_tpu.utils.prepare import batch_from_cases, extract_shared_topology

CFG = GNSConfig(
    K=2, latent_dim=8, hidden_dim=8, multiple_phi=True,
    reference_parity=False, seed=0,
)


@pytest.fixture(scope="module")
def data():
    # 8 case14 grids; pad edges to 24 so gp=2 divides evenly.
    return batch_from_cases(
        list(generate_cases(14, 7, seed=0)), pad_sizes=(16, 24, 8)
    )


@pytest.mark.parametrize("dcn,dp,gp", [(2, 4, 1), (2, 2, 2)])
def test_hybrid_mesh_train_step_matches_single_device(data, dcn, dp, gp):
    mesh = make_hybrid_mesh(dcn=dcn, dp=dp, gp=gp)
    assert mesh.shape == {"dcn": dcn, "dp": dp, "gp": gp}
    state0 = init_train_state(jax.random.key(1), CFG)

    ref_state, ref_metrics = make_train_step(CFG, method="onehot", donate=False)(
        state0, data
    )

    step = make_sharded_train_step(CFG, mesh, method="onehot", dp=("dcn", "dp"))
    sh_state, sh_metrics = step(
        replicate(state0, mesh), shard_batch(data, mesh, dp=("dcn", "dp"))
    )

    np.testing.assert_allclose(
        float(sh_metrics["loss"]), float(ref_metrics["loss"]), rtol=2e-5
    )
    for a, b in zip(
        jax.tree.leaves(ref_state.params), jax.tree.leaves(sh_state.params)
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=8e-3, atol=CFG.lr)


def test_hybrid_mesh_with_shared_topology(data):
    """Shared-topology constants compose with the hybrid SPMD layout."""
    topo = extract_shared_topology(data)
    assert topo is not None
    mesh = make_hybrid_mesh(dcn=2, dp=2, gp=2)
    state0 = init_train_state(jax.random.key(2), CFG)

    ref_state, ref_metrics = make_train_step(CFG, method="onehot", donate=False)(
        state0, data
    )
    step = make_sharded_train_step(
        CFG, mesh, method="onehot", dp=("dcn", "dp"), topo=topo
    )
    sh_state, sh_metrics = step(
        replicate(state0, mesh), shard_batch(data, mesh, dp=("dcn", "dp"))
    )
    np.testing.assert_allclose(
        float(sh_metrics["loss"]), float(ref_metrics["loss"]), rtol=2e-5
    )


def test_hybrid_mesh_validation():
    with pytest.raises(ValueError):
        make_hybrid_mesh(dcn=3)  # 8 devices not divisible by 3
    with pytest.raises(ValueError):
        make_hybrid_mesh(dcn=2, dp=4, gp=2)  # 2*4*2 != 8


class _FakeDistributed:
    """Stand-in for jax.distributed recording initialize() calls.

    Mirrors the REAL jax.distributed surface of this JAX version:
    is_initialized() exists (tests/test_hybrid_mesh.py asserts so below),
    and a no-arg initialize() with no cluster env raises
    ValueError("coordinator_address should be defined.")."""

    def __init__(self, initialized=False, raise_on_init=None):
        self._initialized = initialized
        self.calls = []
        self.raise_on_init = raise_on_init

    def is_initialized(self):
        return self._initialized

    def initialize(self, **kw):
        self.calls.append(kw)
        if self.raise_on_init is not None:
            raise self.raise_on_init


def test_real_jax_distributed_surface():
    """The helper's guards rely on this JAX version's actual surface —
    pin it so the fake above can't drift into testing fiction."""
    assert hasattr(jax.distributed, "is_initialized")
    assert jax.distributed.is_initialized() is False


def test_initialize_distributed_call_order(monkeypatch):
    """The multi-host init helper must call jax.distributed.initialize
    BEFORE any backend-touching call — jax.devices()/process_count() would
    initialize single-process JAX and make distributed init too late (the
    round-1 version guarded on process_count() and returned early exactly
    when it reported > 1)."""
    from gns_tpu.parallel import mesh as mesh_mod

    def _forbidden(*a, **k):
        raise AssertionError(
            "backend-touching call before jax.distributed.initialize"
        )

    fake = _FakeDistributed()
    monkeypatch.setattr(mesh_mod.jax, "distributed", fake)
    monkeypatch.setattr(mesh_mod.jax, "process_count", _forbidden)
    monkeypatch.setattr(mesh_mod.jax, "devices", _forbidden)
    monkeypatch.setattr(mesh_mod.jax, "local_devices", _forbidden, raising=False)

    mesh_mod.initialize_distributed(
        coordinator_address="h0:1234", num_processes=2, process_id=0
    )
    assert fake.calls == [
        dict(coordinator_address="h0:1234", num_processes=2, process_id=0)
    ]


def test_initialize_distributed_noop_when_initialized(monkeypatch):
    """Idempotent: a second call (library + launcher both init) no-ops."""
    from gns_tpu.parallel import mesh as mesh_mod

    fake = _FakeDistributed(initialized=True)
    monkeypatch.setattr(mesh_mod.jax, "distributed", fake)
    mesh_mod.initialize_distributed(coordinator_address="h0:1234")
    assert fake.calls == []


def test_initialize_distributed_error_propagation(monkeypatch):
    """Explicit kwargs: failures propagate. No kwargs: ONLY the
    'no cluster environment detected' ValueError is swallowed (local
    dev); a detected-but-unreachable cluster propagates — a silent
    1-host fallback on a real pod trains without gradient sync."""
    from gns_tpu.parallel import mesh as mesh_mod

    fake = _FakeDistributed(raise_on_init=RuntimeError("no cluster"))
    monkeypatch.setattr(mesh_mod.jax, "distributed", fake)
    with pytest.raises(RuntimeError):
        mesh_mod.initialize_distributed(coordinator_address="h0:1234")

    # no kwargs + no cluster env (the error jax actually raises here,
    # pinned by test_real_jax_distributed_surface): swallowed
    fake = _FakeDistributed(
        raise_on_init=ValueError("coordinator_address should be defined.")
    )
    monkeypatch.setattr(mesh_mod.jax, "distributed", fake)
    mesh_mod.initialize_distributed()
    assert len(fake.calls) == 1

    # no kwargs but a REAL failure (cluster detected, coordinator down):
    # must propagate, not silently fall back to single-process
    fake = _FakeDistributed(
        raise_on_init=RuntimeError("barrier timed out connecting to coordinator")
    )
    monkeypatch.setattr(mesh_mod.jax, "distributed", fake)
    with pytest.raises(RuntimeError):
        mesh_mod.initialize_distributed()
