"""Whole-forward Pallas megakernel (interpret mode on CPU).

The kernel is an experimental artifact — correct but measured slower than
the XLA shared-topology path on real hardware (see the module docstring's
performance verdict); these tests pin its numerics."""

import numpy as np
import pytest

import jax

from gns_tpu.models.gns import gns_forward_batch, init_gns_params
from gns_tpu.ops.pallas_megakernel import megakernel_forward_batch
from gns_tpu.utils.augment import generate_cases
from gns_tpu.utils.config import GNSConfig
from gns_tpu.utils.prepare import batch_from_cases, extract_shared_topology

CFG = GNSConfig(K=4, latent_dim=20, hidden_dim=10, multiple_phi=True,
                reference_parity=True)


@pytest.mark.parametrize("case", [14, 30])
def test_megakernel_matches_forward(case):
    params = init_gns_params(jax.random.key(0), CFG)
    batch = batch_from_cases(list(generate_cases(case, 5, seed=0)))
    topo = extract_shared_topology(batch)
    ref = gns_forward_batch(params, CFG, batch, method="scatter")
    out = megakernel_forward_batch(params, CFG, batch, topo, interpret=True)
    # bf16 MLP compute: serving-grade tolerance (matches the XLA bf16
    # path's own deviation from f32).
    np.testing.assert_allclose(
        np.asarray(out.v), np.asarray(ref.v), atol=2e-2
    )
    np.testing.assert_allclose(
        np.asarray(out.theta), np.asarray(ref.theta), atol=2e-2
    )
    np.testing.assert_allclose(
        np.asarray(out.last_loss), np.asarray(ref.last_loss),
        rtol=0.1, atol=5e-2,
    )


def test_megakernel_rejects_unsupported():
    params = init_gns_params(jax.random.key(0), CFG)
    batch = batch_from_cases(list(generate_cases(14, 2, seed=0)))
    topo = extract_shared_topology(batch)
    with pytest.raises(ValueError):
        megakernel_forward_batch(
            params, CFG.replace(reference_parity=False), batch, topo,
            interpret=True,
        )
    with pytest.raises(ValueError):
        megakernel_forward_batch(params, CFG, batch, None, interpret=True)
