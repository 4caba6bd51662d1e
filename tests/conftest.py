"""Test configuration: run JAX on a simulated 8-device CPU mesh.

The real TPU in this environment is a single remote chip; distributed tests
use JAX's standard CPU-simulation trick (SURVEY.md §4) so mesh/sharding
logic is exercised everywhere. The environment pins JAX_PLATFORMS=axon, so
the platform must be overridden in-process before JAX initializes.
"""

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
# The persistent compilation cache (/root/.jax_cache) is shared with the
# remote-TPU relay environment whose CPU compile host advertises AVX512/
# AMX features this host lacks; loading such an AOT entry can SIGILL /
# segfault inside get_executable_and_time (observed: full-suite runs
# dying at ~68% in compilation_cache deserialization). CPU test programs
# are tiny — compile fresh, never touch the shared cache.
jax.config.update("jax_enable_compilation_cache", False)

import numpy as np  # noqa: E402
import pytest  # noqa: E402

GOLDEN_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "golden")


@pytest.fixture(scope="session")
def golden_dir():
    return GOLDEN_DIR


def load_golden(name):
    return np.load(os.path.join(GOLDEN_DIR, name + ".npz"))
