"""gns_tpu — a TPU-native Graph Neural Solver framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of the reference
PyTorch implementation (LeonOrou/OPF-Graph-Neural-Solver): the Donon et al.
"Graph Neural Solver" for AC power flow, trained unsupervised against a
physics (power-imbalance) loss and evaluated against a Newton-Raphson oracle.

Design goals (see SURVEY.md at the repo root):
  * static-shape, padded graph batches that jit-compile once per case bucket
  * edge aggregation as MXU-friendly incidence matmuls / Pallas segment-sum
  * K correction steps as a single `lax.scan` over stacked per-step weights
  * data parallelism + graph(edge) partitioning over a `jax.sharding.Mesh`
  * bit-for-tolerance activation parity with the reference (incl. its quirks,
    gated behind `reference_parity=True`)

Subpackages
-----------
utils     schema, config, case tables, grid preparation, augmentation
ops       segment-sum / gather kernels (XLA reference + Pallas TPU)
physics   AC line-flow residual ops (compensation, imbalance, line flow)
models    LearningBlock MLP, the GNS model, torch checkpoint importer
parallel  mesh construction, data-parallel and edge-partitioned execution
train     jitted training loop, optimizers, checkpointing, metrics
eval      Newton-Raphson oracle (sparse float64 + batched-on-TPU float32),
          evaluation/metrics harness, GNS-warm-started hybrid solver
serve     batched production inference (GNSPredictor)
"""

__version__ = "0.1.0"

import os as _os

# Persistent XLA compilation cache: in this environment a fresh compile
# round-trips a remote compile service (~4-5 min per program); the cache
# brings warm starts to seconds. Opt out with GNS_TPU_NO_COMPILE_CACHE=1.
if not _os.environ.get("GNS_TPU_NO_COMPILE_CACHE"):
    _os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
    try:
        import jax as _jax

        _jax.config.update(
            "jax_compilation_cache_dir",
            _os.environ["JAX_COMPILATION_CACHE_DIR"],
        )
        _jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:
        pass

from gns_tpu.utils.schema import BUS, LINE, GEN, get_BLG  # noqa: F401
from gns_tpu.utils.config import GNSConfig  # noqa: F401
