"""LearningBlock: the 3-layer MLP used for every neural function in GNS.

dim_in -> hidden -> hidden -> dim_out with LeakyReLU(0.01) after the first
two layers, linear output (reference: GNS/main.py:17-31). The reference
names its layers linear1/linear2/linear4 (there is no linear3); the torch
checkpoint importer relies on that naming, so the param dict mirrors it as
w1/b1, w2/b2, w4/b4.

Initialization matches torch.nn.Linear's default (kaiming-uniform with
a=sqrt(5), which reduces to U(-1/sqrt(fan_in), 1/sqrt(fan_in)) for both
weight and bias) so fresh JAX and torch models are statistically identical.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def init_learning_block(key, dim_in: int, hidden_dim: int, dim_out: int, dtype=jnp.float32):
    """Initialize one LearningBlock's parameters."""
    ks = jax.random.split(key, 6)

    def lin(kw, kb, fan_in, fan_out):
        bound = 1.0 / jnp.sqrt(jnp.asarray(fan_in, dtype))
        w = jax.random.uniform(kw, (fan_in, fan_out), dtype, -bound, bound)
        b = jax.random.uniform(kb, (fan_out,), dtype, -bound, bound)
        return w, b

    w1, b1 = lin(ks[0], ks[1], dim_in, hidden_dim)
    w2, b2 = lin(ks[2], ks[3], hidden_dim, hidden_dim)
    w4, b4 = lin(ks[4], ks[5], hidden_dim, dim_out)
    return {"w1": w1, "b1": b1, "w2": w2, "b2": b2, "w4": w4, "b4": b4}


def learning_block_apply(params, x, negative_slope: float = 0.01, precision=None):
    """Apply the MLP to x (..., dim_in) -> (..., dim_out)."""
    h = learning_block_hidden(params, x, negative_slope, precision)
    return jnp.dot(h, params["w4"], precision=precision) + params["b4"]


def learning_block_hidden(params, x, negative_slope: float = 0.01, precision=None):
    """Layers 1-2 only: x (..., dim_in) -> H2 (..., hidden), the activation
    the output layer projects. Used by the aggregate-then-project fold
    (models/gns.py), where w4/b4 are folded into the consumer's first layer."""
    h = jnp.dot(x, params["w1"], precision=precision) + params["b1"]
    h = jax.nn.leaky_relu(h, negative_slope)
    h = jnp.dot(h, params["w2"], precision=precision) + params["b2"]
    return jax.nn.leaky_relu(h, negative_slope)


def param_count(tree) -> int:
    return sum(int(x.size) for x in jax.tree.leaves(tree))
