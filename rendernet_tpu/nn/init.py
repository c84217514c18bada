"""Weight initializers matching the reference layer library's defaults.

The reference uses ``tf.contrib.layers.xavier_initializer()`` (Glorot
uniform) for conv weights in the models, ``random_normal(stddev=0.02)`` as
the layer-lib default, and constant 0.001 biases
(tools/layer_util.py:141-149,229).
"""
from __future__ import annotations

import math
from typing import Sequence

import jax
import jax.numpy as jnp

__all__ = ["xavier_uniform", "normal", "constant", "zeros"]


def _fans(shape: Sequence[int]) -> tuple[float, float]:
    """TF-convention fan computation: last two dims are (in, out); leading
    dims are receptive field."""
    if len(shape) < 2:
        return float(shape[0]), float(shape[0])
    receptive = 1.0
    for d in shape[:-2]:
        receptive *= d
    return shape[-2] * receptive, shape[-1] * receptive


def xavier_uniform(key: jax.Array, shape: Sequence[int], dtype=jnp.float32):
    fan_in, fan_out = _fans(shape)
    limit = math.sqrt(6.0 / (fan_in + fan_out))
    return jax.random.uniform(key, shape, dtype, minval=-limit, maxval=limit)


def normal(stddev: float = 0.02):
    def init(key: jax.Array, shape: Sequence[int], dtype=jnp.float32):
        return stddev * jax.random.normal(key, shape, dtype)

    return init


def constant(value: float):
    def init(key: jax.Array, shape: Sequence[int], dtype=jnp.float32):
        return jnp.full(shape, value, dtype)

    return init


def zeros(key: jax.Array, shape: Sequence[int], dtype=jnp.float32):
    return jnp.zeros(shape, dtype)
