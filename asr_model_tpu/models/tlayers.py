"""flax layers with torch-compatible default initialization.

The reference relies on torch defaults everywhere (nn.Linear /
nn.Conv1d: kaiming-uniform(a=sqrt(5)) == U(±1/sqrt(fan_in)) for both
kernel and bias; nn.Embedding: N(0,1)).  Training-dynamics parity is
easier to argue when the init distributions match, so these wrappers
are used in place of raw flax defaults throughout the model.
"""

from __future__ import annotations

import math
from typing import Any, Callable, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn


def torch_kernel_init() -> Callable:
    """U(-1/sqrt(fan_in), 1/sqrt(fan_in)); fan_in = prod(shape[:-1])."""

    def init(key, shape, dtype=jnp.float32):
        fan_in = int(np.prod(shape[:-1])) or 1
        bound = 1.0 / math.sqrt(fan_in)
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


def torch_bias_init(fan_in: int) -> Callable:
    def init(key, shape, dtype=jnp.float32):
        bound = 1.0 / math.sqrt(max(fan_in, 1))
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


def Dense(features: int, in_features: int, use_bias: bool = True,
          name: str | None = None) -> nn.Dense:
    return nn.Dense(
        features,
        use_bias=use_bias,
        kernel_init=torch_kernel_init(),
        bias_init=torch_bias_init(in_features),
        name=name,
    )


def Conv1d(features: int, in_features: int, kernel_size: int,
           groups: int = 1, padding="SAME", use_bias: bool = True,
           stride: int = 1, name: str | None = None) -> nn.Conv:
    """1-D convolution over (..., T, C) with torch-like init."""
    fan_in = (in_features // groups) * kernel_size
    return nn.Conv(
        features,
        kernel_size=(kernel_size,),
        strides=(stride,),
        padding=padding,
        feature_group_count=groups,
        use_bias=use_bias,
        kernel_init=torch_kernel_init(),
        bias_init=torch_bias_init(fan_in),
        name=name,
    )


def Embed(num: int, features: int, name: str | None = None) -> nn.Embed:
    """torch nn.Embedding init: N(0, 1)."""
    return nn.Embed(num, features,
                    embedding_init=nn.initializers.normal(stddev=1.0),
                    name=name)
