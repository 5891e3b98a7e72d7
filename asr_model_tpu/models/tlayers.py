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


def _dwconv_same_raw(x, kernel):
    """Stride-1 SAME depthwise conv, (B, T, C) x (K, 1, C)."""
    return jax.lax.conv_general_dilated(
        x, kernel, window_strides=(1,), padding="SAME",
        feature_group_count=x.shape[-1],
        dimension_numbers=("NWC", "WIO", "NWC"))


@jax.custom_vjp
def dwconv_same(x, kernel):
    """Depthwise conv with a partition-safe kernel gradient.

    XLA's SPMD partitioner mis-reduces the KERNEL gradient of grouped
    convolutions when the mesh has axes the operands are replicated
    over: the grad-conv's all-reduce runs over the full mesh instead of
    the batch-sharded axis only, scaling dk by the product of the
    unused axis sizes (measured: exactly pipe-x on a (data, pipe) mesh,
    both via plain jit-SPMD and shard_map, jax 0.9.0 CPU —
    tests/test_pipeline.py::test_pp_gradients_match_unsharded catches
    it).  The forward and the data-grad (itself a grouped conv forward)
    partition correctly; only dk is replaced — with per-tap einsums
    whose batch/time contraction the partitioner reduces over the
    'data' axis alone, like every other dense gradient in the model."""
    return _dwconv_same_raw(x, kernel)


def _dwconv_fwd(x, kernel):
    return _dwconv_same_raw(x, kernel), (x, kernel)


def _dwconv_bwd(res, ct):
    x, kernel = res
    dx = jax.vjp(lambda xx: _dwconv_same_raw(xx, kernel), x)[1](ct)[0]
    K = kernel.shape[0]
    T = x.shape[1]
    lo = (K - 1) // 2                  # lax SAME for stride 1, odd K
    xp = jnp.pad(x, ((0, 0), (lo, K - 1 - lo), (0, 0)))
    dk = jnp.stack([
        jnp.einsum("btc,btc->c",
                   jax.lax.dynamic_slice_in_dim(xp, r, T, axis=1), ct)
        for r in range(K)])            # (K, C)
    return dx, dk[:, None, :].astype(kernel.dtype)


dwconv_same.defvjp(_dwconv_fwd, _dwconv_bwd)


class DepthwiseConv1d(nn.Module):
    """Drop-in for ``nn.Conv(feature_group_count=C)`` at groups ==
    in_features == features, stride 1, SAME — same param names/shapes/
    init (checkpoint- and init-stream-compatible), same forward op,
    partition-safe backward (see ``dwconv_same``)."""

    features: int
    kernel_size: int

    @nn.compact
    def __call__(self, x):
        shape = (self.kernel_size, 1, self.features)
        kernel = self.param("kernel", torch_kernel_init(), shape)
        bias = self.param("bias", torch_bias_init(self.kernel_size),
                          (self.features,))
        x, kernel, bias = nn.dtypes.promote_dtype(x, kernel, bias,
                                                  dtype=None)
        return dwconv_same(x, kernel) + bias


def Conv1d(features: int, in_features: int, kernel_size: int,
           groups: int = 1, padding="SAME", use_bias: bool = True,
           stride: int = 1, name: str | None = None):
    """1-D convolution over (..., T, C) with torch-like init."""
    if groups > 1:
        assert groups == in_features == features and stride == 1 \
            and padding == "SAME" and use_bias and kernel_size % 2 == 1, \
            "grouped Conv1d is only used depthwise (stride-1 SAME)"
        return DepthwiseConv1d(features, kernel_size, name=name)
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
