"""String-keyed norm and activation registries.

Parity: get_norm essentials.py:193-219 (warn + LayerNorm fallback) and
get_activation essentials.py:221-235 (GELU fallback).
"""

from __future__ import annotations

import warnings
from typing import Callable, Optional

import jax.numpy as jnp
from flax import linen as nn

from asr_model_tpu.models import norms


def get_norm(n_type: str, dims: Optional[int] = None,
             num_groups: Optional[int] = None) -> nn.Module:
    if n_type in ("batchnorm", "instancenorm") and dims is None:
        raise ValueError(f"'{n_type}' requires 'dims'.")
    if n_type == "groupnorm" and num_groups is None:
        raise ValueError(f"'{n_type}' requires 'num_groups'.")

    norm_map = {
        "layernorm": lambda: norms.LayerNorm(dims=dims),
        "linearnorm": lambda: norms.LinearNorm(dims=dims, use_bias=False),
        "adanorm": lambda: norms.AdaLN(dims=dims),
        "instancenorm": lambda: norms.InstanceNorm1d(dims=dims),
        "rmsnorm": lambda: norms.RMSNorm(dims=dims),
        "batchnorm": lambda: norms.BatchNorm1d(dims=dims),
        "instancenorm2d": lambda: norms.InstanceNorm1d(dims=dims),
        "groupnorm": lambda: norms.GroupNorm(dims=dims, num_groups=num_groups or 1),
        "localnorm": lambda: norms.LocalNorm(size=5),
        "globalnorm": lambda: norms.GlobalNorm(dim=dims),
        "AbbyNormal": lambda: norms.AbbyNormal(dims=dims, size=5, alpha=1e-4,
                                               beta=0.75, k=1.0, threshold=0.8),
    }
    fn = norm_map.get(n_type)
    if fn is not None:
        return fn()
    warnings.warn(f"Norm type '{n_type}' not found. Returning LayerNorm.")
    return norms.LayerNorm(dims=dims)


def _tanhshrink(x):
    return x - jnp.tanh(x)


def _softshrink(x, lambd=0.5):
    return jnp.where(x > lambd, x - lambd, jnp.where(x < -lambd, x + lambd, 0.0))


def get_activation(act: str) -> Callable:
    _gelu_exact = lambda x: nn.gelu(x, approximate=False)
    act_map = {
        # torch nn.GELU() is the exact erf form; jax defaults to tanh approx.
        "gelu": _gelu_exact,
        "relu": nn.relu,
        "sigmoid": nn.sigmoid,
        "tanh": jnp.tanh,
        "swish": nn.silu,
        "tanhshrink": _tanhshrink,
        "softplus": nn.softplus,
        "softshrink": _softshrink,
        "leaky_relu": lambda x: nn.leaky_relu(x, negative_slope=0.01),
        "elu": nn.elu,
    }
    return act_map.get(act, _gelu_exact)
