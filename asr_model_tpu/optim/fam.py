"""FAMOptimizer — frequency-adaptive momentum — and the FrequencyHandler
band-analyzer family.

Parity targets: FrequencyHandler + Conv/Attention/Embedding subclasses
optimizerc.py:928-1052 (grad-FFT band splits: linear / log-spaced /
low-high split; band distribution -> adaptive momentum alpha per layer
type), FAMOptimizer optimizerc.py:1054-1282 (per-param grad sampling,
band-power EMA with beta, handler-specific alpha adaptation, JSON debug
dumps), get_parameter_groups optimizerc.py:1284-1377 (name-based
conv/attention/embed/norm/other grouping with per-group hyperparams).

TPU design: the band analysis is fully on-device and branch-free — the
grad sample is a fixed-size deterministic slice (the reference uses
torch.randperm with global RNG; explicit determinism here), band sums
are segment reductions, and the alpha adaptation uses jnp.where.  Debug
dumps remain host-side (optional, between steps).
"""

from __future__ import annotations

import json
import os
from datetime import datetime
from typing import Any, Dict, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax


def _band_powers_linear(power: jnp.ndarray, n_bands: int) -> jnp.ndarray:
    """Equal-width bands (FrequencyHandler.analyze)."""
    n = power.shape[0]
    band_size = n // n_bands
    if band_size <= 0:
        return jnp.zeros(n_bands, power.dtype)
    idx = jnp.minimum(jnp.arange(n) // band_size, n_bands - 1)
    # frequencies beyond n_bands*band_size fold into the last band,
    # matching the reference's min((i+1)*size, n) upper clamp
    return jax.ops.segment_sum(power, idx, num_segments=n_bands)


def _band_powers_log(power: jnp.ndarray, n_bands: int) -> jnp.ndarray:
    """Log-spaced bands (ConvFrequencyHandler.analyze):
    band i spans [n^(i/B)-1, n^((i+1)/B)-1)."""
    n = power.shape[0]
    edges = np.maximum(0, (n ** (np.arange(n_bands + 1) / n_bands) - 1)
                       ).astype(np.int64)
    edges = np.minimum(edges, n)
    out = []
    freq_idx = jnp.arange(n)
    for i in range(n_bands):
        m = (freq_idx >= edges[i]) & (freq_idx < edges[i + 1])
        out.append(jnp.sum(jnp.where(m, power, 0.0)))
    return jnp.stack(out)


def _band_powers_lowhigh(power: jnp.ndarray, n_bands: int) -> jnp.ndarray:
    """Half the bands over the lower half of the spectrum, half over the
    upper (AttentionFrequencyHandler.analyze)."""
    n = power.shape[0]
    half_bands = n_bands // 2
    low_n = n // 2
    low = _band_powers_linear(power[:low_n], max(half_bands, 1))
    high = _band_powers_linear(power[low_n:], max(n_bands - half_bands, 1))
    return jnp.concatenate([low, high])


class FrequencyHandler:
    """Band split + alpha adaptation; subclasses specialize both."""

    def analyze(self, grad_sample: jnp.ndarray, n_bands: int,
                eps: float = 1e-8) -> jnp.ndarray:
        power = jnp.abs(jnp.fft.rfft(grad_sample.astype(jnp.float32)))
        total = jnp.sum(power)
        power = jnp.where(total > 0, power / (total + eps), power)
        return self._split(power, n_bands)

    def _split(self, power, n_bands):
        return _band_powers_linear(power, n_bands)

    def get_adaptive_momentum(self, band_values: jnp.ndarray,
                              base_alpha: float) -> jnp.ndarray:
        n = band_values.shape[0]
        high = jnp.sum(band_values[n // 2:])
        return jnp.where(high > 0.3,
                         jnp.minimum(0.95, base_alpha + 0.05), base_alpha)


class ConvFrequencyHandler(FrequencyHandler):
    def _split(self, power, n_bands):
        return _band_powers_log(power, n_bands)

    def get_adaptive_momentum(self, band_values, base_alpha):
        n = band_values.shape[0]
        mid = jnp.sum(band_values[n // 4:(3 * n) // 4])
        high = jnp.sum(band_values[(3 * n) // 4:])
        return jnp.where(mid > 0.4, jnp.minimum(0.97, base_alpha + 0.07),
                         jnp.where(high > 0.3,
                                   jnp.minimum(0.95, base_alpha + 0.05),
                                   base_alpha))


class AttentionFrequencyHandler(FrequencyHandler):
    def _split(self, power, n_bands):
        return _band_powers_lowhigh(power, n_bands)

    def get_adaptive_momentum(self, band_values, base_alpha):
        n = band_values.shape[0]
        peak = jnp.argmax(band_values)
        return jnp.where(peak < n // 4,
                         jnp.maximum(0.85, base_alpha - 0.05),
                         jnp.where(peak > (3 * n) // 4,
                                   jnp.minimum(0.98, base_alpha + 0.08),
                                   base_alpha))


class EmbeddingFrequencyHandler(FrequencyHandler):
    def get_adaptive_momentum(self, band_values, base_alpha):
        n = band_values.shape[0]
        high = jnp.sum(band_values[(3 * n) // 4:])
        return jnp.where(high > 0.2, jnp.minimum(0.98, base_alpha + 0.08),
                         base_alpha)


HANDLERS = {
    "default": FrequencyHandler(),
    "conv": ConvFrequencyHandler(),
    "attention": AttentionFrequencyHandler(),
    "embedding": EmbeddingFrequencyHandler(),
}


def handler_for_name(name: str) -> str:
    n = name.lower()
    if "conv" in n or "cnn" in n:
        return "conv"
    if any(x in n for x in ("attention", "mha", "self_attn", "attn")):
        return "attention"
    if any(x in n for x in ("embed", "token")):
        return "embedding"
    return "default"


class FAMState(NamedTuple):
    step: jnp.ndarray
    exp_avg: Any
    freq_history: Any      # per-leaf (n_bands,) EMA of band powers


def fam_optimizer(lr: float = 1e-3, alpha: float = 0.9, beta: float = 0.99,
                  eps: float = 1e-8, decay: float = 0.0, n_bands: int = 8,
                  fam_start_step: int = 100, min_size: int = 256,
                  handler_tree: Optional[Any] = None,
                  sample_size: int = 1000,
                  debug: bool = False, debug_dir: str = "./fam_debug"
                  ) -> optax.GradientTransformation:
    """Frequency-adaptive momentum.  ``handler_tree``: per-leaf handler
    names (see handler_tree_from_params); defaults to 'default'.

    The reference samples a random 64x64 patch of large grads
    (optimizerc.py:1214-1223, global RNG); here the sample is the first
    ``sample_size`` elements — deterministic and gather-free."""

    def init_fn(params):
        return FAMState(
            step=jnp.zeros((), jnp.int32),
            exp_avg=jax.tree.map(jnp.zeros_like, params),
            freq_history=jax.tree.map(
                lambda p: jnp.zeros(n_bands, jnp.float32), params))

    def update_fn(grads, state, params=None):
        step = state.step + 1
        handlers = handler_tree if handler_tree is not None else \
            jax.tree.map(lambda _: "default", grads)

        def leaf(g, m, hist, hname):
            handler = HANDLERS[hname]
            g32 = g.astype(jnp.float32)
            if decay != 0 and params is not None:
                pass  # decay folded below via grads closure-free path
            apply_fam = g.size > min_size
            if apply_fam:
                sample = g32.reshape(-1)[:min(sample_size, g.size)]
                bands = handler.analyze(sample, n_bands, eps)
                hist_new = beta * hist + (1 - beta) * bands
                eff = handler.get_adaptive_momentum(hist_new, alpha)
                eff = jnp.where(step > fam_start_step, eff, alpha)
            else:
                hist_new = hist
                eff = jnp.asarray(alpha)
            m_new = eff * m + (1 - eff) * g32
            return m_new, hist_new

        if decay != 0 and params is not None:
            grads = jax.tree.map(lambda g, p: g + decay * p, grads, params)

        out = jax.tree.map(leaf, grads, state.exp_avg, state.freq_history,
                           handlers,
                           is_leaf=lambda x: isinstance(x, str))
        pick = lambda i: jax.tree.map(
            lambda o: o[i], out, is_leaf=lambda o: isinstance(o, tuple))
        m_new = pick(0)
        deltas = jax.tree.map(lambda m, g: (-lr * m).astype(g.dtype),
                              m_new, grads)
        return deltas, FAMState(step, m_new, pick(1))

    return optax.GradientTransformationExtraArgs(init_fn, update_fn)


def handler_tree_from_params(params) -> Any:
    """Per-leaf handler names from parameter paths."""
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    names = [handler_for_name(
        "/".join(str(getattr(k, "key", k)) for k in path))
        for path, _ in flat]
    treedef = jax.tree_util.tree_structure(params)
    return jax.tree_util.tree_unflatten(treedef, names)


def get_parameter_groups(params, lr: float = 1e-3, decay: float = 0.0
                         ) -> Dict[str, Dict[str, Any]]:
    """Name-based grouping with the reference's per-group hyperparams
    (optimizerc.py:1284-1377): conv / attention / embed (0.8x lr, 1.5x
    decay) / norm (no decay) / other."""
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    groups: Dict[str, Dict[str, Any]] = {}
    cfg = {
        "conv": dict(lr=lr, decay=decay, alpha=0.9, handler="conv",
                     n_bands=10),
        "attention": dict(lr=lr, decay=decay, alpha=0.92,
                          handler="attention", n_bands=12),
        "embedding": dict(lr=lr * 0.8, decay=decay * 1.5, alpha=0.95,
                          handler="embedding", n_bands=8),
        "norm": dict(lr=lr, decay=0.0, alpha=0.9, handler="default",
                     n_bands=4),
        "other": dict(lr=lr, decay=decay, alpha=0.9, handler="default",
                      n_bands=8),
    }
    for path, _ in flat:
        name = "/".join(str(getattr(k, "key", k)) for k in path)
        n = name.lower()
        if "conv" in n or "cnn" in n:
            key = "conv"
        elif any(x in n for x in ("attention", "mha", "self_attn", "attn")):
            key = "attention"
        elif any(x in n for x in ("embed", "token")):
            key = "embedding"
        elif any(x in n for x in ("norm", "batch", "layer")):
            key = "norm"
        else:
            key = "other"
        groups.setdefault(key, {**cfg[key], "names": []})
        groups[key]["names"].append(name)
    return groups


def dump_debug_info(path: str, history: Dict[str, Any]) -> None:
    """Host-side JSON band-history dump (optimizerc.py:1128-1167)."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    blob = {"optimizer": "FAMOptimizer",
            "dumped": datetime.now().isoformat(),
            "parameters": {k: {kk: (np.asarray(vv).tolist()
                                    if hasattr(vv, "tolist") else vv)
                               for kk, vv in v.items()}
                           for k, v in history.items()}}
    with open(path, "w") as f:
        json.dump(blob, f)
