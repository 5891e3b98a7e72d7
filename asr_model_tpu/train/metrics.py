"""Evaluation metrics and gradient diagnostics.

Parity targets: levenshtein/wer_batch essentials.py:576-602 (word-level
edit distance, WER% = errors/ref-words*100 on lowercased whitespace
tokens), compute_metrics essentials.py:612-670 (clean ids -> batch
decode -> WER + efficiency_score + per-layer grad norms),
clean_ids/clean_batch essentials.py:248-254, spectral_entropy
essentials.py:692-706, track_grad_norms essentials.py:604-610.
"""

from __future__ import annotations

import math
from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np


def _native_wer():
    try:
        from asr_model_tpu import native
        return native.load("wer")
    except Exception:        # pragma: no cover - toolchain missing
        return None


def levenshtein(reference_words: List[str], hypothesis_words: List[str]) -> int:
    """Word-level edit distance, O(m*n) two-row DP.  Routes through the
    C++ engine (native/wer.cpp) when built — the eval hot loop over
    thousands of utterances."""
    m, n = len(reference_words), len(hypothesis_words)
    if m == 0:
        return n
    if n == 0:
        return m
    lib = _native_wer()
    if lib is not None:
        import ctypes
        interned: Dict[str, int] = {}
        def ids(words):
            return np.asarray([interned.setdefault(w, len(interned))
                               for w in words], np.int32)
        r, h = ids(reference_words), ids(hypothesis_words)
        return int(lib.wer_levenshtein(
            r.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), m,
            h.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), n))
    prev = list(range(n + 1))
    for q in range(1, m + 1):
        cur = [q] + [0] * n
        rw = reference_words[q - 1]
        for k in range(1, n + 1):
            if rw == hypothesis_words[k - 1]:
                cur[k] = prev[k - 1]
            else:
                cur[k] = 1 + min(prev[k - 1], cur[k - 1], prev[k])
        prev = cur
    return prev[n]


def wer_batch(references: List[str], hypotheses: List[str]) -> float:
    total_errors = 0
    total_words = 0
    for ref, hyp in zip(references, hypotheses):
        ref_words = ref.lower().split()
        total_errors += levenshtein(ref_words, hyp.lower().split())
        total_words += len(ref_words)
    return (total_errors / total_words) * 100 if total_words > 0 else 0.0


def clean_ids(ids, pad_token_id=0, bos_token_id=1, eos_token_id=2):
    if hasattr(ids, "tolist"):
        ids = ids.tolist()
    skip = (-100, pad_token_id, bos_token_id, eos_token_id)
    return [int(i) for i in ids if i not in skip]


def clean_batch(batch_ids, pad_token_id=0, bos_token_id=1, eos_token_id=2):
    return [clean_ids(seq, pad_token_id, bos_token_id, eos_token_id)
            for seq in batch_ids]


def track_grad_norms(grads) -> Dict[str, float]:
    """Per-parameter grad L2 norms keyed by path name."""
    flat = jax.tree_util.tree_flatten_with_path(grads)[0]
    out = {}
    for path, g in flat:
        name = ".".join(str(getattr(k, "key", k)) for k in path)
        out[name] = float(jnp.linalg.norm(g.reshape(-1)))
    return out


def spectral_entropy(grad, n_bands: int = 64) -> float:
    """Normalized Shannon entropy of the FFT power of (<=2048) gradient
    samples — a gradient-health diagnostic."""
    if grad is None or grad.size < n_bands:
        return 1.0
    flat = np.asarray(grad).reshape(-1)[:2048].astype(np.float32)
    psd = np.abs(np.fft.rfft(flat)) ** 2
    psd_norm = psd / (psd.sum() + 1e-8)
    entropy = -np.sum(psd_norm * np.log(psd_norm + 1e-8))
    return float(entropy / math.log(psd_norm.shape[0]))


def compute_metrics(pred: Dict[str, Any], tokenizer=None,
                    num_params_m: Optional[float] = None,
                    grads=None, print_pred: bool = False,
                    num_samples: int = 0) -> Dict[str, float]:
    """WER + efficiency_score (=(100-wer)/M-params) + per-layer grad
    norms, from {"predictions", "label_ids"} (argmaxes 3-D logits)."""
    pred_ids = pred["predictions"]
    label_ids = pred["label_ids"]
    if isinstance(pred_ids, tuple):
        pred_ids = pred_ids[0]
    arr = np.asarray(pred_ids, dtype=object)
    if getattr(arr, "ndim", 0) == 3 or (
            hasattr(pred_ids, "ndim") and getattr(pred_ids, "ndim", 0) == 3):
        pred_ids = np.argmax(np.asarray(pred_ids, dtype=np.float32), axis=-1)

    label_ids = clean_batch(list(label_ids))
    pred_ids = clean_batch(list(pred_ids))
    pred_str = tokenizer.batch_decode(pred_ids)
    label_str = tokenizer.batch_decode(label_ids)

    if print_pred:
        for q in range(min(num_samples, len(pred_ids))):
            print(f"Pred tokens: {pred_ids[q]}")
            print(f"Label tokens: {label_ids[q]}")
            print(f"Pred: '{pred_str[q]}'")
            print(f"Label: '{label_str[q]}'")
            print("-" * 40)

    wer = wer_batch(label_str, pred_str)
    result = {"wer": float(wer)}
    if num_params_m:
        result["efficiency_score"] = float((100 - wer) / num_params_m)
    else:
        result["efficiency_score"] = 0.0
    if grads is not None:
        for k, v in track_grad_norms(grads).items():
            result[f"per_layer_norms_{k}"] = v
    return result
