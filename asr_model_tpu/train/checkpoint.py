"""Checkpoint save/RESTORE.

The reference only ever saves bare state_dicts (essentials.py:959-965)
and has no load path (SURVEY §5.4).  Here: full training state —
params, batch_stats, MaxFactor factored state (row_var/col_var/v/step),
global step and PRNG key — serialized with flax msgpack into a single
file per step, plus ``save_model_checkpoint``-parity bundles and real
restore.
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional

import jax
from flax import serialization


def save_checkpoint(path: str, state: Dict[str, Any]) -> str:
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    blob = serialization.to_bytes(state)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(blob)
    os.replace(tmp, path)
    return path


def restore_checkpoint(path: str, target: Dict[str, Any]) -> Dict[str, Any]:
    """Restore into a pytree of the same structure (``target`` provides
    the treedef and dtypes — e.g. a freshly-initialized state)."""
    with open(path, "rb") as f:
        blob = f.read()
    return serialization.from_bytes(target, blob)


def save_model_checkpoint(checkpoint_dir: str, global_step: int,
                          state: Dict[str, Any]) -> str:
    """Parity naming with essentials.py:1048-1056."""
    path = os.path.join(checkpoint_dir, f"checkpoint_step_{global_step}.msgpack")
    return save_checkpoint(path, state)


def latest_checkpoint(checkpoint_dir: str) -> Optional[str]:
    if not os.path.isdir(checkpoint_dir):
        return None
    cands = [f for f in os.listdir(checkpoint_dir)
             if f.startswith("checkpoint_step_") and f.endswith(".msgpack")]
    if not cands:
        return None
    cands.sort(key=lambda f: int(f.split("_")[-1].split(".")[0]))
    return os.path.join(checkpoint_dir, cands[-1])
