"""Sharding rules: DP + TP (+ the seq axis for long-form encoder work).

Greenfield design (SURVEY §2.5): batch sharded over 'data'; tensor
parallelism shards attention heads and MLP hidden dims over 'model'
with the standard Megatron pairing — column-parallel into the block,
row-parallel out of it — expressed purely as NamedSharding annotations;
XLA inserts the psum/all-gathers over ICI.

Rules are path-pattern based so they survive model refactors:

* ``q_proj/kernel``, ``kv_proj/kernel``, ``c_proj/kernel``: (d, H*hd) —
  shard the output (head) axis over 'model' (column-parallel);
* ``out_proj/kernel``: (H*hd, d) — shard the input axis (row-parallel);
* ``mlp_in/kernel`` / ``mlp1``: column-parallel; ``mlp_out`` / ``mlp2``:
  row-parallel;
* token embedding: shard the vocab axis over 'model' (the 40k-row
  embedding is the single largest tensor);
* everything else replicated.
"""

from __future__ import annotations

import re
from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

TP_RULES = (
    # (path regex, PartitionSpec)
    (r"q_proj/kernel$",   P(None, "model")),
    (r"kv_proj/kernel$",  P(None, "model")),
    (r"c_proj/kernel$",   P(None, "model")),
    (r"q_proj/bias$",     P("model")),
    (r"kv_proj/bias$",    P("model")),
    (r"c_proj/bias$",     P("model")),
    (r"out_proj/kernel$", P("model", None)),
    (r"mlp_in/kernel$",   P(None, "model")),
    (r"mlp_in/bias$",     P("model")),
    (r"mlp_out/kernel$",  P("model", None)),
    (r"mlp1/kernel$",     P(None, "model")),
    (r"mlp1/bias$",       P("model")),
    (r"mlp2/kernel$",     P("model", None)),
    (r"token/embedding$", P("model", None)),
    # EP: MoE expert weights carry a leading E axis (models/moe.py,
    # nn.vmap-stacked) sharded over 'expert'; within each expert the
    # FFN pair keeps the Megatron column/row pairing over 'model'
    (r"experts/w_in/kernel$",  P("expert", None, "model")),
    (r"experts/w_in/bias$",    P("expert", "model")),
    (r"experts/w_out/kernel$", P("expert", "model", None)),
    (r"experts/w_out/bias$",   P("expert", None)),
)


def _path_str(path) -> str:
    return "/".join(str(getattr(k, "key", k)) for k in path)


def param_pspec(params) -> Any:
    """PartitionSpec tree for the params (TP rules, else replicated)."""

    def spec_for(path, leaf):
        name = _path_str(path)
        for pat, spec in TP_RULES:
            if re.search(pat, name):
                # only shard when divisible; tiny test models stay replicated
                axis = spec
                return axis
        return P()

    return jax.tree_util.tree_map_with_path(spec_for, params)


def _divisible(leaf, spec, mesh: Mesh) -> bool:
    for dim, axis in enumerate(spec):
        if axis is None:
            continue
        if axis not in mesh.shape:      # mesh without this axis family
            return False
        size = mesh.shape[axis]
        if dim >= leaf.ndim or leaf.shape[dim] % size != 0:
            return False
    return True


def param_shardings(params, mesh: Mesh):
    """NamedSharding tree; falls back to replication for leaves whose
    shapes don't divide the mesh axis."""
    specs = param_pspec(params)

    def to_sharding(leaf, spec):
        if not _divisible(leaf, spec, mesh):
            spec = P()
        return NamedSharding(mesh, spec)

    return jax.tree.map(to_sharding, params, specs)


def batch_shardings(batch, mesh: Mesh):
    """Shard the leading batch axis over 'data'.

    Ragged tail batches (e.g. the last eval batch of a split) whose
    leading dim doesn't divide the data axis are replicated instead —
    correct, just without DP speedup for that one batch."""
    n = mesh.shape["data"]

    def shard(leaf):
        import numpy as _np
        dim0 = _np.shape(leaf)[0] if _np.ndim(leaf) else 0
        spec = P("data") if dim0 % n == 0 and dim0 > 0 else P()
        return NamedSharding(mesh, spec)

    return jax.tree.map(shard, batch)


def replicated(tree, mesh: Mesh):
    return jax.tree.map(lambda _: NamedSharding(mesh, P()), tree)


def shard_params(params, mesh: Mesh):
    """Place (and lay out) the params on the mesh."""
    return jax.device_put(params, param_shardings(params, mesh))


def make_sharded_train_step(model, tx, mesh: Mesh,
                            clip_grad_norm: float = 0.0,
                            compute_dtype=None) -> Callable:
    """The jitted DP(+TP) train step.

    Under XLA's SPMD partitioner the step *function* is the same program
    as the single-device one (``train.loop.make_train_step``) — what
    distributes it is the sharding of its inputs: batch over 'data'
    (``batch_shardings``), params per the TP rules (``shard_params``).
    XLA then inserts the gradient psum over 'data' and the TP
    collectives over 'model' on ICI.  Returns the same 7-tuple
    (params, opt_state, batch_stats, rng, loss, gnorm, jstat) so the
    training loop can drive either step interchangeably."""
    del mesh  # shardings travel with the inputs; kept for API clarity
    from asr_model_tpu.train.loop import make_train_step
    return make_train_step(model, tx, clip_grad_norm,
                           compute_dtype=compute_dtype)
