"""MaxFactor — factored second-moment optimizer with sign-based
row-scaled updates, as an optax GradientTransformation.

Parity target: MaxFactor optimizerc.py:6-147 (the live optimizer,
model.py:783).  Per step, for each parameter:

* ``beta_t = step**b_decay`` (unclamped, optimizerc.py:69);
* factored variance for >=2-D params: row/col EMAs of squared row/col
  norms divided by the opposing size + 1e-8, variance estimate
  ``row @ col / max_row_var`` (optimizerc.py:80-87); full EMA ``v``
  with ``gamma`` for 1-D (optimizerc.py:89-90).
  **Note on the reference's 1-D state aliasing:** the reference's
  in-place chain ``var_est.clamp_().rsqrt_().mul_(grad)`` aliases
  ``state['v']`` for 1-D params, overwriting the stored second moment
  with the normalized update every step.  This implementation keeps a
  clean EMA ``v``.  The divergence in stored state provably does NOT
  change the parameter trajectory: 1-D params always take the
  sign*max row scaling (``param.dim() < 3``), the inf-norm
  normalization pins the max |update| at exactly 1, and RMS(update)
  <= 1 forces ``denom = 1`` — so the applied 1-D step is
  ``alpha * sign(grad)`` regardless of ``v``'s contents (verified
  empirically against the reference: 5-step 1-D trajectories agree to
  f32 precision; the golden tests cover the (16,) shape);
* ``update = rsqrt(clamp(var, eps1^2)) * grad`` normalized by its
  inf-norm (optimizerc.py:92-97);
* trust-ratio step ``alpha = max(eps2, RMS(param)) * rho_t`` with
  ``rho_t = clamp(lr, min_lr, 1/sqrt(step))`` (optimizerc.py:74-75),
  RMS-denominated clip ``denom = max(1, RMS(update)/d)``
  (optimizerc.py:99);
* sign-based scaling (optimizerc.py:113-118): rows move by their max
  |update| when ``param.ndim < 3 or bias == 1``; by the row *median*
  otherwise (so even in the bias=2 group only 3-D+ params get the
  median — the reference predicate is reproduced exactly, including
  torch.median's lower-middle-element convention);
* decoupled weight decay ``param *= 1 - lr*decay`` applied before the
  step, with ``alpha`` computed from the pre-decay parameter norm
  (optimizerc.py:75-78);
* optional param-RMS-capped step clipping (optimizerc.py:121-128).

Everything is device-resident — the reference's per-param ``.item()``
host syncs (optimizerc.py:66-99) become on-device scalars inside the
jitted train step.

The learning rate may be a float or a schedule ``f(step) -> lr``; the
schedule modulates both the ``rho_t`` cap and the decay (the reference
scheduler mutates ``group['lr']`` in place, SURVEY §2.3 interop note).

``bias_group_tree`` reproduces main()'s param grouping (model.py:775-781):
names containing 'jump'/'pnet'/'micro_filter' get bias=2.
"""

from __future__ import annotations

from typing import Any, Callable, NamedTuple, Optional, Union

import jax
import jax.numpy as jnp
import optax


class MaxFactorState(NamedTuple):
    step: jnp.ndarray          # scalar int32
    row_var: Any               # pytree (zeros-like rows) or None leaves
    col_var: Any
    v: Any                     # pytree like params (1-D/0-D leaves only)


def _rms(t):
    return jnp.linalg.norm(t.reshape(-1)) / jnp.sqrt(t.size)


def _lower_median(x, axis=-1, keepdims=True):
    """torch.median: the lower of the two middle elements."""
    n = x.shape[axis]
    s = jnp.sort(x, axis=axis)
    return jnp.take(s, jnp.asarray([(n - 1) // 2]), axis=axis) if keepdims \
        else jnp.take(s, (n - 1) // 2, axis=axis)


def bias_group_tree(params, jump_names=("jump", "pnet", "micro_filter"),
                    main_bias: int = 1, jump_bias: int = 2):
    """Per-leaf bias labels from parameter path names (model.py:775-781)."""
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    labels = []
    for path, _ in flat:
        name = "/".join(str(getattr(k, "key", k)) for k in path)
        labels.append(jump_bias if any(j in name for j in jump_names)
                      else main_bias)
    treedef = jax.tree_util.tree_structure(params)
    return jax.tree_util.tree_unflatten(treedef, labels)


def maxfactor(lr: Union[float, Callable] = 0.025, b_decay: float = -0.8,
              eps: tuple = (1e-8, 1e-8), d: float = 1.0,
              decay: float = 0.01, gamma: float = 0.99,
              maximize: bool = False, bias: Union[int, Any] = 1,
              min_lr: float = 1e-9, clip: bool = False, cap: float = 0.0
              ) -> optax.GradientTransformation:
    """Returns an optax transformation.  ``bias`` may be a scalar or a
    per-leaf pytree (see bias_group_tree).  Call update with
    ``params=`` (required)."""
    eps1, eps2 = eps

    def init_fn(params):
        def rows(p):
            if p.ndim > 1:
                return jnp.zeros(p.shape[:-1] + (1,), jnp.float32)
            return jnp.zeros((), jnp.float32)  # unused placeholder

        def cols(p):
            if p.ndim > 1:
                return jnp.zeros(p.shape[:-2] + (1, p.shape[-1]), jnp.float32)
            return jnp.zeros((), jnp.float32)

        def vs(p):
            # the reference keeps a dense ``v`` for every param
            # (optimizerc.py:45) but only reads it for <2-D params —
            # allocate it only where used (TPU HBM savings)
            if p.ndim <= 1:
                return jnp.zeros(p.shape, jnp.float32)
            return jnp.zeros((), jnp.float32)

        return MaxFactorState(
            step=jnp.zeros((), jnp.int32),
            row_var=jax.tree.map(rows, params),
            col_var=jax.tree.map(cols, params),
            v=jax.tree.map(vs, params),
        )

    def update_fn(grads, state, params=None):
        if params is None:
            raise ValueError("maxfactor requires params")
        step = state.step + 1
        step_f = step.astype(jnp.float32)
        lr_t = lr(step_f - 1.0) if callable(lr) else lr
        lr_t = jnp.asarray(lr_t, jnp.float32)
        beta_t = step_f ** b_decay
        rho_t = jnp.maximum(min_lr, jnp.minimum(lr_t, 1.0 / jnp.sqrt(step_f)))

        if isinstance(bias, (int, float)):
            bias_tree = jax.tree.map(lambda _: bias, params)
        else:
            bias_tree = bias

        def leaf(g, p, rv, cv, v, b_label):
            g = g.astype(jnp.float32)
            if maximize:
                g = -g
            squeeze = p.ndim == 0
            if squeeze:
                g = g[None]
                p_ = p[None]
                v = v[None]
            else:
                p_ = p

            alpha = jnp.maximum(eps2, _rms(p_)) * rho_t

            if g.ndim > 1:
                row_mean = (jnp.sum(g * g, axis=-1, keepdims=True)
                            / (g.shape[-1] + 1e-8))
                rv_new = rv + beta_t * (row_mean - rv)
                col_mean = (jnp.sum(g * g, axis=-2, keepdims=True)
                            / (g.shape[-2] + 1e-8))
                cv_new = cv + beta_t * (col_mean - cv)
                var_est = rv_new @ cv_new
                max_row = jnp.clip(jnp.max(rv_new, axis=-2, keepdims=True),
                                   min=eps1)
                var_est = var_est / max_row
                v_new = v
            else:
                v_new = gamma * v + (1 - gamma) * g * g
                var_est = v_new
                rv_new, cv_new = rv, cv

            update = jax.lax.rsqrt(jnp.clip(var_est, min=eps1 * eps1)) * g
            inf_norm = jnp.max(jnp.abs(update))
            update = jnp.where(
                inf_norm > 0, update / jnp.maximum(inf_norm, eps1), update)
            denom = jnp.maximum(1.0, _rms(update) / d)

            # the bias predicate (optimizerc.py:113-118) is static per
            # leaf when labels are concrete ints — skip the median's
            # full sort (slow on TPU) wherever max is statically chosen
            if isinstance(b_label, (int, float)) \
                    and (p_.ndim < 3 or int(b_label) == 1):
                scale = jnp.max(jnp.abs(update), axis=-1, keepdims=True)
            elif isinstance(b_label, (int, float)):
                scale = _lower_median(jnp.abs(update), axis=-1,
                                      keepdims=True)
            else:
                use_max = (p_.ndim < 3) | (jnp.asarray(b_label) == 1)
                scale_max = jnp.max(jnp.abs(update), axis=-1,
                                    keepdims=True)
                scale_med = _lower_median(jnp.abs(update), axis=-1,
                                          keepdims=True)
                scale = jnp.where(use_max, scale_max, scale_med)
            final_dir = jnp.sign(update) * scale
            step_size = alpha / denom

            if clip:
                param_rms = _rms(p_)
                max_step = param_rms * cap
                upd_rms = _rms(final_dir * step_size)
                step_size = jnp.where(
                    upd_rms > max_step,
                    step_size * (max_step / (upd_rms + 1e-8)), step_size)

            delta = -(lr_t * decay) * p_ - step_size * final_dir
            if squeeze:
                delta = delta[0]
                v_new = v_new[0]
            return delta.astype(p.dtype), rv_new, cv_new, v_new

        out = jax.tree.map(leaf, grads, params, state.row_var,
                           state.col_var, state.v, bias_tree)
        deltas = jax.tree.map(lambda o: o[0], out,
                              is_leaf=lambda o: isinstance(o, tuple))
        rvs = jax.tree.map(lambda o: o[1], out,
                           is_leaf=lambda o: isinstance(o, tuple))
        cvs = jax.tree.map(lambda o: o[2], out,
                           is_leaf=lambda o: isinstance(o, tuple))
        vs = jax.tree.map(lambda o: o[3], out,
                          is_leaf=lambda o: isinstance(o, tuple))
        return deltas, MaxFactorState(step, rvs, cvs, vs)

    return optax.GradientTransformationExtraArgs(init_fn, update_fn)
