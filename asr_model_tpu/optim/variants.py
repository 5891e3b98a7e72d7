"""The MaxFactor variant family (latent in the reference but part of its
API surface, SURVEY §2.3) as optax transformations built on one
parameterized factored core.

Behavioral parity map (distinctive knobs only; the factored
second-moment core is shared with optim/maxfactor.py):

* ``maxfactor99`` (optimizerc.py:149-246): beta_t clamped to
  [0.001, 0.999]; requires an explicit ``bias`` (the reference
  KeyErrors when the group lacks one — here it is a required arg).
* ``maxfactor_a`` (optimizerc.py:248-366): named-parameter depth roles —
  first 20% 'robust' (row median), to 70% 'balanced' (row RMS), rest
  'aggressive' (row max); rho has no floor; clamped beta.
  Use ``depth_role_tree`` to build the role labels from a params tree.
* ``maxfactor1`` (optimizerc.py:368-455): minimal max-scaled sign
  variant; unconditional inf-norm division; unclamped beta; no floor.
* ``maxfactor2`` (optimizerc.py:457-588): clamped beta; 1-D params take
  the RAW normalized update (no sign*scale), >1-D take row max;
  ``effective_lr`` reports the mean trust-ratio alpha per call (the
  reference's get_lr/get_last_lr).
* ``maxfactorb`` (optimizerc.py:590-704): bias 1=max, 2=median,
  else=raw update; floored rho; unclamped beta.
* ``maxheadroom`` (optimizerc.py:797-926): maxfactor1 + effective-lr
  reporting.
* ``simple_fam`` (optimizerc.py:725-768): momentum SGD whose alpha
  adapts to the high-frequency fraction of the grad FFT for params
  >1000 numel after step 100 — the FFT runs on device (one rfft per
  qualifying leaf, no host syncs).
"""

from __future__ import annotations

from typing import Any, Callable, NamedTuple, Optional, Union

import jax
import jax.numpy as jnp
import optax

from asr_model_tpu.optim.maxfactor import MaxFactorState, _lower_median, _rms


def depth_role_tree(params) -> Any:
    """MaxFactorA's depth-based roles from flattened parameter order
    (optimizerc.py:259-268)."""
    leaves, treedef = jax.tree_util.tree_flatten(params)
    total = len(leaves)
    roles = []
    for i in range(total):
        depth = i / total
        roles.append("robust" if depth < 0.2
                     else "balanced" if depth < 0.7 else "aggressive")
    return jax.tree_util.tree_unflatten(treedef, roles)


def _factored_core(lr, b_decay, eps, d, decay, gamma, maximize,
                   min_lr, clip, cap, beta_clamp, rho_floor,
                   guard_inf_norm, scale_fn, track_alpha=False):
    """Shared core; ``scale_fn(update, p, label) -> final_direction``."""
    eps1, eps2 = eps

    def init_fn(params):
        def rows(p):
            return (jnp.zeros(p.shape[:-1] + (1,), jnp.float32)
                    if p.ndim > 1 else jnp.zeros((), jnp.float32))

        def cols(p):
            return (jnp.zeros(p.shape[:-2] + (1, p.shape[-1]), jnp.float32)
                    if p.ndim > 1 else jnp.zeros((), jnp.float32))

        def vs(p):
            return (jnp.zeros(p.shape, jnp.float32) if p.ndim <= 1
                    else jnp.zeros((), jnp.float32))

        return MaxFactorState(step=jnp.zeros((), jnp.int32),
                              row_var=jax.tree.map(rows, params),
                              col_var=jax.tree.map(cols, params),
                              v=jax.tree.map(vs, params))

    def update_fn(grads, state, params=None, labels=None):
        if params is None:
            raise ValueError("factored optimizers require params")
        step = state.step + 1
        step_f = step.astype(jnp.float32)
        lr_t = jnp.asarray(lr(step_f - 1.0) if callable(lr) else lr,
                           jnp.float32)
        beta_t = step_f ** b_decay
        if beta_clamp:
            beta_t = jnp.clip(beta_t, 0.001, 0.999)
        rho_t = jnp.minimum(lr_t, 1.0 / jnp.sqrt(step_f))
        if rho_floor:
            rho_t = jnp.maximum(min_lr, rho_t)

        if labels is None:
            labels_tree = jax.tree.map(lambda _: None, params,
                                       is_leaf=lambda x: x is None)
        else:
            labels_tree = labels

        def leaf(g, p, rv, cv, v, label):
            g = g.astype(jnp.float32)
            if maximize:
                g = -g
            squeeze = p.ndim == 0
            p_ = p[None] if squeeze else p
            g = g[None] if squeeze else g
            v_ = v[None] if squeeze else v

            alpha = jnp.maximum(eps2, _rms(p_)) * rho_t
            if g.ndim > 1:
                row_mean = (jnp.sum(g * g, -1, keepdims=True)
                            / (g.shape[-1] + 1e-8))
                rv_new = rv + beta_t * (row_mean - rv)
                col_mean = (jnp.sum(g * g, -2, keepdims=True)
                            / (g.shape[-2] + 1e-8))
                cv_new = cv + beta_t * (col_mean - cv)
                var = rv_new @ cv_new
                var = var / jnp.clip(jnp.max(rv_new, -2, keepdims=True),
                                     min=eps1)
                v_new = v_
            else:
                v_new = gamma * v_ + (1 - gamma) * g * g
                var = v_new
                rv_new, cv_new = rv, cv

            update = jax.lax.rsqrt(jnp.clip(var, min=eps1 * eps1)) * g
            inf = jnp.max(jnp.abs(update))
            if guard_inf_norm:
                update = jnp.where(inf > 0,
                                   update / jnp.maximum(inf, eps1), update)
            else:
                update = update / jnp.maximum(inf, eps1)
            denom = jnp.maximum(1.0, _rms(update) / d)
            final_dir = scale_fn(update, p_, label)
            step_size = alpha / denom

            if clip:
                max_step = _rms(p_) * cap
                upd_rms = _rms(final_dir * step_size)
                step_size = jnp.where(
                    upd_rms > max_step,
                    step_size * (max_step / (upd_rms + 1e-8)), step_size)

            delta = -(lr_t * decay) * p_ - step_size * final_dir
            if squeeze:
                delta, v_new = delta[0], v_new[0]
            return (delta.astype(p.dtype), rv_new, cv_new, v_new,
                    alpha)

        out = jax.tree.map(leaf, grads, params, state.row_var,
                           state.col_var, state.v, labels_tree,
                           is_leaf=lambda x: x is None)
        pick = lambda i: jax.tree.map(
            lambda o: o[i], out, is_leaf=lambda o: isinstance(o, tuple))
        deltas = pick(0)
        new_state = MaxFactorState(step, pick(1), pick(2), pick(3))
        if track_alpha:
            alphas = jax.tree.leaves(pick(4))
            return deltas, new_state, sum(alphas) / len(alphas)
        return deltas, new_state

    return init_fn, update_fn


def _scale_max(u):
    return jnp.sign(u) * jnp.max(jnp.abs(u), -1, keepdims=True)


def _scale_median(u):
    return jnp.sign(u) * _lower_median(jnp.abs(u), -1, keepdims=True)


def _scale_rms(u):
    return jnp.sign(u) * jnp.sqrt(jnp.mean(u * u, -1, keepdims=True))


def maxfactor99(lr=0.025, bias: Union[int, Any] = 1, **kw):
    def scale_fn(u, p, label):
        b = bias if label is None else label
        use_max = (p.ndim < 3) | (jnp.asarray(b) == 1)
        return jnp.where(use_max, _scale_max(u), _scale_median(u))

    init, upd = _factored_core(
        lr, kw.get("b_decay", -0.8), kw.get("eps", (1e-8, 1e-8)),
        kw.get("d", 1.0), kw.get("decay", 0.01), kw.get("gamma", 0.99),
        kw.get("maximize", False), kw.get("min_lr", 1e-9),
        kw.get("clip", False), kw.get("cap", 0.0),
        beta_clamp=True, rho_floor=True, guard_inf_norm=True,
        scale_fn=scale_fn)
    return optax.GradientTransformationExtraArgs(init, upd)


def maxfactor_a(lr=0.00025, roles: Optional[Any] = None, **kw):
    """Pass ``roles=depth_role_tree(params)`` (or per-leaf
    'robust'/'balanced'/'aggressive' labels)."""

    def scale_fn(u, p, label):
        role = label or "balanced"
        if role == "robust":
            return _scale_median(u)
        if role == "aggressive":
            return _scale_max(u)
        return _scale_rms(u)

    init, upd = _factored_core(
        lr, kw.get("b_decay", -0.8), kw.get("eps", (1e-8, 1e-8)),
        kw.get("d", 1.0), kw.get("decay", 0.025), kw.get("gamma", 0.99),
        kw.get("maximize", False), 0.0, kw.get("clip", False),
        kw.get("cap", 0.1), beta_clamp=True, rho_floor=False,
        guard_inf_norm=False, scale_fn=scale_fn)

    def update_fn(grads, state, params=None):
        return upd(grads, state, params=params, labels=roles)

    return optax.GradientTransformationExtraArgs(init, update_fn)


def maxfactor1(lr=0.025, **kw):
    init, upd = _factored_core(
        lr, kw.get("b_decay", -0.8), kw.get("eps", (1e-8, 1e-3)),
        kw.get("d", 1.0), kw.get("decay", 0.01), kw.get("gamma", 0.99),
        kw.get("maximize", False), 0.0, kw.get("clip", False),
        kw.get("cap", 0.0), beta_clamp=False, rho_floor=False,
        guard_inf_norm=False,
        scale_fn=lambda u, p, l: _scale_max(u))
    return optax.GradientTransformationExtraArgs(init, upd)


class TrackedLRState(NamedTuple):
    """Optimizer state + the last step's mean trust-ratio step size.

    The reference's MaxFactor2/MaxHeadRoom surface their actual step
    magnitude through ``get_lr``/``get_last_lr`` (optimizerc.py:467-493,
    797-926) — host methods reading Python floats.  The TPU-native form
    is a device scalar carried in the optimizer state: read it after any
    update with ``get_last_lr(opt_state)`` (no extra host syncs inside
    the jitted step)."""
    inner: MaxFactorState
    effective_lr: jnp.ndarray


def get_last_lr(opt_state) -> float:
    """The reference's get_last_lr(): mean per-parameter effective lr
    (trust-ratio alpha) of the most recent step.  Accepts a
    TrackedLRState or any optax wrapper state containing one."""
    if isinstance(opt_state, TrackedLRState):
        return float(opt_state.effective_lr)
    for s in jax.tree.leaves(
            opt_state, is_leaf=lambda x: isinstance(x, TrackedLRState)):
        if isinstance(s, TrackedLRState):
            return float(s.effective_lr)
    raise ValueError("no TrackedLRState found: use maxfactor2/maxheadroom")


def _with_tracked_lr(init, upd):
    def init_fn(params):
        return TrackedLRState(init(params), jnp.zeros((), jnp.float32))

    def update_fn(grads, state, params=None):
        deltas, new_inner, alpha = upd(grads, state.inner, params=params)
        return deltas, TrackedLRState(new_inner,
                                      jnp.asarray(alpha, jnp.float32))

    return optax.GradientTransformationExtraArgs(init_fn, update_fn)


def maxfactor2(lr=0.025, **kw):
    """1-D params: raw normalized update; >1-D: row-max sign scaling.
    The state is a TrackedLRState: ``get_last_lr(opt_state)`` reports
    the mean effective lr of the last step (optimizerc.py:467-493)."""

    def scale_fn(u, p, label):
        if p.ndim > 1:
            return _scale_max(u)
        return u

    init, upd = _factored_core(
        lr, kw.get("b_decay", -0.8), kw.get("eps", (1e-8, 1e-3)),
        kw.get("d", 1.0), kw.get("decay", 0.01), kw.get("gamma", 0.99),
        kw.get("maximize", False), kw.get("min_lr", 1e-7),
        kw.get("clip", False), kw.get("cap", 0.0),
        beta_clamp=True, rho_floor=True, guard_inf_norm=True,
        scale_fn=scale_fn, track_alpha=True)
    return _with_tracked_lr(init, upd)


def maxfactorb(lr=0.00025, bias: int = 1, **kw):
    def scale_fn(u, p, label):
        if bias == 1:
            return _scale_max(u)
        if bias == 2:
            return _scale_median(u)
        return u

    init, upd = _factored_core(
        lr, kw.get("b_decay", -0.8), kw.get("eps", (1e-8, 1e-8)),
        kw.get("d", 1.0), kw.get("decay", 0.025), kw.get("gamma", 0.99),
        kw.get("maximize", False), kw.get("min_lr", 1e-9),
        kw.get("clip", False), kw.get("cap", 0.1),
        beta_clamp=False, rho_floor=True, guard_inf_norm=True,
        scale_fn=scale_fn)
    return optax.GradientTransformationExtraArgs(init, upd)


def maxheadroom(lr=0.025, **kw):
    """MaxFactor1 + effective-lr reporting (optimizerc.py:797-926):
    same update rule as maxfactor1, with the last step's mean
    trust-ratio alpha carried in a TrackedLRState for
    ``get_last_lr(opt_state)``."""
    init, upd = _factored_core(
        lr, kw.get("b_decay", -0.8), kw.get("eps", (1e-8, 1e-3)),
        kw.get("d", 1.0), kw.get("decay", 0.01), kw.get("gamma", 0.99),
        kw.get("maximize", False), 0.0, kw.get("clip", False),
        kw.get("cap", 0.0), beta_clamp=False, rho_floor=False,
        guard_inf_norm=False,
        scale_fn=lambda u, p, l: _scale_max(u), track_alpha=True)
    return _with_tracked_lr(init, upd)


class SimpleFAMState(NamedTuple):
    step: jnp.ndarray
    exp_avg: Any


def simple_fam(lr: float = 0.00025, alpha: float = 0.9,
               beta: float = 0.99) -> optax.GradientTransformation:
    """Momentum SGD with frequency-adaptive alpha (optimizerc.py:725-768):
    for params >1000 numel after step 100, alpha += 0.05 * (high-freq
    power fraction of the first-1000-sample grad FFT), capped at 0.98."""

    def init_fn(params):
        return SimpleFAMState(jnp.zeros((), jnp.int32),
                              jax.tree.map(jnp.zeros_like, params))

    def update_fn(grads, state, params=None):
        step = state.step + 1

        def leaf(g, m):
            g32 = g.astype(jnp.float32)
            if g.size > 1000:
                sample = g32.reshape(-1)[:1000]
                power = jnp.abs(jnp.fft.rfft(sample))
                half = power.shape[0] // 2
                high_ratio = jnp.sum(power[half:]) / (jnp.sum(power) + 1e-8)
                eff = jnp.minimum(0.98, alpha + 0.05 * high_ratio)
                eff = jnp.where(step > 100, eff, alpha)
            else:
                eff = jnp.asarray(alpha)
            m_new = eff * m + (1 - eff) * g32
            return m_new

        new_m = jax.tree.map(leaf, grads, state.exp_avg)
        deltas = jax.tree.map(lambda m, g: (-lr * m).astype(g.dtype),
                              new_m, grads)
        return deltas, SimpleFAMState(step, new_m)

    return optax.GradientTransformationExtraArgs(init_fn, update_fn)
