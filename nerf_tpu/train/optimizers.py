"""Optimizer construction: Adam/AdamW + cosine decay + grad clipping.

Replicates the reference training recipes, which materially affect the PSNR
targets (SURVEY.md section 7.3):
  * part1/part2: Adam(lr) (reference: run.py:168, 307).
  * part2_instant: AdamW + CosineAnnealingLR(eta_min) + per-module grad clip
    (reference: run.py:546-550, 624-627).
  * part3: AdamW + cosine + global clip (reference: run.py:1016-1021, 1174).
  * part4: grouped learning rates — deform grids x2, canonical x2,
    displacement_scale x5, rest x1 (reference: run.py:1684-1738).

bf16-native training replaces the reference's AMP GradScaler machinery
(reference: run.py:21-27): bf16 shares fp32's exponent range, so no loss
scaling is needed.
"""

from __future__ import annotations

from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp
import optax


def cosine_lr(lr: float, train_iters: int, eta_min: float) -> Callable:
    """torch CosineAnnealingLR: lr(t) = eta_min + (lr-eta_min)(1+cos(pi t/T))/2."""
    def schedule(count):
        frac = jnp.minimum(count / train_iters, 1.0)
        return eta_min + 0.5 * (lr - eta_min) * (1.0 + jnp.cos(jnp.pi * frac))
    return schedule


def _path_keys(path):
    return tuple(getattr(p, "key", getattr(p, "idx", None)) for p in path)


def scale_by_path(mult_fn: Callable) -> optax.GradientTransformation:
    """Scale each update leaf by `mult_fn(path_keys)` where `path_keys` is the
    tuple of string keys addressing the leaf (grouped learning rates)."""

    def init_fn(params):
        return optax.EmptyState()

    def update_fn(updates, state, params=None):
        out = jax.tree_util.tree_map_with_path(
            lambda path, u: u * mult_fn(_path_keys(path)), updates)
        return out, state

    return optax.GradientTransformation(init_fn, update_fn)


def scale_by_grouped_cosine(
    lr: float, train_iters: int, eta_min: float, mult_fn: Callable,
) -> optax.GradientTransformation:
    """Per-group torch CosineAnnealingLR (negated for gradient descent).

    Each group's base LR is `mult_fn(path) * lr` and every group anneals to
    the SHARED eta_min floor — matching torch, where param groups carry their
    own base lr but CosineAnnealingLR applies one eta_min to all of them
    (reference: run.py:1684-1738 sets the grouped lrs, run.py:1740-1741 wraps
    them in one scheduler). Applying a flat multiplier after the schedule
    would instead floor group g at mult_g * eta_min.
    """

    def init_fn(params):
        return optax.ScaleByScheduleState(count=jnp.zeros([], jnp.int32))

    def update_fn(updates, state, params=None):
        frac = jnp.minimum(state.count / train_iters, 1.0)
        cos_term = 0.5 * (1.0 + jnp.cos(jnp.pi * frac))

        def _scale(path, u):
            base = mult_fn(_path_keys(path)) * lr
            return u * -(eta_min + (base - eta_min) * cos_term)

        out = jax.tree_util.tree_map_with_path(_scale, updates)
        return out, optax.ScaleByScheduleState(count=state.count + 1)

    return optax.GradientTransformation(init_fn, update_fn)


def clip_by_subtree_norm(max_norm: float) -> optax.GradientTransformation:
    """Clip each top-level param subtree to `max_norm` independently —
    the reference's per-module clip_grad_norm_ (reference: run.py:624-627)."""

    def init_fn(params):
        return optax.EmptyState()

    def update_fn(updates, state, params=None):
        out = {}
        for k, v in updates.items():
            leaves = jax.tree.leaves(v)
            gnorm = jnp.sqrt(sum(jnp.sum(jnp.square(l)) for l in leaves))
            scale = jnp.minimum(1.0, max_norm / (gnorm + 1e-6))
            out[k] = jax.tree.map(lambda u: u * scale, v)
        return out, state

    return optax.GradientTransformation(init_fn, update_fn)


def build_optimizer(
    kind: str,
    lr: float,
    train_iters: int,
    *,
    weight_decay: float = 0.0,
    eta_min: Optional[float] = None,
    max_grad_norm: Optional[float] = None,
    per_module_clip: bool = False,
    lr_mult_fn: Optional[Callable] = None,
) -> optax.GradientTransformation:
    """Assemble the optimizer chain for one training recipe."""
    parts = []
    if per_module_clip and max_grad_norm:
        parts.append(clip_by_subtree_norm(max_grad_norm))
    elif max_grad_norm:
        parts.append(optax.clip_by_global_norm(max_grad_norm))

    parts.append(optax.scale_by_adam())
    if kind == "adamw" and weight_decay:
        parts.append(optax.add_decayed_weights(weight_decay))

    if lr_mult_fn is not None and eta_min is not None:
        parts.append(scale_by_grouped_cosine(lr, train_iters, eta_min,
                                             lr_mult_fn))
    elif eta_min is not None:
        sched = cosine_lr(lr, train_iters, eta_min)
        parts.append(optax.scale_by_schedule(lambda c: -sched(c)))
    else:
        parts.append(optax.scale(-lr))
        if lr_mult_fn is not None:
            parts.append(scale_by_path(lr_mult_fn))
    return optax.chain(*parts)


def current_lr(kind_lr: float, step: int, train_iters: int,
               eta_min: Optional[float]) -> float:
    """Host-side mirror of the schedule for logging."""
    if eta_min is None:
        return kind_lr
    import math
    frac = min(step / train_iters, 1.0)
    return eta_min + 0.5 * (kind_lr - eta_min) * (1 + math.cos(math.pi * frac))
