"""Optimizer recipes: cosine schedule, grouped LRs, per-module clipping.

These reproduce the reference's training recipes exactly (SURVEY.md
section 7.3 lists them as convergence-critical)."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import optax

from nerf_tpu.train.optimizers import (build_optimizer, clip_by_subtree_norm,
                                       cosine_lr, current_lr, scale_by_path)
from nerf_tpu.train.part4 import _lr_mult


def test_cosine_schedule_matches_torch_formula():
    lr0, eta_min, T = 0.01, 1e-4, 1000
    sched = cosine_lr(lr0, T, eta_min)
    for step in (0, 1, 250, 500, 999, 1000):
        expected = eta_min + 0.5 * (lr0 - eta_min) * (
            1 + math.cos(math.pi * min(step / T, 1.0)))
        np.testing.assert_allclose(float(sched(step)), expected, rtol=1e-6)
        np.testing.assert_allclose(current_lr(lr0, step, T, eta_min),
                                   expected, rtol=1e-6)


def test_part4_lr_multipliers():
    assert _lr_mult(("deform_grid_start",)) == 2.0
    assert _lr_mult(("deform_grid_mid",)) == 2.0
    assert _lr_mult(("canonical_repr",)) == 2.0
    assert _lr_mult(("deform_decoder", "displacement_scale")) == 5.0
    assert _lr_mult(("deform_decoder", "net", 0, "w")) == 1.0
    assert _lr_mult(("time_modulation", 0, "w")) == 1.0


def test_scale_by_path_applies_multipliers():
    params = {"a": jnp.ones((2,)), "b": {"displacement_scale": jnp.ones(())}}
    tx = scale_by_path(lambda path: 5.0
                       if "displacement_scale" in path else 2.0)
    state = tx.init(params)
    updates, _ = tx.update(params, state)
    np.testing.assert_allclose(np.asarray(updates["a"]), 2.0)
    np.testing.assert_allclose(float(updates["b"]["displacement_scale"]),
                               5.0)


def test_clip_by_subtree_norm_is_per_module():
    grads = {"big": {"w": jnp.full((4,), 10.0)},     # norm 20
             "small": {"w": jnp.full((4,), 0.1)}}    # norm 0.2
    tx = clip_by_subtree_norm(1.0)
    updates, _ = tx.update(grads, tx.init(grads))
    # big is clipped to norm 1, small untouched.
    np.testing.assert_allclose(
        float(jnp.linalg.norm(updates["big"]["w"])), 1.0, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(updates["small"]["w"]), 0.1,
                               rtol=1e-5)


def test_build_optimizer_grouped_lr_moves_params_proportionally():
    params = {"canonical_repr": jnp.ones((4,)),
              "decoder": {"w": jnp.ones((4,))}}
    tx = build_optimizer("adamw", 0.01, 100, weight_decay=0.0,
                         eta_min=0.001, lr_mult_fn=_lr_mult)
    state = tx.init(params)
    grads = jax.tree.map(jnp.ones_like, params)
    updates, _ = tx.update(grads, state, params)
    # Adam normalizes the first step to ~lr; the grid group moves 2x.
    ratio = float(updates["canonical_repr"][0] / updates["decoder"]["w"][0])
    np.testing.assert_allclose(ratio, 2.0, rtol=1e-3)


def test_grouped_cosine_anneals_every_group_to_shared_eta_min():
    # torch CosineAnnealingLR anneals each param group from its own base lr
    # (mult * lr) to the SHARED eta_min floor (reference: run.py:1740-1741);
    # applying the multiplier after the schedule would floor the x2 group at
    # 2 * eta_min instead.
    lr0, eta_min, T = 0.01, 1e-4, 10
    params = {"canonical_repr": jnp.ones((4,)),
              "decoder": {"w": jnp.ones((4,))}}
    tx = build_optimizer("adamw", lr0, T, weight_decay=0.0,
                         eta_min=eta_min, lr_mult_fn=_lr_mult)
    state = tx.init(params)
    grads = jax.tree.map(jnp.ones_like, params)
    updates = None
    for _ in range(T + 1):
        updates, state = tx.update(grads, state, params)
    # Adam normalizes constant grads to unit scale, so at step >= T the
    # update magnitude is the terminal LR: eta_min for EVERY group.
    np.testing.assert_allclose(float(-updates["canonical_repr"][0]),
                               eta_min, rtol=1e-3)
    np.testing.assert_allclose(float(-updates["decoder"]["w"][0]),
                               eta_min, rtol=1e-3)
