"""Integration tests: tiny synthetic scenes driving the training machinery
for the hash-grid and dynamic pipelines (SURVEY.md section 4)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest
from functools import partial

from nerf_tpu.data.blender import (BlenderDataset, DynamicDataset,
                                   sample_random_rays)
from nerf_tpu.data.synthetic import make_synthetic_blender_scene
from nerf_tpu.models import build_field
from nerf_tpu.render.density_grid import (DensityGridSpec, density_grid_init,
                                          make_grid_updater)
from nerf_tpu.render.renderer import render_rays
from nerf_tpu.utils.checkpoint import load_checkpoint, save_checkpoint


@pytest.fixture(scope="module")
def static_scene(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("scene_static"))
    return make_synthetic_blender_scene(root, n_train=6, n_val=2, n_test=2,
                                        image_size=24)


@pytest.fixture(scope="module")
def dynamic_scene(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("scene_dyn"))
    return make_synthetic_blender_scene(root, n_train=8, n_val=2, n_test=2,
                                        image_size=24, dynamic=True)


def _train(field, params, data, H, W, focal, steps, batch=256, n_samples=16,
           needs_time=False, lr=5e-3):
    tx = optax.adam(lr)
    opt_state = tx.init(params)
    bg = jnp.ones((3,))

    @partial(jax.jit, donate_argnums=(0, 1))
    def step(params, opt_state, rng):
        r1, r2 = jax.random.split(rng)
        ro, rd, rgba, times = sample_random_rays(data, r1, batch, H, W,
                                                 focal, 1.0)
        tgt = rgba[:, :3] * rgba[:, 3:4] + bg * (1 - rgba[:, 3:4])

        def loss_fn(p):
            out = render_rays(field, p, ro, rd, rng=r2, near=2.0, far=6.0,
                              n_samples=n_samples, perturb=True,
                              times=times if needs_time else None,
                              bg_color=bg, train=True)
            return jnp.mean((out[0] - tgt) ** 2)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    rng = jax.random.PRNGKey(1)
    first = None
    for _ in range(steps):
        rng, s = jax.random.split(rng)
        params, opt_state, loss = step(params, opt_state, s)
        if first is None:
            first = float(loss)
    return params, first, float(loss)


def test_instant_pipeline_learns(static_scene, rng_key):
    cfg = {"mode": "part2_instant", "n_levels": 6, "log2_hashmap_size": 10,
           "base_resolution": 8, "hidden_dim": 16, "scene_bound": 3.5}
    field = build_field(cfg)
    params = jax.jit(field.init)(rng_key)
    ds = BlenderDataset(static_scene, "train")
    params, first, last = _train(field, params, ds.ray_data, ds.H, ds.W,
                                 ds.focal, steps=150)
    assert last < first * 0.5


def test_part4_pipeline_learns(dynamic_scene, rng_key):
    cfg = {"mode": "part4", "n_levels": 5, "log2_hashmap_size": 9,
           "base_resolution": 8, "deform_n_levels": 3,
           "deform_log2_hashmap_size": 8, "hidden_dim": 16,
           "deform_hidden_dim": 16, "time_modulation_dim": 8,
           "L_embed_time": 4, "scene_bound": 3.5}
    field = build_field(cfg)
    params = jax.jit(field.init)(rng_key)
    ds = DynamicDataset(dynamic_scene, "train")
    params, first, last = _train(field, params, ds.ray_data, ds.H, ds.W,
                                 ds.focal, steps=120, needs_time=True)
    assert last < first * 0.6


def test_checkpoint_roundtrip(tmp_path, rng_key):
    cfg = {"mode": "part2_instant", "n_levels": 4, "log2_hashmap_size": 9,
           "hidden_dim": 16}
    field = build_field(cfg)
    params = jax.jit(field.init)(rng_key)
    gspec = DensityGridSpec(8, 1.0, 0.01)
    grid = density_grid_init(gspec)
    path = os.path.join(str(tmp_path), "ckpt.pth")
    save_checkpoint(path, params, cfg, step=42, val_psnr=31.5,
                    density_grid=grid)
    ckpt = load_checkpoint(path)
    assert ckpt["step"] == 42 and ckpt["val_psnr"] == 31.5
    assert ckpt["config"]["mode"] == "part2_instant"
    restored = jax.tree.map(jnp.asarray, ckpt["model_state_dict"])
    x = jax.random.uniform(rng_key, (7, 3))
    d = jax.random.normal(rng_key, (7, 3))
    a = field.apply(params, x, d)
    b = field.apply(restored, x, d)
    np.testing.assert_allclose(np.asarray(a[0]), np.asarray(b[0]))
    assert ckpt["density_grid"]["binary"].shape == (8, 8, 8)


def test_grid_update_then_masked_training(static_scene, rng_key):
    """Grid update + masked render in a train step (the part2_instant
    hot path) stays finite and keeps learning."""
    cfg = {"mode": "part2_instant", "n_levels": 4, "log2_hashmap_size": 9,
           "base_resolution": 8, "hidden_dim": 16, "scene_bound": 3.5}
    field = build_field(cfg)
    params = jax.jit(field.init)(rng_key)
    gspec = DensityGridSpec(16, 3.5, 1e-4)
    update = make_grid_updater(field.apply, gspec, needs_time=False,
                               chunk=1024)
    state, ar = update(params, density_grid_init(gspec), jnp.zeros((1,)),
                       1.0)
    assert 0.0 < float(ar) <= 1.0

    ds = BlenderDataset(static_scene, "train")
    ro, rd, rgba, _ = sample_random_rays(ds.ray_data, rng_key, 64,
                                         ds.H, ds.W, ds.focal, 1.0)
    rgb, _, acc, _ = render_rays(field, params, ro, rd, near=2.0, far=6.0,
                                 n_samples=16, perturb=False,
                                 grid_binary=state["binary"],
                                 grid_spec=gspec, capacity=256)
    assert bool(jnp.all(jnp.isfinite(rgb)))
