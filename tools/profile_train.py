"""Profile the part2_instant training step on the TPU.

Builds the exact trainer step (mask and budget variants) from a config +
dataset, times each, and writes a profiler trace for the budget variant.

Usage: python tools/profile_train.py --config /tmp/runcfg/prox_p2i.yaml \
           --data_dir /tmp/lego_proxy
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
import yaml


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", required=True)
    ap.add_argument("--data_dir", required=True)
    args = ap.parse_args()
    cfg = yaml.safe_load(open(args.config))

    from functools import partial

    from nerf_tpu.data.blender import BlenderDataset, sample_random_rays
    from nerf_tpu.models import build_field
    from nerf_tpu.render.density_grid import DensityGridSpec
    from nerf_tpu.render.renderer import render_rays
    from nerf_tpu.train.common import composite_target
    from nerf_tpu.train.optimizers import build_optimizer
    from nerf_tpu.train.part2_instant import tv_loss_flat

    train_set = BlenderDataset(args.data_dir, "train",
                               cfg.get("downscale", 2),
                               cfg.get("white_bkgd", True),
                               cfg.get("scene_scale", 1.0))
    data = train_set.ray_data
    H, W, focal = train_set.H, train_set.W, train_set.focal

    field = build_field(cfg)
    key = jax.random.PRNGKey(0)
    params = jax.jit(field.init)(key)
    tx = build_optimizer("adamw", cfg["learning_rate"], cfg["train_iters"],
                         weight_decay=cfg.get("weight_decay", 1e-5),
                         eta_min=cfg.get("eta_min", 1e-4),
                         max_grad_norm=1.0, per_module_clip=True)
    opt_state = tx.init(params)

    grid_spec = DensityGridSpec(cfg.get("grid_resolution", 128),
                                cfg.get("scene_bound", 1.5),
                                cfg.get("grid_threshold", 0.01))
    lin = np.linspace(-1.5, 1.5, grid_spec.resolution, dtype=np.float32)
    xx, yy, zz = np.meshgrid(lin, lin, lin, indexing="ij")
    binary = jnp.asarray((xx**2 + yy**2 + zz**2) < 0.9**2)

    batch = cfg["batch_size"]
    n_samples = cfg["n_samples"]
    scene_scale = cfg.get("scene_scale", 1.0)
    near, far = float(cfg.get("near", 2.0)), float(cfg.get("far", 6.0))
    bgc = jnp.ones((3,), jnp.float32)

    def make_step(ray_budget, use_grid):
        @partial(jax.jit, donate_argnums=(0, 1))
        def step(params, opt_state, rng):
            r_sample, r_render = jax.random.split(rng)
            rays_o, rays_d, rgba, _ = sample_random_rays(
                data, r_sample, batch, H, W, focal, scene_scale)
            target = composite_target(rgba, bgc)

            def loss_fn(p):
                pred, _, _, _ = render_rays(
                    field, p, rays_o, rays_d, rng=r_render,
                    near=near, far=far, n_samples=n_samples,
                    perturb=True, bg_color=bgc, train=True,
                    grid_binary=binary if use_grid else None,
                    grid_spec=grid_spec,
                    ray_budget=ray_budget if use_grid else None)
                loss_rgb = jnp.mean((pred - target) ** 2)
                return loss_rgb + tv_loss_flat(p["representation"]) * 1e-6
            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt_state = tx.update(grads, opt_state, params)
            params = jax.tree.map(lambda a, u: a + u, params, updates)
            return params, opt_state, loss
        return step

    def bench(name, step, params, opt_state, n=10):
        rng = jax.random.PRNGKey(1)
        rng, s = jax.random.split(rng)
        params, opt_state, loss = step(params, opt_state, s)
        float(loss)
        t0 = time.perf_counter()
        for _ in range(n):
            rng, s = jax.random.split(rng)
            params, opt_state, loss = step(params, opt_state, s)
        float(loss)
        dt = (time.perf_counter() - t0) / n
        print(f"{name}: {dt*1e3:.1f} ms/step")
        return params, opt_state

    p2, o2 = jax.tree.map(lambda x: x, params), tx.init(params)
    step_budget = make_step(cfg.get("train_ray_budget", 32), True)
    params_b, opt_b = bench("budget step (grid, k=32)", step_budget,
                            params, opt_state)

    pm = jax.jit(field.init)(key)
    step_mask = make_step(None, False)
    bench("dense mask step (warmup)", step_mask, pm, tx.init(pm))

    os.makedirs("/tmp/nerf_trace_train", exist_ok=True)
    rng = jax.random.PRNGKey(2)
    with jax.profiler.trace("/tmp/nerf_trace_train"):
        rng, s = jax.random.split(rng)
        params_b, opt_b, loss = step_budget(params_b, opt_b, s)
        float(loss)
    print("trace written to /tmp/nerf_trace_train")


if __name__ == "__main__":
    main()
