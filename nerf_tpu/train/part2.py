"""Part 2 — vanilla NeRF training/eval (reference: run.py:240-394).

One jit-compiled train step does everything on device: ray sampling from the
resident dataset, stratified sampling, field eval, compositing, MSE, grads,
Adam update — there is no host<->device transfer in the hot loop.
"""

from __future__ import annotations

import os
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..data.blender import BlenderDataset, sample_random_rays
from ..models import build_field
from ..render.renderer import render_rays
from ..utils.checkpoint import load_checkpoint, save_checkpoint
from ..utils.resume import load_train_state, save_train_state
from ..utils.logging import TensorBoardLogger
from ..utils.metrics import compute_psnr
from .common import ImageRenderer, composite_target, evaluate_split, save_png


def run_part2(cfg: dict, args) -> None:
    if not args.data_dir:
        raise ValueError("Part 2 requires --data_dir pointing to a NeRF "
                         "dataset root.")
    downscale = cfg.get("downscale", 1)
    white_bkgd = cfg.get("white_bkgd", True)
    scene_scale = cfg.get("scene_scale", 1.0)
    near = float(cfg.get("near", 2.0))
    far = float(cfg.get("far", 6.0))
    n_samples = cfg.get("n_samples", 64)
    render_n_samples = cfg.get("render_n_samples", n_samples)
    batch_size = cfg.get("batch_size", 4096)
    train_iters = cfg.get("train_iters", 20000)
    learning_rate = cfg.get("learning_rate", 5e-4)
    log_every = cfg.get("log_every", 100)
    save_every = cfg.get("save_every", 2000)
    chunk = args.render_chunk or cfg.get("chunk", 8192)
    log_dir = cfg.get("log_dir", "output/part2")

    os.makedirs(log_dir, exist_ok=True)
    ckpt_dir = os.path.join(log_dir, "checkpoints")
    render_dir = os.path.join(log_dir, "renders")
    os.makedirs(ckpt_dir, exist_ok=True)
    os.makedirs(render_dir, exist_ok=True)

    train_set = BlenderDataset(args.data_dir, "train", downscale,
                               white_bkgd, scene_scale)
    test_split = "test"
    if not os.path.exists(os.path.join(args.data_dir,
                                       "transforms_test.json")):
        test_split = "val"
    test_set = BlenderDataset(args.data_dir, test_split, downscale,
                              white_bkgd, scene_scale)

    field = build_field(cfg)
    key = jax.random.PRNGKey(cfg.get("seed", 0))
    params = jax.jit(field.init)(key)
    if args.checkpoint:
        ckpt = load_checkpoint(args.checkpoint)
        params = jax.tree.map(jnp.asarray, ckpt["model_state_dict"])
        print(f">>> Loaded checkpoint: {args.checkpoint}")

    bg = (jnp.ones((3,), jnp.float32) if white_bkgd
          else jnp.zeros((3,), jnp.float32))

    if not args.eval_only:
        tb_dir = os.path.join(log_dir, "tensorboard")
        tb_logger = TensorBoardLogger(tb_dir)
        print(tb_logger.banner())

        tx = optax.adam(learning_rate)
        opt_state = tx.init(params)
        data = train_set.ray_data
        H, W, focal = train_set.H, train_set.W, train_set.focal

        # Multi-chip data parallelism over the ray axis: set
        # `mesh_devices: N` in the config to shard the batch across a
        # device mesh (replicated params, grads psum'd over ICI). See
        # nerf_tpu/parallel/mesh.py.
        mesh_devices = cfg.get("mesh_devices", 1)
        if mesh_devices > 1:
            from ..parallel.mesh import make_mesh, make_parallel_train_step
            mesh = make_mesh(mesh_devices)
            print(f">>> data-parallel over {mesh.shape} mesh")
            train_step = make_parallel_train_step(
                field, tx, data, mesh, batch_size=batch_size,
                H=H, W=W, focal=focal, scene_scale=scene_scale,
                near=near, far=far, n_samples=n_samples,
                white_bkgd=white_bkgd)
        else:
            @partial(jax.jit, donate_argnums=(0, 1))
            def train_step(params, opt_state, rng):
                r_sample, r_render = jax.random.split(rng)
                rays_o, rays_d, rgba, _ = sample_random_rays(
                    data, r_sample, batch_size, H, W, focal, scene_scale)
                target = composite_target(rgba, bg)

                def loss_fn(p):
                    pred, _, _, _ = render_rays(
                        field, p, rays_o, rays_d, rng=r_render,
                        near=near, far=far, n_samples=n_samples,
                        perturb=True, bg_color=bg, train=True)
                    return jnp.mean((pred - target) ** 2)

                loss, grads = jax.value_and_grad(loss_fn)(params)
                updates, opt_state = tx.update(grads, opt_state, params)
                return (optax.apply_updates(params, updates), opt_state,
                        loss)

        print(">>> Start Training Part 2 (NeRF)...")
        rng = key
        import time as _time
        train_t0 = _time.perf_counter()

        # Full-state resume after a relay outage (see utils/resume.py).
        start_step = 0
        wall_prev = 0.0
        resume_path = os.path.join(log_dir, "resume.pth")
        if getattr(args, "resume", False):
            st = load_train_state(resume_path)
            if st is not None:
                params = jax.tree.map(jnp.asarray, st["params"])
                opt_state = jax.tree.map(jnp.asarray, st["opt_state"])
                rng = jnp.asarray(st["rng"])
                start_step = st["step"]
                wall_prev = st.get("wall", 0.0)
                print(f">>> resumed train state at step {start_step} "
                      f"({wall_prev:.0f}s accumulated)")

        for step in range(start_step + 1, train_iters + 1):
            rng, srng = jax.random.split(rng)
            params, opt_state, loss = train_step(params, opt_state, srng)
            if step % log_every == 0:
                loss_v = float(loss)
                psnr = compute_psnr(loss_v)
                print(f">>> Step {step}/{train_iters} | Loss {loss_v:.6f} | "
                      f"PSNR {psnr:.2f} dB")
                tb_logger.log_scalar("Train/Loss", loss_v, step)
                tb_logger.log_scalar("Train/PSNR", psnr, step)
            if save_every and step % save_every == 0:
                save_checkpoint(
                    os.path.join(ckpt_dir, f"model_step_{step:06d}.pth"),
                    params, cfg, step=step)
                save_train_state(
                    resume_path, params, opt_state, step, 0.0, rng,
                    wall_prev + (_time.perf_counter() - train_t0))

        save_checkpoint(os.path.join(ckpt_dir, "model_final.pth"),
                        params, cfg, step=train_iters)
        wall = wall_prev + (_time.perf_counter() - train_t0)
        print(f">>> training wall-clock {int(wall // 60)}:{wall % 60:04.1f}"
              f" ({train_iters} steps)")
        tb_logger.close()
        print(f">>> training done; TensorBoard logs in {tb_dir}")

    # Evaluation: render the test split.
    print(f">>> Rendering {test_split} set...")
    renderer = ImageRenderer(field, near=near, far=far,
                             n_samples=render_n_samples, chunk=chunk)
    avg_psnr, _ = evaluate_split(
        field, params, test_set, renderer, bg_color=bg,
        save_dir=render_dir,
        name_fn=lambda i, p, t: f"test_{i:03d}.png")
    print(f">>> Test PSNR: {avg_psnr:.2f} dB")
    print(f">>> Rendered images saved to: {render_dir}")
