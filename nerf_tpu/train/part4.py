"""Part 4 — Dual-Hash dynamic NeRF (reference: run.py:1562-2331).

The novel pipeline: three time-anchored displacement hash grids with
C1 triangle-weighted interpolation, a sigmoid time-modulation MLP, a hash
canonical field, grouped learning rates (grids x2, displacement_scale x5),
and a seven-term loss whose cadenced terms (temporal x16, volume x32,
anchors x16) are `lax.cond`-gated inside ONE jitted train step.

Reference quirk fixed (SURVEY.md section 7.4): the reference's part-4 grid
update passes kwargs `DensityGrid.update` does not accept and would crash
past warmup (reference: run.py:1982-1985); here the intended behavior — an
occupancy union over the update anchor times {1/6, 1/2, 5/6}
(reference: run.py:1976) — runs as one jitted update, with
`grid_update_times: N` opting into a denser linspace union.
"""

from __future__ import annotations

import os
import random
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..data.blender import DynamicDataset, sample_random_rays
from ..models import build_field
from ..render.density_grid import (DensityGridSpec, density_grid_init,
                                   make_grid_updater, should_update,
                                   staged_interval)
from ..render.renderer import render_rays
from ..utils.checkpoint import load_checkpoint, save_checkpoint
from ..utils.resume import load_train_state, save_train_state
from ..utils.logging import TensorBoardLogger, get_exp_name
from ..utils.metrics import compute_psnr
from ..utils.profiling import StepTimer, TraceCapture
from .common import (ImageRenderer, budget_compact_capacity,
                     composite_target, evaluate_split)
from .optimizers import build_optimizer, current_lr
from .part2_instant import tv_loss_flat
from .part3 import _part3_eval


def _lr_mult(path_keys) -> float:
    """Grouped learning rates (reference: run.py:1684-1738)."""
    if "displacement_scale" in path_keys:
        return 5.0
    if path_keys and path_keys[0] in ("deform_grid_start", "deform_grid_mid",
                                      "deform_grid_end", "canonical_repr"):
        return 2.0
    return 1.0


def make_part4_train_step(cfg: dict, field, tx, data, *, H, W, focal,
                          capacity=None, ray_budget=None,
                          n_samples_step=None,
                          mesh=None, axis: str = "data"):
    """Build the jitted Part-4 train step: 7-term loss (RGB, delta-x L2,
    TV-displacement x3, TV-canonical, cadenced temporal / volume /
    tri-grid-anchor terms, reference: run.py:1836-1936) + AdamW with
    grouped LRs.

    When `mesh` is given the ray batch shards across it (shard_map): each
    device samples batch_size/n_dev rays with a device-folded key and the
    regularizers draw device-distinct sample points; params and optimizer
    state stay replicated through one pmean over grads. Single-device and
    mesh semantics match in expectation (the RGB term is a mean over the
    same global batch size).

    Returns train_step(params, opt_state, rng, step, grid_binary,
    use_grid=False) -> (params, opt_state, total, aux7).
    """
    scene_scale = cfg.get("scene_scale", 1.0)
    near = float(cfg.get("near", 2.0))
    far = float(cfg.get("far", 6.0))
    n_samples = n_samples_step or cfg.get("n_samples", 64)
    batch_size = cfg.get("batch_size", 4096)
    white_bkgd = cfg.get("white_bkgd", True)
    scene_bound = cfg.get("scene_bound", 1.5)
    grid_spec = DensityGridSpec(cfg.get("grid_resolution", 128),
                                scene_bound,
                                cfg.get("grid_threshold", 0.01))
    fixed_bg = (jnp.ones((3,), jnp.float32) if white_bkgd
                else jnp.zeros((3,), jnp.float32))

    use_tv_disp = cfg.get("use_tv_displacement", True)
    tv_disp_weight = cfg.get("tv_displacement_weight", 0.001)
    tv_loss_weight = cfg.get("tv_loss_weight", 1e-5)
    deformation_reg_weight = cfg.get("deformation_reg_weight", 0.01)
    use_temporal_smooth = cfg.get("use_temporal_smooth", True)
    temporal_smooth_weight = cfg.get("temporal_smooth_weight", 1e-4)
    temporal_epsilon = cfg.get("temporal_epsilon", 0.02)
    use_random_bg = cfg.get("use_random_bg", False)
    random_bg_start = (cfg.get("random_bg_start", 0)
                       if use_random_bg else 10 ** 9)
    use_unsup = cfg.get("use_unsupervised_consistency", False)
    unsup_weight = cfg.get("unsup_consistency_weight", 0.001)
    use_static_anchor = cfg.get("use_static_anchor", True)
    static_anchor_weight = cfg.get("static_anchor_weight", 0.01)
    # Sample counts for the cadenced regularizers (reference: run.py:1866,
    # 1887, 1908 draw temporal/unsup/anchor batches of these sizes).
    temporal_ns = int(cfg.get("temporal_n_samples", 256))
    unsup_ns = int(cfg.get("unsup_n_samples", 512))
    anchor_ns = int(cfg.get("static_anchor_n_samples", 512))
    grid_warmup_iters = cfg.get("grid_warmup_iters", 256)
    budget_mode = cfg.get("train_budget_mode", "first")
    via_grid = field.deform_delta_via_grid

    n_dev = mesh.shape[axis] if mesh is not None else 1
    if batch_size % n_dev:
        raise ValueError(f"batch_size {batch_size} must be divisible by "
                         f"the mesh size {n_dev}")
    local_batch = batch_size // n_dev

    def local_grads(params, rng, step, grid_binary, use_grid):
        rs = list(jax.random.split(rng, 8))
        if mesh is not None:
            # Device-unique keys for ray sampling, render jitter, and the
            # regularizer sample points (more reg coverage per step); the
            # bg key rs[1] stays unfolded so every device composites
            # against the same per-step background, like the reference.
            idx = jax.lax.axis_index(axis)
            for i in (0, 2, 3, 4, 5, 6, 7):
                rs[i] = jax.random.fold_in(rs[i], idx)
        rays_o, rays_d, rgba, times = sample_random_rays(
            data, rs[0], local_batch, H, W, focal, scene_scale)
        rand_bg = jax.random.uniform(rs[1], (3,))
        use_rand = jnp.logical_and(use_random_bg,
                                   step >= random_bg_start)
        bg = jnp.where(use_rand, rand_bg, fixed_bg)
        target = composite_target(rgba, bg)
        warm = step > grid_warmup_iters

        def loss_fn(p):
            pred, _, _, extras = render_rays(
                field, p, rays_o, rays_d, rng=rs[2],
                near=near, far=far, n_samples=n_samples,
                perturb=True, times=times, bg_color=bg, train=True,
                grid_binary=grid_binary if use_grid else None,
                grid_spec=grid_spec,
                capacity=capacity if use_grid else None,
                ray_budget=ray_budget if use_grid else None,
                budget_mode=budget_mode)
            loss_rgb = jnp.mean((pred - target) ** 2)
            loss_reg = jnp.mean(extras["mean_delta_x"] ** 2) \
                * deformation_reg_weight

            # TV over the three displacement grids, averaged
            # (reference: run.py:1842-1852).
            loss_tv_disp = 0.0
            if use_tv_disp:
                loss_tv_disp = (
                    tv_loss_flat(p["deform_grid_start"])
                    + tv_loss_flat(p["deform_grid_mid"])
                    + tv_loss_flat(p["deform_grid_end"])
                ) * tv_disp_weight / 3.0

            loss_tv_canon = 0.0
            if tv_loss_weight > 0:
                loss_tv_canon = tv_loss_flat(p["canonical_repr"]) \
                    * tv_loss_weight

            # Temporal smoothness every 16 steps, 64 pts, via the
            # start grid (reference: run.py:1862-1881).
            loss_temporal = 0.0
            if use_temporal_smooth:
                def t_loss():
                    x = jax.random.uniform(
                        rs[3], (temporal_ns, 3), minval=-scene_bound,
                        maxval=scene_bound)
                    t0 = jax.random.uniform(
                        rs[4], (temporal_ns, 1),
                        maxval=1.0 - temporal_epsilon)
                    d0 = via_grid(p, "deform_grid_start", x, t0)
                    d1 = via_grid(p, "deform_grid_start", x,
                                  t0 + temporal_epsilon)
                    return jnp.mean((d0 - d1) ** 2) \
                        * temporal_smooth_weight * 16.0
                gate = jnp.logical_and(warm, step % 16 == 0)
                loss_temporal = jax.lax.cond(
                    gate, t_loss, lambda: jnp.float32(0.0))

            # Volume conservation every 32 steps, 128 pts
            # (reference: run.py:1884-1896).
            loss_unsup = 0.0
            if use_unsup:
                def u_loss():
                    t_r = jax.random.uniform(rs[5], (unsup_ns, 1))
                    x_r = jax.random.uniform(
                        rs[6], (unsup_ns, 3), minval=-scene_bound,
                        maxval=scene_bound)
                    d_r = via_grid(p, "deform_grid_start", x_r, t_r)
                    return jnp.mean(jnp.abs(d_r.mean(axis=0))) \
                        * unsup_weight * 32.0
                gate = jnp.logical_and(warm, step % 32 == 0)
                loss_unsup = jax.lax.cond(
                    gate, u_loss, lambda: jnp.float32(0.0))

            # Tri-grid anchor losses every 16 steps: t=0 zero
            # displacement + start/mid consistency at t=1/6
            # (reference: run.py:1905-1936).
            loss_anchor = 0.0
            if use_static_anchor:
                def a_loss():
                    x_a = jax.random.uniform(
                        rs[7], (anchor_ns, 3), minval=-scene_bound,
                        maxval=scene_bound)
                    t_zero = jnp.zeros((anchor_ns, 1))
                    d_zero = via_grid(p, "deform_grid_start",
                                      x_a, t_zero)
                    loss_start = jnp.mean(d_zero ** 2)
                    t_a = jnp.full((anchor_ns, 1), 1.0 / 6.0)
                    d_s = via_grid(p, "deform_grid_start", x_a, t_a)
                    d_m = via_grid(p, "deform_grid_mid", x_a, t_a)
                    loss_cons = jnp.mean((d_s - d_m) ** 2) * 0.1
                    return (loss_start + loss_cons) \
                        * static_anchor_weight * 16.0
                gate = jnp.logical_and(warm, step % 16 == 0)
                loss_anchor = jax.lax.cond(
                    gate, a_loss, lambda: jnp.float32(0.0))

            total = (loss_rgb + loss_reg + loss_tv_disp
                     + loss_tv_canon + loss_temporal + loss_unsup
                     + loss_anchor)
            return total, (loss_rgb, loss_reg, loss_tv_disp,
                           loss_tv_canon, loss_temporal, loss_unsup,
                           loss_anchor)

        (total, aux), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        if mesh is not None:
            # One reduction rides the ICI: grads + the logged scalars.
            total, aux, grads = jax.lax.pmean((total, aux, grads), axis)
        return total, aux, grads

    @partial(jax.jit, donate_argnums=(0, 1), static_argnames=("use_grid",))
    def train_step(params, opt_state, rng, step, grid_binary,
                   use_grid=False):
        fn = partial(local_grads, use_grid=use_grid)
        if mesh is not None:
            from jax.sharding import PartitionSpec as P
            fn = jax.shard_map(
                fn, mesh=mesh,
                in_specs=(P(), P(), P(), P()),
                out_specs=(P(), P(), P()), check_vma=False)
        total, aux, grads = fn(params, rng, step, grid_binary)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = jax.tree.map(lambda a, u: a + u, params, updates)
        return params, opt_state, total, aux

    return train_step


def run_part4(cfg: dict, args) -> None:
    # Host-side RNG for val-split / render-image choices: seeded so the
    # val split and best-checkpoint selection reproduce across reruns.
    py_rng = random.Random(cfg.get("seed", 0))
    if not args.data_dir:
        raise ValueError("Part 4 requires --data_dir pointing to a dynamic "
                         "NeRF dataset root.")
    print(">>> Part 4: Dual-Hash Dynamic NeRF")

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
    chunk = args.render_chunk or cfg.get("chunk", 8192)
    render_n = args.render_n
    log_dir = os.path.join(cfg.get("log_dir", "output/part4"),
                           os.path.basename(args.data_dir))

    os.makedirs(log_dir, exist_ok=True)
    render_dir = os.path.join(log_dir, "renders")
    val_render_dir = os.path.join(log_dir, "val_renders")
    os.makedirs(render_dir, exist_ok=True)
    os.makedirs(val_render_dir, exist_ok=True)

    train_set = DynamicDataset(args.data_dir, "train", downscale,
                               white_bkgd, scene_scale)
    val_set = DynamicDataset(args.data_dir, "val", downscale,
                             white_bkgd, scene_scale)
    test_split = "test"
    if not os.path.exists(os.path.join(args.data_dir,
                                       "transforms_test.json")):
        test_split = "val"
    test_set = DynamicDataset(args.data_dir, test_split, downscale,
                              white_bkgd, scene_scale)
    print(f">>> dataset: train {len(train_set)} | val {len(val_set)} | "
          f"test {len(test_set)}")

    field = build_field(cfg)
    key = jax.random.PRNGKey(cfg.get("seed", 0))
    params = jax.jit(field.init)(key)

    use_density_grid = cfg.get("use_density_grid", True)
    grid_spec = DensityGridSpec(cfg.get("grid_resolution", 128),
                                cfg.get("scene_bound", 1.5),
                                cfg.get("grid_threshold", 0.01))
    grid_state = density_grid_init(grid_spec) if use_density_grid else None
    grid_update = (make_grid_updater(field.apply, grid_spec, needs_time=True)
                   if use_density_grid else None)
    active_ratio = 1.0
    if use_density_grid:
        print(f">>> density grid enabled: {grid_spec.resolution}^3")

    if args.checkpoint:
        ckpt = load_checkpoint(args.checkpoint)
        params = jax.tree.map(jnp.asarray, ckpt["model_state_dict"])
        if grid_state is not None and "density_grid" in ckpt:
            grid_state = jax.tree.map(jnp.asarray, ckpt["density_grid"])
            active_ratio = float(jnp.mean(
                grid_state["binary"].astype(jnp.float32)))
        print(f">>> Loaded checkpoint: {args.checkpoint}")
        if args.eval_only and grid_state is not None \
                and cfg.get("eval_rebuild_grid", True):
            # Checkpoints saved before the periodic re-prune landed carry
            # a permanent-memory grid that is mostly stale early-training
            # noise (r3 ckpt: 99% active vs 16% from a fresh rebuild of
            # the same weights) — it flattens the eval-time occupancy-CDF
            # placement. Rebuild from the trained field over a dense time
            # union (a superset of the anchor sweep, so nothing reachable
            # is masked). Opt out with eval_rebuild_grid: false.
            grid_state, ar = grid_update(
                params, grid_state, jnp.linspace(0.0, 1.0, 16), 1.0,
                jnp.asarray(True))
            active_ratio = float(ar)
            print(f">>> eval grid rebuilt from the trained field: "
                  f"{active_ratio * 100:.1f}% active")

    fixed_bg = (jnp.ones((3,), jnp.float32) if white_bkgd
                else jnp.zeros((3,), jnp.float32))
    scene_bound = cfg.get("scene_bound", 1.5)

    n_pts = batch_size * n_samples
    cap_frac = cfg.get("occupancy_capacity_fraction", 1.0 / 3.0)
    train_capacity = max(4096, int(n_pts * cap_frac) // 1024 * 1024)
    switch_ratio = cfg.get("capacity_switch_ratio", 0.25)

    if not args.eval_only:
        tb_dir = os.path.join(log_dir, "tensorboard", get_exp_name(cfg))
        tb_logger = TensorBoardLogger(tb_dir)

        weight_decay = cfg.get("weight_decay", 1e-5)
        eta_min = cfg.get("eta_min", 1e-4)
        max_grad_norm = cfg.get("max_grad_norm", 1.0)
        tx = build_optimizer("adamw", learning_rate, train_iters,
                             weight_decay=weight_decay, eta_min=eta_min,
                             max_grad_norm=max_grad_norm,
                             lr_mult_fn=_lr_mult)
        opt_state = tx.init(params)

        # Regularizer config (reference: run.py:1748-1781).
        use_tv_disp = cfg.get("use_tv_displacement", True)
        tv_disp_weight = cfg.get("tv_displacement_weight", 0.001)
        tv_loss_weight = cfg.get("tv_loss_weight", 1e-5)
        deformation_reg_weight = cfg.get("deformation_reg_weight", 0.01)
        use_temporal_smooth = cfg.get("use_temporal_smooth", True)
        temporal_smooth_weight = cfg.get("temporal_smooth_weight", 1e-4)
        temporal_epsilon = cfg.get("temporal_epsilon", 0.02)
        use_random_bg = cfg.get("use_random_bg", False)
        random_bg_start = (cfg.get("random_bg_start", 0)
                           if use_random_bg else 10 ** 9)
        use_unsup = cfg.get("use_unsupervised_consistency", False)
        unsup_weight = cfg.get("unsup_consistency_weight", 0.001)
        use_static_anchor = cfg.get("use_static_anchor", True)
        static_anchor_weight = cfg.get("static_anchor_weight", 0.01)
        grid_warmup_iters = cfg.get("grid_warmup_iters", 256)
        grid_stop_ratio = cfg.get("grid_stop_ratio", 0.9)
        # Reference default: re-prune every 500 steps (run.py:1979).
        prune_every = int(cfg.get("grid_prune_every", 500))
        val_every = cfg.get("val_every", 500)

        data = train_set.ray_data
        H, W, focal = train_set.H, train_set.W, train_set.focal

        # Optional data parallelism over the ray batch (cfg mesh_devices):
        # the full 7-term recipe shards via shard_map inside the builder.
        mesh = None
        mesh_devices = cfg.get("mesh_devices", 1)
        if mesh_devices > 1:
            from ..parallel.mesh import make_mesh
            mesh = make_mesh(mesh_devices)
            print(f">>> data-parallel mesh: {mesh_devices} devices")

        def make_step(capacity, ray_budget=None, n_samples_step=None):
            return make_part4_train_step(
                cfg, field, tx, data, H=H, W=W, focal=focal,
                capacity=capacity, ray_budget=ray_budget,
                n_samples_step=n_samples_step, mesh=mesh)

        step_mask = make_step(None)
        train_ray_budget = cfg.get("train_ray_budget")
        step_compact = (make_step(budget_compact_capacity(
                            cfg, batch_size // (mesh_devices or 1),
                            train_ray_budget),
                            ray_budget=train_ray_budget)
                        if train_ray_budget else make_step(train_capacity))
        # Cheap pre-grid warmup at coarser sampling (see part2_instant).
        warmup_ns = cfg.get("warmup_n_samples")
        step_warm = (make_step(None, n_samples_step=warmup_ns)
                     if warmup_ns and grid_state is not None else step_mask)

        print(">>> Start Training Part 4 (Dual-Hash Dynamic NeRF)...")
        import time as _time
        train_t0 = _time.perf_counter()
        print(tb_logger.banner())

        # Validation renders go through the occupancy-CDF sampler when a
        # grid exists (same as eval): dense 128-sample rendering of the val
        # split costs minutes per pass at reference scale. val_n_samples
        # defaults to 64 — within ~0.2 dB of the dense metric — so
        # best-ckpt selection tracks the reported test PSNR.
        if grid_state is not None:
            val_renderer = ImageRenderer(
                field.blended_field, near=near, far=far,
                n_samples=(val_ns := int(cfg.get("val_n_samples", 64))),
                # rays/chunk scales inversely with the sample count so the
                # per-chunk point working set stays ~2.1M (k=64 at 65536
                # rays compiled to 17.9 GB > HBM on the live hash field)
                chunk=min(chunk, max(4096, (65536 * 32 // val_ns)
                                     // 4096 * 4096)),
                grid_spec=grid_spec,
                sampling="cdf", blend=field.blend_params)
        else:
            val_renderer = ImageRenderer(field.blended_field, near=near,
                                         far=far,
                                         n_samples=render_n_samples,
                                         chunk=chunk, grid_spec=grid_spec,
                                         blend=field.blend_params)
        best_val_psnr = 0.0
        rng = key
        timer = StepTimer(batch_size)
        trace = TraceCapture(cfg)
        # Grid-update times: the reference unions density over
        # {1/6, 1/2, 5/6} — NOT the tri-grid interpolation anchors
        # {0, 0.5, 1} (run.py:1976 vs src/core.py:313-315; SURVEY 7.4
        # says follow the code). Segment-interior times catch the mover
        # between anchors, where endpoint-only unions leave occupancy
        # holes that render as noise at intermediate times.
        # `grid_update_times: N` opts into a denser linspace union for
        # fast-moving scenes (the reference's own part3 sweeps 16/8
        # times, run.py:1202-1220).
        n_ut = cfg.get("grid_update_times")
        anchor_times = (jnp.linspace(0.0, 1.0, int(n_ut)) if n_ut
                        else jnp.asarray([1.0 / 6.0, 0.5, 5.0 / 6.0]))
        dummy_binary = (grid_state["binary"] if grid_state is not None
                        else jnp.ones((1, 1, 1), jnp.bool_))

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
                best_val_psnr = st["best_val"]
                start_step = st["step"]
                wall_prev = st.get("wall", 0.0)
                if grid_state is not None and st.get("grid") is not None:
                    grid_state = jax.tree.map(jnp.asarray, st["grid"])
                    active_ratio = float(st.get("active_ratio", 1.0))
                print(f">>> resumed train state at step {start_step} "
                      f"(best val {best_val_psnr:.2f} dB, "
                      f"{wall_prev:.0f}s accumulated)")

        for step in range(start_step + 1, train_iters + 1):
            trace.step(step)
            rng, srng = jax.random.split(rng)
            use_grid = grid_state is not None and step > grid_warmup_iters
            compact = use_grid and active_ratio < switch_ratio
            if grid_state is not None and not use_grid:
                fn = step_warm
            elif compact:
                fn = step_compact
            else:
                fn = step_mask
            binary = grid_state["binary"] if grid_state is not None \
                else dummy_binary
            params, opt_state, total, aux = fn(
                params, opt_state, srng, jnp.int32(step), binary,
                use_grid=use_grid)

            if (grid_state is not None
                    and step < train_iters * grid_stop_ratio):
                interval = staged_interval(step, train_iters, (16, 64, 256))
                if should_update(step, interval, grid_warmup_iters):
                    # Periodic re-prune (reference intent: run.py:1979-1984
                    # "avoid skip-rate collapse"): rebuild from the current
                    # field instead of union-ing with permanent memory.
                    # Without it the r3 at-scale run sat at 99% active for
                    # all 5k steps while its trained field separates to 16%
                    # (density_grid.py docstring) — no skipping, flat CDF
                    # placement. grid_prune_every: 0 opts out.
                    prune = bool(prune_every
                                 and step % prune_every < interval
                                 and step > grid_warmup_iters)
                    grid_state, ar = grid_update(params, grid_state,
                                                 anchor_times, 1.0,
                                                 jnp.asarray(prune))
                    active_ratio = float(ar)

            if step % log_every == 0:
                (l_rgb, l_reg, l_tvd, l_tvc, l_temp, l_unsup,
                 l_anchor) = [float(a) for a in aux]
                psnr = compute_psnr(l_rgb)
                lr_now = current_lr(learning_rate, step, train_iters, eta_min)
                skip = (f" | Skip: {(1-active_ratio)*100:.1f}%"
                        if grid_state is not None else "")
                print(f">>> Step {step}/{train_iters} | "
                      f"Loss {float(total):.6f} | PSNR {psnr:.2f} dB | "
                      f"LR {lr_now:.6f}{skip}")
                tb_logger.log_scalar("Train/RGB_Loss", l_rgb, step)
                tb_logger.log_scalar("Train/Reg_Loss", l_reg, step)
                tb_logger.log_scalar("Train/Total_Loss", float(total), step)
                tb_logger.log_scalar("Train/PSNR", psnr, step)
                tb_logger.log_scalar("Train/LearningRate", lr_now, step)
                sps, rps = timer.rate(step)
                tb_logger.log_scalar("Train/StepsPerSec", sps, step)
                tb_logger.log_scalar("Train/RaysPerSec", rps, step)
                if use_tv_disp:
                    tb_logger.log_scalar("Train/TV_Displacement_Loss",
                                         l_tvd, step)
                if tv_loss_weight > 0:
                    tb_logger.log_scalar("Train/TV_Canon_Loss", l_tvc, step)
                if use_temporal_smooth:
                    tb_logger.log_scalar("Train/Temporal_Loss", l_temp, step)
                if use_unsup:
                    tb_logger.log_scalar("Train/Unsup_Loss", l_unsup, step)
                if use_static_anchor:
                    tb_logger.log_scalar("Train/Anchor_Loss", l_anchor, step)
                if grid_state is not None:
                    tb_logger.log_scalar("Train/ActiveRatio", active_ratio,
                                         step)

            if step % val_every == 0:
                n_save = min(5, len(val_set))
                save_idx = set(py_rng.sample(range(len(val_set)), n_save))
                step_val_dir = os.path.join(val_render_dir,
                                            f"step_{step:06d}")
                os.makedirs(step_val_dir, exist_ok=True)
                binary = grid_state["binary"] if grid_state is not None \
                    else None

                def name_fn(i, p, t):
                    return f"val_{i:03d}_t{t:.2f}_psnr{p:.2f}.png"
                avg_saved, _ = evaluate_split(
                    field, params, val_set, val_renderer,
                    grid_binary=binary, bg_color=fixed_bg,
                    indices=sorted(save_idx), save_dir=step_val_dir,
                    name_fn=name_fn)
                rest = [i for i in range(len(val_set)) if i not in save_idx]
                avg_val = avg_saved
                if rest:
                    avg_rest, _ = evaluate_split(
                        field, params, val_set, val_renderer,
                        grid_binary=binary, bg_color=fixed_bg, indices=rest)
                    avg_val = (avg_saved * n_save + avg_rest * len(rest)) \
                        / (n_save + len(rest))
                print(f"    [Validation] PSNR: {avg_val:.2f} dB", end="")
                tb_logger.log_scalar("Validation/PSNR", avg_val, step)
                if avg_val > best_val_psnr:
                    best_val_psnr = avg_val
                    save_checkpoint(os.path.join(log_dir, "best_model.pth"),
                                    params, cfg, step=step,
                                    val_psnr=best_val_psnr,
                                    density_grid=grid_state)
                    print(" | new best model saved")
                else:
                    print()
                save_train_state(
                    resume_path, params, opt_state, step, best_val_psnr,
                    rng, wall_prev + (_time.perf_counter() - train_t0),
                    extra={"grid": grid_state,
                           "active_ratio": active_ratio})

        wall = wall_prev + (_time.perf_counter() - train_t0)
        print(f"\n>>> training done; best val PSNR: {best_val_psnr:.2f} dB"
              f" | training wall-clock {int(wall // 60)}:{wall % 60:04.1f}"
              f" ({train_iters} steps incl. val/grid updates)")
        trace.close()
        tb_logger.close()

    # ------------------------------------------------------------- eval
    binary = grid_state["binary"] if grid_state is not None else None
    if args.eval_only:
        # Test-set PSNR pass (reference: run.py:2121-2160).
        # The reported test metric renders dense masked — the reference's
        # estimator (reference: src/renderer.py:303-343, run.py:2121-2160);
        # budgeted CDF rendering underreports by ~1 dB at k=32
        # (AB_RESULTS.md). eval_ray_budget explicitly opts into the fast
        # estimator; render_ray_budget still governs the orbit video.
        eval_capacity = None
        eval_budget = cfg.get("eval_ray_budget")
        if binary is not None and eval_budget is None \
                and active_ratio < switch_ratio:
            eval_capacity = max(4096, int(chunk * render_n_samples
                                          * cap_frac) // 1024 * 1024)
        if binary is not None and eval_budget is not None:
            renderer = ImageRenderer(field.blended_field, near=near,
                                     far=far, blend=field.blend_params,
                                     n_samples=eval_budget,
                                     chunk=min(chunk, 65536),
                                     grid_spec=grid_spec, sampling="cdf",
                                     max_level=cfg.get("render_max_level"))
        else:
            renderer = ImageRenderer(
                field.blended_field, near=near, far=far,
                blend=field.blend_params, n_samples=render_n_samples,
                chunk=min(chunk, max(1024, (16384 * 128
                                            // render_n_samples)
                                     // 1024 * 1024)),
                grid_spec=grid_spec, capacity=eval_capacity)
        avg_psnr, psnrs = evaluate_split(field, params, test_set, renderer,
                                         grid_binary=binary,
                                         bg_color=fixed_bg)
        print("=" * 60)
        print(f">>> Part 4 test PSNR: {avg_psnr:.2f} dB "
              f"({len(psnrs)} images)")
        print("=" * 60)
        # Orbit video / frame renders (reference: run.py:2167-2331).
        _part3_eval(cfg, args, field, params, grid_state, grid_spec,
                    active_ratio, test_set, test_split, log_dir, render_dir,
                    near, far, render_n_samples, chunk, fixed_bg, render_n,
                    cap_frac, switch_ratio, video_suffix="_part4")
    else:
        print("\n>>> training done! use --eval_only --render_n -1 to "
              "generate the orbit video")
