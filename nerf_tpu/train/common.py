"""Shared training-loop machinery: jitted image renderer, eval helpers."""

from __future__ import annotations

import os
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..render.renderer import render_image
from ..utils.metrics import compute_psnr


def save_png(path: str, img: np.ndarray):
    import matplotlib.pyplot as plt
    plt.imsave(path, np.clip(img, 0.0, 1.0))


def composite_target(target_rgba: jnp.ndarray, bg_color: jnp.ndarray):
    """target = rgb * alpha + bg * (1 - alpha) (reference: run.py:593-594)."""
    rgb, alpha = target_rgba[:, :3], target_rgba[:, 3:4]
    return rgb * alpha + bg_color[None, :] * (1.0 - alpha)


def budget_compact_capacity(cfg: dict, local_batch: int,
                            ray_budget: int):
    """Static compaction capacity for the budget training step.

    Of the `local_batch * ray_budget` budget slots only the truly occupied
    samples reach the field (measured ~22% at steady state on the Lego
    proxy); `budget_capacity_fraction` bounds the static counting-sort
    capacity the field actually evaluates. The hash gather + backward
    scatter-add are the dominant per-step cost on v5e (descriptor-rate-
    bound), so halving the evaluated points nearly halves the step.

    Compaction is strictly OPT-IN: valid slots beyond the capacity are
    silently treated as empty space, which biases gradients if a scene's
    post-skip occupancy ever exceeds the capacity — so an absent config
    key means no compaction (the ~22% measurement is one static proxy;
    dynamic scenes union occupancy over time). Set the fraction to 0 or
    >= 1 to disable explicitly.
    """
    if "budget_capacity_fraction" not in cfg:
        return None
    frac = float(cfg["budget_capacity_fraction"])
    if not (0.0 < frac < 1.0):
        return None
    return max(4096, int(local_batch * ray_budget * frac) // 1024 * 1024)


class ImageRenderer:
    """Jit-compiled full-image renderer with fixed chunking.

    One compilation per (shape, grid-presence) signature; time is threaded as
    a traced scalar so per-frame renders reuse the compiled program.

    `sampling="interval"` (requires a grid) switches to the fast eval path:
    per-ray occupied intervals from a block-coarse probe of the dilated
    occupancy grid, with the sample budget distributed inside the interval
    (render/intervals.py). `sampling="cdf"` places the budget at the
    quantiles of the per-ray occupied-bin CDF instead — no samples in gaps
    between objects (measured 2-6 dB better than "interval" at k<=32 on
    multi-object scenes). `max_level` limits hash-encode levels at render
    time (LOD).
    """

    def __init__(self, field, *, near: float, far: float, n_samples: int,
                 chunk: int, grid_spec=None, capacity: Optional[int] = None,
                 ray_budget: Optional[int] = None,
                 sampling: str = "dense",
                 fine_samples: int = 0,
                 hier_coarse: str = "field",
                 interval_block: int = 4, interval_probes: int = 128,
                 interval_dilate: int = 1,
                 fine_mask: bool = True,
                 max_level: Optional[int] = None,
                 blend: Optional[callable] = None,
                 mesh=None, mesh_axis: str = "data",
                 experimental: bool = False):
        self.field = field
        self.grid_spec = grid_spec
        # Per-frame parameter specialization (part4 tri-grid blending):
        # blend(params, t) -> params' is applied before rendering, so pass
        # `field.blended_field` as the field together with
        # `field.blend_params` as blend.
        self._blend = blend
        if sampling not in ("dense", "interval", "cdf", "importance"):
            raise ValueError(f"unknown sampling mode: {sampling}")
        if sampling == "importance" and not experimental:
            # Measured 4-6 dB WORSE than the occupancy CDF at equal budget
            # (AB_RESULTS.md); a config typo must not silently ship it.
            raise ValueError(
                "sampling='importance' is experimental (loses 4-6 dB vs "
                "'cdf' at equal budget, see AB_RESULTS.md); pass "
                "experimental=True to use it anyway")
        self.sampling = sampling
        # Multi-chip eval: rays shard over the mesh (the embarrassingly
        # parallel axis), params/grid replicated, no collectives — each
        # chip renders its slice and the result is already sharded-correct.
        self._mesh = mesh
        self._n_dev = mesh.shape[mesh_axis] if mesh is not None else 1

        def _shard_rays(fn, n_ray_args):
            """Wrap `fn(params, *ray_args, *rest)` to shard ray args on
            axis 0 across the mesh (callers pre-pad to a multiple)."""
            if mesh is None:
                return fn
            from jax.sharding import PartitionSpec as P
            ray_spec = P(mesh_axis)
            def wrapped(params, *args):
                in_specs = (P(),) + (ray_spec,) * n_ray_args \
                    + (P(),) * (len(args) - n_ray_args)
                return jax.shard_map(
                    fn, mesh=mesh, in_specs=in_specs,
                    out_specs=ray_spec, check_vma=False)(params, *args)
            return wrapped

        def _render_flat(params, rays_o, rays_d, time_scalar, grid_binary,
                         bg):
            return render_image(
                field, params, rays_o, rays_d,
                near=near, far=far, n_samples=n_samples, chunk=chunk,
                time_scalar=time_scalar, grid_binary=grid_binary,
                grid_spec=grid_spec, bg_color=bg, capacity=capacity,
                ray_budget=ray_budget, max_level=max_level)

        def _render_flat_iv(params, rays_o, rays_d, t0, t1, time_scalar,
                            grid_binary, bg):
            # fine_mask=False skips the per-sample occupancy lookup — for
            # baked fields, whose bake already folds pruning into sigma.
            return render_image(
                field, params, rays_o, rays_d,
                near=near, far=far, n_samples=n_samples, chunk=chunk,
                time_scalar=time_scalar,
                grid_binary=grid_binary if fine_mask else None,
                grid_spec=grid_spec, bg_color=bg,
                t0=t0, t1=t1, max_level=max_level)

        def _render_flat_cdf(params, rays_o, rays_d, idx, n_occ, occ_far,
                             time_scalar, grid_binary, bg):
            return render_image(
                field, params, rays_o, rays_d,
                near=near, far=far, n_samples=n_samples, chunk=chunk,
                time_scalar=time_scalar,
                grid_binary=grid_binary if fine_mask else None,
                grid_spec=grid_spec, bg_color=bg,
                cdf=(idx, n_occ, occ_far), n_probe=interval_probes,
                k_fine=fine_samples, max_level=max_level,
                hier_coarse=hier_coarse)

        def _render_flat_z(params, rays_o, rays_d, z, valid, occ_far,
                           time_scalar, grid_binary, bg):
            return render_image(
                field, params, rays_o, rays_d,
                near=near, far=far, n_samples=n_samples, chunk=chunk,
                time_scalar=time_scalar,
                grid_binary=grid_binary if fine_mask else None,
                grid_spec=grid_spec, bg_color=bg,
                zs=(z, valid, occ_far), n_probe=interval_probes,
                max_level=max_level)

        sharded_flat = _shard_rays(_render_flat, 2)
        sharded_flat_iv = _shard_rays(_render_flat_iv, 4)
        sharded_flat_cdf = _shard_rays(_render_flat_cdf, 5)
        sharded_flat_z = _shard_rays(_render_flat_z, 5)
        pad_to = self._n_dev * chunk if mesh is not None else chunk

        @partial(jax.jit, static_argnames=())
        def _render(params, rays_o, rays_d, time_scalar, grid_binary, bg):
            n = rays_o.shape[0]
            pad = -n % pad_to
            ro = jnp.pad(rays_o, ((0, pad), (0, 0)))
            rd = jnp.pad(rays_d, ((0, pad), (0, 0)), constant_values=1.0)
            rgb = sharded_flat(params, ro, rd, time_scalar, grid_binary, bg)
            return rgb[:n]

        @partial(jax.jit, static_argnames=())
        def _render_interval(params, rays_o_img, rays_d_img, time_scalar,
                             grid_binary, bg):
            from ..render.intervals import image_intervals
            # Interval maps are computed replicated (block-coarse: cheap);
            # only the per-ray rendering shards.
            t0, t1 = image_intervals(
                grid_binary, grid_spec, rays_o_img, rays_d_img, near, far,
                block=interval_block, n_probe=interval_probes,
                dilate=interval_dilate)
            n = rays_o_img.shape[0] * rays_o_img.shape[1]
            pad = -n % pad_to
            ro = jnp.pad(rays_o_img.reshape(-1, 3), ((0, pad), (0, 0)))
            rd = jnp.pad(rays_d_img.reshape(-1, 3), ((0, pad), (0, 0)),
                         constant_values=1.0)
            t0p = jnp.pad(t0.reshape(-1), (0, pad))
            t1p = jnp.pad(t1.reshape(-1), (0, pad))
            rgb = sharded_flat_iv(params, ro, rd, t0p, t1p, time_scalar,
                                  grid_binary, bg)
            return rgb[:n]

        @partial(jax.jit, static_argnames=())
        def _render_cdf(params, rays_o_img, rays_d_img, time_scalar,
                        grid_binary, bg):
            from ..render.intervals import image_occupancy_cdf
            idx, n_occ, occ_far = image_occupancy_cdf(
                grid_binary, grid_spec, rays_o_img, rays_d_img, near, far,
                n_samples, block=interval_block, n_probe=interval_probes,
                dilate=interval_dilate)
            n = rays_o_img.shape[0] * rays_o_img.shape[1]
            pad = -n % pad_to
            ro = jnp.pad(rays_o_img.reshape(-1, 3), ((0, pad), (0, 0)))
            rd = jnp.pad(rays_d_img.reshape(-1, 3), ((0, pad), (0, 0)),
                         constant_values=1.0)
            idxp = jnp.pad(idx.reshape(-1, n_samples), ((0, pad), (0, 0)))
            noccp = jnp.pad(n_occ.reshape(-1), (0, pad))
            farp = jnp.pad(occ_far.reshape(-1), (0, pad))
            rgb = sharded_flat_cdf(params, ro, rd, idxp, noccp, farp,
                                   time_scalar, grid_binary, bg)
            return rgb[:n]

        @partial(jax.jit, static_argnames=())
        def _render_importance(params, rays_o_img, rays_d_img, time_scalar,
                               grid_binary, grid_density, bg):
            from ..render.intervals import image_importance_cdf
            z, valid, occ_far = image_importance_cdf(
                grid_binary, grid_density, grid_spec, rays_o_img,
                rays_d_img, near, far, n_samples, block=interval_block,
                n_probe=interval_probes, dilate=interval_dilate)
            n = rays_o_img.shape[0] * rays_o_img.shape[1]
            pad = -n % pad_to
            ro = jnp.pad(rays_o_img.reshape(-1, 3), ((0, pad), (0, 0)))
            rd = jnp.pad(rays_d_img.reshape(-1, 3), ((0, pad), (0, 0)),
                         constant_values=1.0)
            zp = jnp.pad(z.reshape(-1, n_samples), ((0, pad), (0, 0)))
            vp = jnp.pad(valid.reshape(-1), (0, pad))
            fp = jnp.pad(occ_far.reshape(-1), (0, pad))
            rgb = sharded_flat_z(params, ro, rd, zp, vp, fp,
                                 time_scalar, grid_binary, bg)
            return rgb[:n]

        self._render = _render
        self._render_interval = _render_interval
        self._render_cdf = _render_cdf
        self._render_importance = _render_importance

    def __call__(self, params, rays_o, rays_d, *, time=None,
                 grid_binary=None, grid_density=None,
                 bg_color=None) -> jnp.ndarray:
        h_w = rays_o.shape[:-1]
        t = None if not self.field.needs_time else jnp.float32(
            0.0 if time is None else time)
        if self._blend is not None and t is not None:
            params = self._blend(params, t)
        bg = jnp.ones((3,), jnp.float32) if bg_color is None \
            else jnp.asarray(bg_color, jnp.float32)
        if self.sampling != "dense" and grid_binary is None:
            # Sparse modes need the occupancy grid; falling back silently
            # to dense stratified rendering with the (small) sparse budget
            # would produce badly undersampled images.
            raise ValueError(
                f"sampling='{self.sampling}' requires grid_binary; render "
                f"with the dense mode or pass the occupancy grid")
        if self.sampling == "importance" and grid_density is None:
            raise ValueError(
                "sampling='importance' requires grid_density (the density "
                "grid's values, not just the binary mask)")
        if (self.sampling == "importance" and grid_binary is not None
                and grid_density is not None and len(h_w) == 2):
            rgb = self._render_importance(params, rays_o, rays_d, t,
                                          grid_binary, grid_density, bg)
        elif (self.sampling == "cdf" and grid_binary is not None
                and len(h_w) == 2):
            rgb = self._render_cdf(params, rays_o, rays_d, t,
                                   grid_binary, bg)
        elif (self.sampling == "interval" and grid_binary is not None
                and len(h_w) == 2):
            rgb = self._render_interval(params, rays_o, rays_d, t,
                                        grid_binary, bg)
        else:
            rgb = self._render(params, rays_o.reshape(-1, 3),
                               rays_d.reshape(-1, 3), t, grid_binary, bg)
        return rgb.reshape(*h_w, 3)

    def eval_split_mses(self, dataset, params, idxs, *, grid_binary=None,
                        bg_color=None, frame_batch: int = 8):
        """Per-image eval MSEs with FRAME-BATCHED dispatch.

        The per-image eval loop pays one tunneled dispatch round-trip per
        image (~50-100 ms host-side on this link); at 200 test images
        that is minutes of wall-clock that inflates every gate
        measurement. This path renders `frame_batch` frames inside ONE
        dispatched program (lax.map over the identical per-frame render —
        same sampler, same chunking, so the metric is unchanged) and
        computes the MSEs in-graph against the dataset's device-resident
        uint8 image stack. Returns a list of per-image MSE scalars
        (device arrays — sync once at the end, not per image).

        Falls back unsupported combinations to None: importance sampling
        (needs grid_density threading) and sharded eval (shard_map inside
        lax.map is not exercised by the recipes).
        """
        if (self.sampling == "importance" or self._mesh is not None
                or not hasattr(dataset, "images")):
            return None
        if self.sampling in ("cdf", "interval") and grid_binary is None:
            # Same contract as __call__ (see the guard there): raising the
            # clear error here beats the obscure trace-time failure it
            # would otherwise become inside lax.map.
            raise ValueError(
                f"sampling='{self.sampling}' requires grid_binary; render "
                f"with the dense mode or pass the occupancy grid")
        import numpy as _np

        needs_time = self.field.needs_time
        scene_scale = float(getattr(dataset, "scene_scale", 1.0))
        key = ("eval_batch", dataset.H, dataset.W, frame_batch,
               scene_scale)
        prog = getattr(self, "_eval_batch_progs", None)
        if prog is None:
            prog = self._eval_batch_progs = {}
        if key not in prog:
            from ..render.rays import rays_from_pose

            def one(params, directions, pose, t, img_u8, grid_binary, bg,
                    bg_target):
                p = params
                tt = jnp.float32(t) if needs_time else None
                if self._blend is not None and tt is not None:
                    p = self._blend(p, tt)
                rays_o, rays_d = rays_from_pose(directions, pose,
                                                scene_scale)
                if self.sampling == "cdf":
                    rgb = self._render_cdf(p, rays_o, rays_d, tt,
                                           grid_binary, bg)
                elif self.sampling == "interval":
                    rgb = self._render_interval(p, rays_o, rays_d, tt,
                                                grid_binary, bg)
                else:
                    rgb = self._render(p, rays_o.reshape(-1, 3),
                                       rays_d.reshape(-1, 3), tt,
                                       grid_binary, bg)
                rgb = jnp.clip(rgb.reshape(rays_o.shape[:-1] + (3,)),
                               0.0, 1.0)
                rgba = img_u8.astype(jnp.float32) * (1.0 / 255.0) \
                    if img_u8.dtype == jnp.uint8 \
                    else img_u8.astype(jnp.float32)
                tgt = rgba[..., :3] * rgba[..., 3:4] \
                    + bg_target * (1.0 - rgba[..., 3:4])
                return jnp.mean((rgb - tgt) ** 2)

            @jax.jit
            def batch(params, directions, poses, times, images,
                      grid_binary, bg, bg_target):
                def body(args):
                    pose, t, img = args
                    return one(params, directions, pose, t, img,
                               grid_binary, bg, bg_target)
                return jax.lax.map(body, (poses, times, images))

            prog[key] = batch

        batch = prog[key]
        bg = jnp.ones((3,), jnp.float32) if bg_color is None \
            else jnp.asarray(bg_color, jnp.float32)
        bg_target = jnp.float32(1.0 if dataset.white_bkgd else 0.0)
        idxs = list(idxs)
        mses = []
        for lo in range(0, len(idxs), frame_batch):
            group = idxs[lo:lo + frame_batch]
            pad = frame_batch - len(group)
            gidx = jnp.asarray(_np.asarray(group + group[-1:] * pad,
                                           _np.int32))
            times = (dataset.times[gidx] if needs_time
                     and dataset.times is not None
                     else jnp.zeros((frame_batch,), jnp.float32))
            out = batch(params, dataset.directions, dataset.poses[gidx],
                        times, dataset.images[gidx], grid_binary, bg,
                        bg_target)
            mses.extend(out[i] for i in range(len(group)))
        return mses


def evaluate_split(field, params, dataset, renderer: ImageRenderer, *,
                   grid_binary=None, grid_density=None, bg_color=None,
                   indices=None,
                   save_dir: Optional[str] = None, name_fn=None):
    """Render a dataset split and return (avg_psnr, per_image_psnrs).

    Mirrors the reference's chunked eval loops with best-effort parity of
    outputs: clamped predictions, PSNR vs the pre-composited target
    (reference: run.py:365-393, 863-895, 2121-2160).
    """
    idxs = range(len(dataset)) if indices is None else indices
    # Without save_dir the per-image MSE stays on device and the host
    # loop never syncs, so consecutive image renders pipeline on the
    # chip (dispatches overlap compute; only syncs serialize). One
    # digest sync at the end retrieves every PSNR.
    defer = save_dir is None
    if defer and grid_density is None and len(idxs := list(idxs)) > 1:
        # Metric-only evals batch multiple frames per dispatched program
        # (identical per-frame math, so the metric is unchanged); the
        # per-image fallback below covers the unsupported combinations.
        batched = renderer.eval_split_mses(
            dataset, params, idxs, grid_binary=grid_binary,
            bg_color=bg_color)
        if batched is not None:
            psnrs = [compute_psnr(float(m))
                     for m in np.asarray(jnp.stack(batched))]
            return (float(np.mean(psnrs)) if psnrs else 0.0), psnrs
    psnrs = []
    mses = []
    for i in idxs:
        out = dataset.get_image_rays(i)
        if dataset.has_time:
            rays_o, rays_d, target, t = out
        else:
            rays_o, rays_d, target = out
            t = None
        pred = renderer(params, rays_o, rays_d, time=t,
                        grid_binary=grid_binary, grid_density=grid_density,
                        bg_color=bg_color)
        pred = jnp.clip(pred, 0.0, 1.0)
        if defer:
            mses.append(jnp.mean((pred - target) ** 2))
            continue
        p = compute_psnr(float(jnp.mean((pred - target) ** 2)))
        psnrs.append(p)
        fname = name_fn(i, p, t) if name_fn else f"render_{i:03d}.png"
        save_png(os.path.join(save_dir, fname), np.asarray(pred))
    if defer and mses:
        psnrs = [compute_psnr(float(m)) for m in np.asarray(jnp.stack(mses))]
    avg = float(np.mean(psnrs)) if psnrs else 0.0
    return avg, psnrs


def make_video(picture_dir: str, video_path: str, framerate: int = 24,
               cleanup: bool = True) -> bool:
    """Mux frame_%03d.png into a video (reference: run.py:786-813).

    Tries ffmpeg (H.264 mp4) first; without ffmpeg falls back to the
    dependency-free MJPEG-AVI muxer (utils/video.py) so the video
    deliverable always exists. Returns success.
    """
    import shutil
    import subprocess
    cmd = ["ffmpeg", "-y", "-framerate", str(framerate),
           "-i", os.path.join(picture_dir, "frame_%03d.png"),
           "-c:v", "libx264", "-pix_fmt", "yuv420p", "-crf", "18",
           video_path]
    try:
        result = subprocess.run(cmd, capture_output=True, text=True)
        if result.returncode == 0:
            print(f">>> video saved: {video_path}")
            if cleanup:
                shutil.rmtree(picture_dir)
            return True
        print(f"!!! ffmpeg failed:\n{result.stderr[-500:]}")
    except FileNotFoundError:
        pass
    except Exception as e:  # noqa: BLE001
        print(f"!!! video generation failed: {e}")
    try:
        from ..utils.video import mux_frame_dir
        avi_path = os.path.splitext(video_path)[0] + ".avi"
        mux_frame_dir(picture_dir, avi_path, framerate)
        print(f">>> video saved (built-in MJPEG muxer): {avi_path}")
        if cleanup:
            shutil.rmtree(picture_dir)
        return True
    except Exception as e:  # noqa: BLE001
        print(f"!!! built-in muxer failed ({e}); frames left in "
              + picture_dir)
    return False
