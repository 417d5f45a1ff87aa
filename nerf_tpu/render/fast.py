"""Frame-batched fast rendering: the production video/benchmark path.

The reference's render benchmark is a pose-sequence render loop — one
Python-level render call per frame (reference: run.py:736-813, 1367-1474).
On this TPU setup every dispatched program pays a measured ~50-60 ms of
host/tunnel latency on top of its compute, so a per-frame call structure
caps throughput at ~16 FPS before any rendering happens. This module
renders a WHOLE pose sequence as one jitted program (`lax.map` over
frames), amortizing the dispatch cost across the sequence, and adds two
per-frame optimizations the chunked eval path does not have:

  * rays are synthesized in-graph from the pose (a [H*W, 3] matmul) —
    no per-frame host->device ray upload;
  * occupied-ray compaction: the block-coarse probe already tells which
    pixels see any occupied space; a counting-sort permutation moves those
    rays to a fixed-capacity prefix, the field runs only on them, and the
    result scatters back over a background-filled image. On object-centric
    scenes 40-60% of pixels are pure background, so every per-sample cost
    (gathers, MLPs, compositing) drops by that fraction. Overflow beyond
    the static capacity renders as background: pick `capacity_frac` from a
    probe of the actual scene (see `measure_occupied_fraction`) with
    margin, or leave None to disable compaction.

Sampling is the two-pass hierarchical scheme (renderer.render_rays_hier)
by default: k_coarse occupancy-CDF samples localize the surface with real
field evaluations, k_fine weight-resampled samples refine it.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp

from .density_grid import DensityGridSpec
from .intervals import image_occupancy_cdf
from .rays import camera_directions, rays_from_pose
from .renderer import _compact_indices, render_image


def measure_occupied_fraction(grid_binary, grid_spec: DensityGridSpec,
                              poses, *, H: int, W: int, focal: float,
                              near: float, far: float, block: int = 8,
                              n_probe: int = 96, dilate: int = 1) -> float:
    """Max fraction of rays whose probe sees occupied space, over poses.

    Runs the same probe the renderer uses, so `capacity_frac` chosen as
    this value (plus margin) guarantees no compaction overflow for these
    poses.
    """
    dirs = camera_directions(H, W, focal)

    @jax.jit
    def frac(pose):
        ro, rd = rays_from_pose(dirs, pose)
        _, n_occ, _ = image_occupancy_cdf(
            grid_binary, grid_spec, ro, rd, near, far, 1,
            block=block, n_probe=n_probe, dilate=dilate)
        return jnp.mean((n_occ > 0).astype(jnp.float32))

    return max(float(frac(jnp.asarray(p))) for p in poses)


class FrameRenderer:
    """Jit-compiled pose-sequence renderer (see module docstring).

    Args:
      field: Field to render (live or baked).
      H/W/focal: image geometry; rays are built in-graph per pose.
      k_coarse/k_fine: hierarchical sample budget; k_fine=0 falls back to
        flat occupancy-CDF sampling.
      capacity_frac: static occupied-ray capacity as a fraction of H*W
        (None disables compaction).
      probe_block/n_probe/dilate: probe-pass geometry (intervals.py).
      fine_mask: per-sample occupancy zeroing (off for baked fields).
      blend: optional params specialization per frame time (part4 tri-grid
        table blending): blend(params, t) -> params'.
    """

    def __init__(self, field, *, H: int, W: int, focal: float,
                 near: float, far: float, k_coarse: int, k_fine: int = 0,
                 chunk: int = 65536, grid_spec: DensityGridSpec = None,
                 probe_block: int = 8, n_probe: int = 96, dilate: int = 1,
                 capacity_frac: Optional[float] = None,
                 fine_mask: bool = False,
                 max_level: Optional[int] = None,
                 blend=None,
                 bg_color=None,
                 frame_loop: str = "python",
                 hier_coarse: str = "auto"):
        self.field = field
        # "auto": march the field's cheap sigma estimate in the coarse
        # pass when it has one (baked fields) — the production fast path.
        if hier_coarse == "auto":
            hier_coarse = ("sigma" if getattr(field, "sigma_at", None)
                           is not None and k_fine > 0 else "field")
        n_rays = H * W
        if capacity_frac is not None:
            capacity = min(n_rays, -(-int(n_rays * capacity_frac) // chunk)
                           * chunk)
        else:
            capacity = None
        bg = (jnp.ones((3,), jnp.float32) if bg_color is None
              else jnp.asarray(bg_color, jnp.float32))
        dirs = camera_directions(H, W, focal)

        def one_frame(params, grid_binary, pose, t):
            if blend is not None and t is not None:
                params = blend(params, t)
            ro, rd = rays_from_pose(dirs, pose)
            idx, n_occ, occ_far = image_occupancy_cdf(
                grid_binary, grid_spec, ro, rd, near, far, k_coarse,
                block=probe_block, n_probe=n_probe, dilate=dilate)
            ro_f = ro.reshape(n_rays, 3)
            rd_f = rd.reshape(n_rays, 3)
            idx_f = idx.reshape(n_rays, k_coarse)
            nocc_f = n_occ.reshape(n_rays)
            far_f = occ_far.reshape(n_rays)

            def render(ro_r, rd_r, idx_r, nocc_r, far_r):
                return render_image(
                    field, params, ro_r, rd_r, near=near, far=far,
                    n_samples=k_coarse, chunk=chunk, time_scalar=t,
                    grid_binary=grid_binary if fine_mask else None,
                    grid_spec=grid_spec, bg_color=bg,
                    cdf=(idx_r, nocc_r, far_r), n_probe=n_probe,
                    k_fine=k_fine, max_level=max_level,
                    hier_coarse=hier_coarse)

            if capacity is None:
                rgb = render(ro_f, rd_f, idx_f, nocc_f, far_f)
                return rgb.reshape(H, W, 3)

            # Occupied-ray compaction: inactive rays taken into the
            # prefix render as background anyway (n_occ = 0), so the
            # scatter needs no validity masking; untaken rays keep the
            # prefilled background.
            take, _ = _compact_indices(nocc_f > 0, capacity)
            rgb_c = render(jnp.take(ro_f, take, axis=0),
                           jnp.take(rd_f, take, axis=0),
                           jnp.take(idx_f, take, axis=0),
                           jnp.take(nocc_f, take, axis=0),
                           jnp.take(far_f, take, axis=0))
            img = jnp.broadcast_to(bg[None, :], (n_rays, 3))
            img = img.at[take].set(rgb_c)
            return img.reshape(H, W, 3)

        needs_time = field.needs_time or blend is not None

        @jax.jit
        def render_frames(params, poses, times, grid_binary):
            def body(args):
                pose, t = args
                return one_frame(params, grid_binary, pose,
                                 t if needs_time else None)
            return jax.lax.map(body, (poses, times))

        @jax.jit
        def render_one(params, pose, t, grid_binary):
            return one_frame(params, grid_binary, pose,
                             t if needs_time else None)

        self._render_frames = render_frames
        self._render_one = render_one
        # "scan": the whole sequence is one program (one dispatch+sync per
        # call; larger compile). "python": one compiled single-frame
        # program dispatched per pose — dispatches pipeline (~1 ms each),
        # the sync cost is still paid once by the caller's digest, and the
        # compile stays frame-sized (the remote TPU compiler has scaled
        # badly on giant lax.map graphs).
        self.frame_loop = frame_loop

    def __call__(self, params, poses, *, times=None, grid_binary=None):
        """Render poses [F, 4, 4] (+ optional times [F]) -> [F, H, W, 3]."""
        poses = jnp.asarray(poses, jnp.float32)
        f = poses.shape[0]
        if times is None:
            times = jnp.zeros((f,), jnp.float32)
        else:
            times = jnp.asarray(times, jnp.float32).reshape(f)
        if self.frame_loop == "python":
            return jnp.stack([
                self._render_one(params, poses[i], times[i], grid_binary)
                for i in range(f)])
        return self._render_frames(params, poses, times, grid_binary)
