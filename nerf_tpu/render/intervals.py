"""Per-ray occupied-interval computation for fast eval rendering.

The reference renderer reaches its render-speed target by testing every
sample of every ray against the occupancy grid and compacting the survivors
(reference: src/renderer.py:303-343) — cheap per-test on a GPU's scattered
loads. On TPU every such test is a descriptor-rate-bound gather (~2-7 ns), so
testing all H*W*S samples costs more than the surviving field evaluations.

This module replaces the all-samples test with a two-rate scheme that
exploits camera-ray coherence:

  * Rays are probed on a BLOCK-subsampled image grid (one ray per `block` x
    `block` pixel tile), each against a DILATED occupancy volume, giving a
    conservative [t_enter, t_exit] of occupied space per tile at 1/block^2 of
    the gather cost.
  * Per-pixel intervals take the union (min-enter / max-exit) over the 3x3
    neighboring tiles, so a silhouette can move up to a full tile between
    probe rays without being missed; the grid dilation covers sub-voxel
    motion along the ray.

The renderer then distributes its fixed per-ray sample budget INSIDE the
interval — the TPU analog of the reference's empty-space skipping: instead
of culling samples after placing them, it never places samples in free
space. Empty-interval rays keep t_exit <= t_enter and composite to pure
background.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from .density_grid import DensityGridSpec, grid_active_mask

_BIG = 1e9


def dilate_binary(binary: jnp.ndarray, iterations: int = 1) -> jnp.ndarray:
    """26-neighborhood dilation of a [R,R,R] bool occupancy volume.

    One iteration grows the occupied set by one voxel in every direction —
    the conservativeness margin for rays probed up to one tile away.
    """
    if iterations <= 0:
        return binary
    x = binary.astype(jnp.float32)
    for _ in range(iterations):
        x = jax.lax.reduce_window(
            x, -jnp.inf, jax.lax.max,
            window_dimensions=(3, 3, 3), window_strides=(1, 1, 1),
            padding="SAME")
    return x > 0.0


def ray_intervals(binary: jnp.ndarray, spec: DensityGridSpec,
                  rays_o: jnp.ndarray, rays_d: jnp.ndarray,
                  near: float, far: float, n_probe: int
                  ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Conservative occupied [t0, t1] per ray from `n_probe` grid tests.

    Args:
      binary: occupancy volume (pre-dilated for conservativeness).
      rays_o/rays_d: [R, 3].
    Returns (t0 [R], t1 [R]) fp32, padded one probe step outward and clipped
    to [near, far]; rays hitting nothing return t1 <= t0.
    """
    n_rays = rays_o.shape[0]
    t = jnp.linspace(0.0, 1.0, n_probe, dtype=jnp.float32)
    z = near * (1.0 - t) + far * t                       # [P]
    dz = (far - near) / (n_probe - 1)
    pts = rays_o[:, None, :] + rays_d[:, None, :] * z[None, :, None]
    m = grid_active_mask(binary, pts.reshape(-1, 3), spec) \
        .reshape(n_rays, n_probe)
    zb = jnp.broadcast_to(z[None, :], (n_rays, n_probe))
    t0 = jnp.min(jnp.where(m, zb, _BIG), axis=1) - dz
    t1 = jnp.max(jnp.where(m, zb, -_BIG), axis=1) + dz
    t0 = jnp.clip(t0, near, far)
    t1 = jnp.clip(t1, near, far)
    return t0, t1


def _pool2d(x: jnp.ndarray, op, size: int, init) -> jnp.ndarray:
    return jax.lax.reduce_window(
        x, init, op, window_dimensions=(size, size),
        window_strides=(1, 1), padding="SAME")


def image_intervals(binary: jnp.ndarray, spec: DensityGridSpec,
                    rays_o: jnp.ndarray, rays_d: jnp.ndarray,
                    near: float, far: float, *,
                    block: int = 4, n_probe: int = 128,
                    dilate: int = 1
                    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Conservative per-pixel [t0, t1] maps for a full image.

    Args:
      rays_o/rays_d: [H, W, 3] image rays.
      block: probe one ray per block x block tile.
      n_probe: occupancy tests per probe ray.
      dilate: occupancy dilation iterations (>=1 keeps sub-tile silhouette
        motion conservative).

    Returns (t0 [H, W], t1 [H, W]) fp32.
    """
    h, w = rays_o.shape[:2]
    off = block // 2
    oc = rays_o[off::block, off::block]
    dc = rays_d[off::block, off::block]
    hc, wc = oc.shape[:2]

    bd = dilate_binary(binary, dilate)
    t0c, t1c = ray_intervals(bd, spec, oc.reshape(-1, 3), dc.reshape(-1, 3),
                             near, far, n_probe)
    t0c = t0c.reshape(hc, wc)
    t1c = t1c.reshape(hc, wc)

    # Union over the 3x3 tile neighborhood: a pixel's interval covers every
    # occupied stretch any nearby probe ray saw.
    t0c = -_pool2d(-t0c, jax.lax.max, 3, -jnp.inf)
    t1c = _pool2d(t1c, jax.lax.max, 3, -jnp.inf)

    # Nearest-neighbor upsample back to pixel resolution.
    t0 = jnp.repeat(jnp.repeat(t0c, block, axis=0), block, axis=1)[:h, :w]
    t1 = jnp.repeat(jnp.repeat(t1c, block, axis=0), block, axis=1)[:h, :w]
    # Tiles can be cut off at the bottom/right edge when block does not
    # divide H/W; repeat covers ceil(hc*block) >= h only when hc*block >= h.
    pad_h, pad_w = h - t0.shape[0], w - t0.shape[1]
    if pad_h > 0 or pad_w > 0:
        t0 = jnp.pad(t0, ((0, pad_h), (0, pad_w)), mode="edge")
        t1 = jnp.pad(t1, ((0, pad_h), (0, pad_w)), mode="edge")
    return t0, t1
