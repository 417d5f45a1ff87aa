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

from .density_grid import DensityGridSpec, grid_active_mask, grid_lookup

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


def tile_occupancy(binary: jnp.ndarray, spec: DensityGridSpec,
                   rays_o: jnp.ndarray, rays_d: jnp.ndarray,
                   near: float, far: float, n_probe: int) -> jnp.ndarray:
    """Occupancy of `n_probe` equal z-bins (tested at bin centers) per ray.

    Args:
      binary: occupancy volume (pre-dilated for conservativeness).
      rays_o/rays_d: [R, 3].
    Returns occ [R, n_probe] bool.
    """
    n_rays = rays_o.shape[0]
    dbin = (far - near) / n_probe
    z = near + (jnp.arange(n_probe, dtype=jnp.float32) + 0.5) * dbin
    pts = rays_o[:, None, :] + rays_d[:, None, :] * z[None, :, None]
    return grid_active_mask(binary, pts.reshape(-1, 3), spec) \
        .reshape(n_rays, n_probe)


def image_occupancy_cdf(binary: jnp.ndarray, spec: DensityGridSpec,
                        rays_o: jnp.ndarray, rays_d: jnp.ndarray,
                        near: float, far: float, k: int, *,
                        block: int = 4, n_probe: int = 128,
                        dilate: int = 1):
    """Per-pixel inverse-CDF sample placement over OCCUPIED z-bins.

    The single-interval scheme (image_intervals) spends its budget uniformly
    over the convex hull [t_enter, t_exit]; on scenes whose occupied set has
    gaps along the ray (separate objects, ground plane + floating parts) that
    wastes most samples on free space and was measured to cost 2-6 dB at
    k<=32. Here the budget is instead distributed evenly over the occupancy
    MEASURE: sample j of k sits at the (j+0.5)/k quantile of the cumulative
    occupied-bin count, so free-space bins receive no samples at all and a
    ray whose occupied set spans <= k bins is sampled at least as densely as
    the dense S=n_probe reference path.

    Probing stays block-coarse (one probe ray per `block`^2 tile, occupancy
    unioned over the 3x3 tile neighborhood, grid pre-dilated) — the same
    conservativeness argument as image_intervals.

    Returns (idx [H, W, k] int32 occupied-bin index per sample,
             n_occ [H, W] float32 occupied-bin count,
             occ_far [H, W] bool — last bin occupied (catch-all dist)).
    z values follow as near + (idx + u) * dbin with dbin = (far-near)/n_probe
    and u in [0,1); per-sample dist is n_occ * dbin / k.
    """
    h, w = rays_o.shape[:2]
    off = block // 2
    oc = rays_o[off::block, off::block]
    dc = rays_d[off::block, off::block]
    hc, wc = oc.shape[:2]

    bd = dilate_binary(binary, dilate)
    occ = tile_occupancy(bd, spec, oc.reshape(-1, 3), dc.reshape(-1, 3),
                         near, far, n_probe).reshape(hc, wc, n_probe)
    # Union over the 3x3 tile neighborhood, per z-bin.
    occ = jax.lax.reduce_window(
        occ.astype(jnp.float32), -jnp.inf, jax.lax.max,
        window_dimensions=(3, 3, 1), window_strides=(1, 1, 1),
        padding="SAME") > 0.0

    c = jnp.cumsum(occ.astype(jnp.float32), axis=-1)     # [hc, wc, P]
    n_occ = c[..., -1]                                   # [hc, wc]
    # Quantile targets u_j = (j+.5)/k * n_occ; bin index = #{c < u_j}.
    # k separate compare+reduce passes keep the peak memory at [hc,wc,P].
    cols = []
    for j in range(k):
        u = (j + 0.5) / k * n_occ
        cols.append(jnp.sum((c < u[..., None]).astype(jnp.int32), axis=-1))
    idx = jnp.stack(cols, axis=-1)                       # [hc, wc, k]
    idx = jnp.minimum(idx, n_probe - 1).astype(jnp.int32)

    occ_far = occ[..., -1]

    def up(x):
        x = jnp.repeat(jnp.repeat(x, block, axis=0), block, axis=1)
        x = x[:h, :w]
        pad_h, pad_w = h - x.shape[0], w - x.shape[1]
        if pad_h > 0 or pad_w > 0:
            pad = [(0, pad_h), (0, pad_w)] + [(0, 0)] * (x.ndim - 2)
            x = jnp.pad(x, pad, mode="edge")
        return x

    return up(idx), up(n_occ), up(occ_far)


def image_importance_cdf(binary: jnp.ndarray, density: jnp.ndarray,
                         spec: DensityGridSpec,
                         rays_o: jnp.ndarray, rays_d: jnp.ndarray,
                         near: float, far: float, k: int, *,
                         block: int = 4, n_probe: int = 128,
                         dilate: int = 1, floor: float = 0.1,
                         temper: float = 0.5):
    """Per-pixel inverse-CDF sample placement weighted by the density
    grid's TRANSMITTANCE profile.

    image_occupancy_cdf spreads the budget uniformly over occupied bins; a
    ray grazing a thick occupied slab still spends most samples inside it
    even though only the entry surface contributes. Here the probe pass —
    at the SAME cost — reads the density grid's values, composites a
    coarse per-tile alpha/transmittance profile, and places sample j at
    the (j+0.5)/k quantile of the weight CDF  w_b = alpha_b * T_b +
    floor * occupied_b / n_occ.  The floor term keeps every occupied bin
    reachable (conservativeness: a surface the coarse profile underweights
    still receives ~floor/(1+floor) of the budget spread over occupied
    bins); alpha/occupancy are unioned over the 3x3 tile neighborhood on a
    dilated grid exactly like the occupancy CDF.

    Returns (z [H, W, k] fp32 ascending sample positions,
             valid [H, W] bool,
             occ_far [H, W] bool).
    Composite with dists = diff(z) (renderer.render_rays_z).
    """
    h, w = rays_o.shape[:2]
    off = block // 2
    oc = rays_o[off::block, off::block]
    dc = rays_d[off::block, off::block]
    hc, wc = oc.shape[:2]
    dbin = (far - near) / n_probe
    z_centers = near + (jnp.arange(n_probe, dtype=jnp.float32) + 0.5) * dbin

    bd = dilate_binary(binary, dilate)
    occ = tile_occupancy(bd, spec, oc.reshape(-1, 3), dc.reshape(-1, 3),
                         near, far, n_probe).reshape(hc, wc, n_probe)
    # Coarse sigma profile from the (undilated) density values.
    pts = oc.reshape(-1, 1, 3) + dc.reshape(-1, 1, 3) \
        * z_centers[None, :, None]
    sig = grid_lookup(density, pts.reshape(-1, 3), spec) \
        .reshape(hc, wc, n_probe)
    norm = jnp.linalg.norm(dc, axis=-1).reshape(hc, wc, 1)
    alpha = 1.0 - jnp.exp(-sig * dbin * norm)

    def pool3(x, dtype=jnp.float32):
        y = jax.lax.reduce_window(
            x.astype(jnp.float32), -jnp.inf, jax.lax.max,
            window_dimensions=(3, 3, 1), window_strides=(1, 1, 1),
            padding="SAME")
        return y.astype(dtype)

    occ = pool3(occ) > 0.0
    alpha = pool3(alpha)

    trans = jnp.cumprod(1.0 - alpha + 1e-10, axis=-1)
    trans = jnp.concatenate(
        [jnp.ones_like(trans[..., :1]), trans[..., :-1]], axis=-1)
    w_vis = alpha * trans * occ.astype(jnp.float32)
    # Tempering (w^temper, temper<1) flattens the profile: the coarse-grid
    # transmittance is over-sharp (a voxel the grid marks opaque absorbs
    # the whole budget into one bin, and the z-diff compositing distances
    # then underestimate the clustered samples' opacity). Measured without
    # tempering: 4-6 dB WORSE than the uniform occupancy CDF at k<=16.
    w_vis = jnp.power(jnp.maximum(w_vis, 0.0), temper)
    n_occ = jnp.sum(occ.astype(jnp.float32), axis=-1, keepdims=True)
    wsum = jnp.sum(w_vis, axis=-1, keepdims=True)
    w_vis = w_vis / jnp.maximum(wsum, 1e-12)
    wght = w_vis + floor * occ.astype(jnp.float32) / jnp.maximum(n_occ, 1.0)

    c = jnp.cumsum(wght, axis=-1)                           # [hc, wc, P]
    total = c[..., -1]
    valid = total > 0.0
    p_iota = jnp.arange(n_probe, dtype=jnp.int32)

    idx_cols, frac_cols = [], []
    for j in range(k):
        u = (j + 0.5) / k * total                           # [hc, wc]
        lt = (c < u[..., None])
        bj = jnp.sum(lt.astype(jnp.int32), axis=-1)         # bin index
        bj = jnp.minimum(bj, n_probe - 1)
        onehot = (p_iota[None, None, :] == bj[..., None])
        c_prev = jnp.sum(jnp.where(onehot, c - wght, 0.0), axis=-1)
        w_b = jnp.sum(jnp.where(onehot, wght, 0.0), axis=-1)
        frac = jnp.clip((u - c_prev) / jnp.maximum(w_b, 1e-12), 0.0, 1.0)
        idx_cols.append(bj)
        frac_cols.append(frac)
    idx = jnp.stack(idx_cols, axis=-1).astype(jnp.float32)  # [hc, wc, k]
    frac = jnp.stack(frac_cols, axis=-1)
    z = near + (idx + frac) * dbin
    occ_far = occ[..., -1]

    def up(x):
        x = jnp.repeat(jnp.repeat(x, block, axis=0), block, axis=1)
        x = x[:h, :w]
        pad_h, pad_w = h - x.shape[0], w - x.shape[1]
        if pad_h > 0 or pad_w > 0:
            pad = [(0, pad_h), (0, pad_w)] + [(0, 0)] * (x.ndim - 2)
            x = jnp.pad(x, pad, mode="edge")
        return x

    return up(z), up(valid), up(occ_far)


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
