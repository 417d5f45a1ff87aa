"""Ray-batch and image rendering (reference: src/renderer.py:240-418).

Static-shape TPU re-design:

  * No boolean compaction with dynamic shapes. Occupancy skipping comes in two
    flavors behind one signature:
      - mask mode (capacity=None): evaluate the field at every sample and
        zero sigma at inactive points — exact, the correctness baseline.
      - compaction mode (capacity=K): a counting-sort permutation moves active
        points to the front, the field is evaluated on a fixed-capacity [K]
        prefix, and results are scattered back. Shapes stay static, FLOPs and
        gather traffic drop with the grid's active ratio. The training loop
        switches modes from the host once the grid turns sparse.
  * Full-image rendering is a `lax.map` over fixed-size ray chunks — one XLA
    program per image instead of a Python chunk loop.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ..ops.volume import composite, sample_stratified
from .density_grid import DensityGridSpec, grid_active_mask


def _select_k_per_ray(mask2d: jnp.ndarray, k: int):
    """Indices of the first `k` active samples of each ray.

    mask2d: [R, S] bool. Returns (idx [R, k] int32 ascending, valid [R, k]).
    Pure lane-wise arithmetic (cumsum + k compare/reduce passes) — no
    gathers, no sort. Rays with more than `k` active samples lose the tail
    (bounded truncation, like the global-capacity path); rays with fewer
    pad with invalid slots whose sigma is zeroed.
    """
    c = jnp.cumsum(mask2d.astype(jnp.int32), axis=1)       # [R, S]
    n_act = c[:, -1]
    cols = []
    for j in range(k):
        # Position of the (j+1)-th active sample = #samples with c < j+1.
        cols.append(jnp.sum((c < j + 1).astype(jnp.int32), axis=1))
    idx = jnp.stack(cols, axis=1)                           # [R, k]
    s = mask2d.shape[1]
    idx = jnp.minimum(idx, s - 1)
    valid = jnp.arange(1, k + 1)[None, :] <= n_act[:, None]
    return idx.astype(jnp.int32), valid


def _eval_compacted(eval_field, pts_flat, dirs_flat, times_flat,
                    mask: jnp.ndarray, capacity: int):
    """Evaluate the field on the mask-active points compacted to a static
    capacity, scattering results back into the dense [N] layout (zeros at
    inactive/overflow slots — exactly what sigma-masking would produce).
    eval_field: (pts, dirs, times|None) -> (rgb, sigma, delta|None).
    """
    n_pts = pts_flat.shape[0]
    take, valid = _compact_indices(mask, capacity)
    rgb_c, sigma_c, delta_c = eval_field(
        pts_flat[take], dirs_flat[take],
        times_flat[take] if times_flat is not None else None)
    vm = valid[:, None].astype(jnp.float32)
    rgb = jnp.zeros((n_pts, 3), jnp.float32).at[take].set(
        rgb_c.astype(jnp.float32) * vm)
    sigma = jnp.zeros((n_pts, 1), jnp.float32).at[take].set(
        sigma_c.astype(jnp.float32) * vm)
    delta = None
    if delta_c is not None:
        delta = jnp.zeros((n_pts, 3), jnp.float32).at[take].set(
            delta_c.astype(jnp.float32) * vm)
    return rgb, sigma, delta


def _compact_indices(mask: jnp.ndarray, capacity: int):
    """Counting-sort permutation putting active indices first.

    Returns (take [capacity] int32, valid [capacity] bool). O(N), stable, no
    dynamic shapes — the TPU-idiomatic replacement for boolean indexing.
    """
    n = mask.shape[0]
    # Trainer capacity floors (max(4096, ...)) can exceed n on tiny batch
    # configs; order[:capacity] would then silently truncate to n while
    # valid kept length capacity, breaking broadcasting at trace time.
    capacity = min(capacity, n)
    cm_act = jnp.cumsum(mask.astype(jnp.int32))
    n_active = cm_act[-1]
    cm_inact = jnp.cumsum((~mask).astype(jnp.int32))
    pos = jnp.where(mask, cm_act - 1, n_active + cm_inact - 1)
    order = jnp.zeros((n,), jnp.int32).at[pos].set(
        jnp.arange(n, dtype=jnp.int32))
    take = order[:capacity]
    valid = jnp.arange(capacity) < n_active
    return take, valid


def render_rays(
    field,
    params,
    rays_o: jnp.ndarray,
    rays_d: jnp.ndarray,
    *,
    near: float,
    far: float,
    n_samples: int,
    perturb: bool,
    rng: Optional[jax.Array] = None,
    times: Optional[jnp.ndarray] = None,
    grid_binary: Optional[jnp.ndarray] = None,
    grid_spec: Optional[DensityGridSpec] = None,
    bg_color: Optional[jnp.ndarray] = None,
    train: bool = False,
    capacity: Optional[int] = None,
    ray_budget: Optional[int] = None,
    max_level: Optional[int] = None,
    budget_mode: str = "first",
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, dict]:
    """Render a batch of rays through `field`.

    Mirrors the reference pipeline (reference: src/renderer.py:240-384):
    stratified sampling, normalized view dirs broadcast per sample, optional
    occupancy skipping, compositing, and the render-weighted mean delta_x in
    extras for the deformation regularizer.

    Returns (rgb_map [R,3], depth_map [R], acc_map [R], extras).
    """
    n_rays = rays_o.shape[0]
    dynamic = field.needs_time

    if bg_color is None:
        bg_color = jnp.ones((3,), jnp.float32)

    s_rng, m_rng = (jax.random.split(rng) if rng is not None else (None, None))

    if ray_budget is not None and grid_binary is not None:
        # Per-ray sparse marching: evaluate only `ray_budget` occupied
        # samples of each ray. budget_mode="first" takes the first k
        # occupied bins with their original widths (exact vs the dense
        # masked integral while k covers the actives; truncates the far
        # tail otherwise). budget_mode="cdf" spreads the k samples over
        # the occupied-bin CDF with measure-preserving dists — the same
        # estimator the eval paths use; no tail truncation. When
        # `capacity` is also given, the selected samples are additionally
        # compacted to that static size before the field evaluation
        # (rays that miss the scene pad their budget with invalid slots;
        # in steady state only ~20-25% of the R*k candidates are real,
        # so skipping the rest cuts the hash gather/scatter-add work —
        # the dominant per-step cost on v5e — by 2-4x).
        return _render_rays_budget(
            field, params, rays_o, rays_d, near=near, far=far,
            n_samples=n_samples, perturb=perturb, s_rng=s_rng, m_rng=m_rng,
            times=times, grid_binary=grid_binary, grid_spec=grid_spec,
            bg_color=bg_color, train=train, k=ray_budget,
            max_level=max_level, budget_mode=budget_mode,
            capacity=capacity)
    z_vals = sample_stratified(s_rng, near, far, n_samples, n_rays, perturb)
    pts = rays_o[:, None, :] + rays_d[:, None, :] * z_vals[..., None]

    view_dirs = rays_d / jnp.linalg.norm(rays_d, axis=-1, keepdims=True)
    view_dirs = jnp.broadcast_to(view_dirs[:, None, :],
                                 (n_rays, n_samples, 3))

    n_pts = n_rays * n_samples
    pts_flat = pts.reshape(n_pts, 3)
    dirs_flat = view_dirs.reshape(n_pts, 3)
    if dynamic:
        if times is None:
            times = jnp.zeros((n_rays, 1), jnp.float32)
        times_flat = jnp.broadcast_to(
            times[:, None, :], (n_rays, n_samples, 1)).reshape(n_pts, 1)
    else:
        times_flat = None

    mask = None
    if grid_binary is not None:
        mask = grid_active_mask(grid_binary, pts_flat, grid_spec)

    def eval_field(p, dd, tt):
        if dynamic:
            return field.apply(params, p, dd, tt, train=train, rng=m_rng,
                               max_level=max_level)
        rgb, sigma = field.apply(params, p, dd, train=train, rng=m_rng,
                                 max_level=max_level)
        return rgb, sigma, None

    if mask is not None and capacity is not None:
        rgb, sigma, delta_flat = _eval_compacted(
            eval_field, pts_flat, dirs_flat, times_flat, mask, capacity)
    else:
        rgb, sigma, delta_flat = eval_field(pts_flat, dirs_flat, times_flat)
        rgb = rgb.astype(jnp.float32)
        sigma = sigma.astype(jnp.float32)
        if mask is not None:
            sigma = sigma * mask[:, None].astype(jnp.float32)
        if delta_flat is not None:
            delta_flat = delta_flat.astype(jnp.float32)

    rgb = rgb.reshape(n_rays, n_samples, 3)
    sigma = sigma.reshape(n_rays, n_samples)

    rgb_map, depth_map, acc_map, weights = composite(
        rgb, sigma, z_vals, rays_d, bg_color=bg_color)

    extras = {}
    if dynamic and delta_flat is not None:
        delta = delta_flat.reshape(n_rays, n_samples, 3)
        extras["mean_delta_x"] = jnp.sum(weights[..., None] * delta, axis=1)
    return rgb_map, depth_map, acc_map, extras


def _select_k_cdf(mask2d: jnp.ndarray, k: int):
    """Occupied-bin quantile selection: sample j sits at the (j+0.5)/k
    quantile of the per-ray occupied-bin CDF (the eval paths' placement,
    intervals.py::image_occupancy_cdf).

    Returns (idx [R, k] int32 ascending, n_act [R] int32). Rays with more
    occupied bins than k are covered end-to-end at reduced density instead
    of truncated at the k-th bin.
    """
    c = jnp.cumsum(mask2d.astype(jnp.float32), axis=1)      # [R, S]
    n_act = c[:, -1]
    cols = []
    for j in range(k):
        u = (j + 0.5) / k * n_act
        cols.append(jnp.sum((c < u[:, None]).astype(jnp.int32), axis=1))
    idx = jnp.stack(cols, axis=1)
    idx = jnp.minimum(idx, mask2d.shape[1] - 1)
    return idx.astype(jnp.int32), n_act


def _render_rays_budget(field, params, rays_o, rays_d, *, near, far,
                        n_samples, perturb, s_rng, m_rng, times,
                        grid_binary, grid_spec, bg_color, train, k,
                        max_level=None, budget_mode="first",
                        capacity=None):
    """Per-ray budgeted rendering (see render_rays docstring)."""
    n_rays = rays_o.shape[0]
    dynamic = field.needs_time
    dz = (far - near) / (n_samples - 1)

    # Occupancy of every nominal (unperturbed) sample position.
    t_lin = jnp.linspace(0.0, 1.0, n_samples, dtype=jnp.float32)
    z_grid = near * (1.0 - t_lin) + far * t_lin                  # [S]
    pts_all = rays_o[:, None, :] + rays_d[:, None, :] * z_grid[None, :, None]
    mask2d = grid_active_mask(
        grid_binary, pts_all.reshape(-1, 3), grid_spec
    ).reshape(n_rays, n_samples)

    if budget_mode == "cdf":
        idx, n_act = _select_k_cdf(mask2d, k)
        valid = (n_act > 0)[:, None]
    else:
        idx, valid = _select_k_per_ray(mask2d, k)                # [R, k]
        n_act = None
    idx_f = idx.astype(jnp.float32)
    z_sel = near + idx_f * dz                                    # [R, k]
    if perturb:
        # Jitter within the sample's bin (the stratified estimator on the
        # selected bins; the dense path jitters between bin midpoints).
        u = jax.random.uniform(s_rng, z_sel.shape, jnp.float32)
        z_sel = jnp.clip(z_sel + (u - 0.5) * dz, near, far)

    pts = rays_o[:, None, :] + rays_d[:, None, :] * z_sel[..., None]
    view_dirs = rays_d / jnp.linalg.norm(rays_d, axis=-1, keepdims=True)
    view_dirs = jnp.broadcast_to(view_dirs[:, None, :], (n_rays, k, 3))

    n_pts = n_rays * k
    pts_flat = pts.reshape(n_pts, 3)
    dirs_flat = view_dirs.reshape(n_pts, 3)
    times_flat = None
    if dynamic:
        if times is None:
            times = jnp.zeros((n_rays, 1), jnp.float32)
        times_flat = jnp.broadcast_to(
            times[:, None, :], (n_rays, k, 1)).reshape(n_pts, 1)

    def eval_field(p, dd, tt):
        if dynamic:
            return field.apply(params, p, dd, tt, train=train, rng=m_rng,
                               max_level=max_level)
        rgb, sigma = field.apply(params, p, dd, train=train, rng=m_rng,
                                 max_level=max_level)
        return rgb, sigma, None

    if capacity is not None:
        # Second-stage compaction: only the `valid` budget slots carry
        # real occupied samples (rays that miss the scene, or have fewer
        # actives than k, pad with invalid slots whose sigma is zeroed
        # anyway) — counting-sort them to a static capacity and evaluate
        # the field on that subset only.
        vflat = jnp.broadcast_to(valid, (n_rays, k)).reshape(-1)
        rgb, sigma, delta = _eval_compacted(
            eval_field, pts_flat, dirs_flat, times_flat, vflat, capacity)
    else:
        rgb, sigma, delta = eval_field(pts_flat, dirs_flat, times_flat)

    rgb = rgb.astype(jnp.float32).reshape(n_rays, k, 3)
    sigma = sigma.astype(jnp.float32).reshape(n_rays, k)
    sigma = sigma * valid.astype(jnp.float32)

    norm = jnp.linalg.norm(rays_d, axis=-1, keepdims=True)
    if budget_mode == "cdf":
        # Measure-preserving dists over the occupied set (the eval
        # estimator); the catch-all applies when the final nominal sample
        # is occupied (reference: src/renderer.py:213-215).
        dists = jnp.broadcast_to((n_act * dz / k)[:, None], (n_rays, k))
        last = jnp.where(mask2d[:, -1], 1e10, dists[:, -1])
        dists = jnp.concatenate([dists[:, :-1], last[:, None]], axis=1) \
            * norm
    else:
        # Original bin widths as dists; the reference's 1e10 catch-all
        # applies to the final nominal sample
        # (reference: src/renderer.py:213-215).
        dists = jnp.where(idx == n_samples - 1, 1e10, dz) * norm

    rgb_map, depth_map, acc_map, weights = composite(
        rgb, sigma, z_sel, rays_d, bg_color=bg_color, dists=dists)

    extras = {}
    if dynamic and delta is not None:
        delta = delta.astype(jnp.float32).reshape(n_rays, k, 3)
        extras["mean_delta_x"] = jnp.sum(weights[..., None] * delta, axis=1)
    return rgb_map, depth_map, acc_map, extras


def render_rays_interval(
    field,
    params,
    rays_o: jnp.ndarray,
    rays_d: jnp.ndarray,
    *,
    t0: jnp.ndarray,
    t1: jnp.ndarray,
    n_samples: int,
    far: Optional[float] = None,
    perturb: bool = False,
    rng: Optional[jax.Array] = None,
    times: Optional[jnp.ndarray] = None,
    grid_binary: Optional[jnp.ndarray] = None,
    grid_spec: Optional[DensityGridSpec] = None,
    bg_color: Optional[jnp.ndarray] = None,
    train: bool = False,
    max_level: Optional[int] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, dict]:
    """Render rays with the sample budget distributed inside per-ray
    occupied intervals (see render/intervals.py).

    This is the eval-path replacement for dense sampling + occupancy
    masking: with conservative [t0, t1] no occupied voxel along the ray is
    missed, samples are never placed in the empty margin, and the effective
    sample spacing (t1-t0)/n adapts per ray. When `grid_binary` is given,
    sigma is additionally zeroed at samples in unoccupied voxels — the same
    pruning semantics as the dense masked path (reference:
    src/renderer.py:303-343). Rays with empty intervals (t1 <= t0)
    composite to pure background.

    Final-sample semantics: the dense path gives its last sample a 1e10
    catch-all distance (reference: src/renderer.py:213-215). Here that
    applies only when the occupied interval is clipped at the far plane
    (`t1 >= far`): if t1 < far, the conservative grid guarantees free space
    beyond it, so the dense path's catch-all sample would have been masked
    to sigma 0 anyway and the ray escapes to the background.
    """
    n_rays = rays_o.shape[0]
    k = n_samples
    dynamic = field.needs_time
    if bg_color is None:
        bg_color = jnp.ones((3,), jnp.float32)

    valid_ray = (t1 > t0)
    span = jnp.maximum(t1 - t0, 1e-6)
    dz = span / k                                            # [R]
    frac = (jnp.arange(k, dtype=jnp.float32) + 0.5) / k      # bin midpoints
    z = t0[:, None] + span[:, None] * frac[None, :]          # [R, k]
    if perturb:
        u = jax.random.uniform(rng, z.shape, jnp.float32)
        z = z + (u - 0.5) * dz[:, None]

    pts = rays_o[:, None, :] + rays_d[:, None, :] * z[..., None]
    view_dirs = rays_d / jnp.linalg.norm(rays_d, axis=-1, keepdims=True)
    view_dirs = jnp.broadcast_to(view_dirs[:, None, :], (n_rays, k, 3))

    n_pts = n_rays * k
    pts_flat = pts.reshape(n_pts, 3)
    dirs_flat = view_dirs.reshape(n_pts, 3)
    times_flat = None
    if dynamic:
        if times is None:
            times = jnp.zeros((n_rays, 1), jnp.float32)
        times_flat = jnp.broadcast_to(
            times[:, None, :], (n_rays, k, 1)).reshape(n_pts, 1)

    if dynamic:
        rgb, sigma, delta = field.apply(params, pts_flat, dirs_flat,
                                        times_flat, train=train, rng=rng,
                                        max_level=max_level)
    else:
        rgb, sigma = field.apply(params, pts_flat, dirs_flat,
                                 train=train, rng=rng, max_level=max_level)
        delta = None

    rgb = rgb.astype(jnp.float32).reshape(n_rays, k, 3)
    sigma = sigma.astype(jnp.float32).reshape(n_rays, k)
    sigma = sigma * valid_ray[:, None].astype(jnp.float32)
    if grid_binary is not None:
        fine = grid_active_mask(grid_binary, pts_flat, grid_spec)
        sigma = sigma * fine.reshape(n_rays, k).astype(jnp.float32)

    norm = jnp.linalg.norm(rays_d, axis=-1, keepdims=True)
    dists = jnp.broadcast_to(dz[:, None], (n_rays, k))
    if far is not None:
        clipped = (t1 >= far - 1e-6)
        last = jnp.where(clipped, 1e10, dists[:, -1])
        dists = jnp.concatenate([dists[:, :-1], last[:, None]], axis=1)
    dists = dists * norm

    rgb_map, depth_map, acc_map, weights = composite(
        rgb, sigma, z, rays_d, bg_color=bg_color, dists=dists)

    extras = {}
    if dynamic and delta is not None:
        delta = delta.astype(jnp.float32).reshape(n_rays, k, 3)
        extras["mean_delta_x"] = jnp.sum(weights[..., None] * delta, axis=1)
    return rgb_map, depth_map, acc_map, extras


def _field_at_z(field, params, rays_o, rays_d, z, *, times, train, rng,
                max_level, grid_binary=None, grid_spec=None):
    """Evaluate `field` at per-ray depths z [R, k].

    Shared sample-evaluation core of the sparse render paths (cdf / z /
    hier): point/dir/time broadcast + flatten, field apply, fp32 cast, and
    the optional per-sample occupancy masking. Returns
    (rgb [R,k,3], sigma [R,k], delta [R,k,3]|None) fp32.
    """
    n_rays, k = z.shape
    dynamic = field.needs_time
    pts = rays_o[:, None, :] + rays_d[:, None, :] * z[..., None]
    view_dirs_ray = rays_d / jnp.linalg.norm(rays_d, axis=-1, keepdims=True)

    n_pts = n_rays * k
    pts_flat = pts.reshape(n_pts, 3)
    grouped = getattr(field, "apply_grouped", None)
    if dynamic:
        if times is None:
            times = jnp.zeros((n_rays, 1), jnp.float32)
        times_flat = jnp.broadcast_to(
            times[:, None, :], (n_rays, k, 1)).reshape(n_pts, 1)
    if grouped is not None and not dynamic:
        rgb, sigma = grouped(params, pts, view_dirs_ray, train=train,
                             rng=rng, max_level=max_level)
        delta = None
    else:
        dirs_flat = jnp.broadcast_to(
            view_dirs_ray[:, None, :], (n_rays, k, 3)).reshape(n_pts, 3)
        if dynamic:
            rgb, sigma, delta = field.apply(
                params, pts_flat, dirs_flat, times_flat, train=train,
                rng=rng, max_level=max_level)
        else:
            rgb, sigma = field.apply(params, pts_flat, dirs_flat,
                                     train=train, rng=rng,
                                     max_level=max_level)
            delta = None

    rgb = rgb.astype(jnp.float32).reshape(n_rays, k, 3)
    sigma = sigma.astype(jnp.float32).reshape(n_rays, k)
    if grid_binary is not None:
        fine = grid_active_mask(grid_binary, pts_flat, grid_spec)
        sigma = sigma * fine.reshape(n_rays, k).astype(jnp.float32)
    if delta is not None:
        delta = delta.astype(jnp.float32).reshape(n_rays, k, 3)
    return rgb, sigma, delta


def _composite_extras(rgb, sigma, z, rays_d, bg_color, dists, delta):
    rgb_map, depth_map, acc_map, weights = composite(
        rgb, sigma, z, rays_d, bg_color=bg_color, dists=dists)
    extras = {}
    if delta is not None:
        extras["mean_delta_x"] = jnp.sum(weights[..., None] * delta, axis=1)
    return rgb_map, depth_map, acc_map, weights, extras


def render_rays_cdf(
    field,
    params,
    rays_o: jnp.ndarray,
    rays_d: jnp.ndarray,
    *,
    idx: jnp.ndarray,
    n_occ: jnp.ndarray,
    occ_far: jnp.ndarray,
    near: float,
    far: float,
    n_probe: int,
    perturb: bool = False,
    rng: Optional[jax.Array] = None,
    times: Optional[jnp.ndarray] = None,
    grid_binary: Optional[jnp.ndarray] = None,
    grid_spec: Optional[DensityGridSpec] = None,
    bg_color: Optional[jnp.ndarray] = None,
    train: bool = False,
    max_level: Optional[int] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, dict]:
    """Render rays at precomputed occupancy-CDF sample bins
    (render/intervals.py::image_occupancy_cdf).

    Args:
      idx: [R, k] int32 — occupied z-bin per sample.
      n_occ: [R] — occupied-bin count (0 -> pure background ray).
      occ_far: [R] bool — ray occupied through the far plane (the dense
        path's 1e10 catch-all dist applies to the last sample then,
        reference: src/renderer.py:213-215).

    Each sample represents n_occ/k bins of occupied space, so the per-sample
    dist is n_occ * dbin / k — the compositing integral preserves optical
    depth over the occupied set while free-space bins (alpha = 0 in the
    dense masked path) are never evaluated.
    """
    n_rays, k = idx.shape
    if bg_color is None:
        bg_color = jnp.ones((3,), jnp.float32)
    dbin = (far - near) / n_probe

    if perturb:
        u = jax.random.uniform(rng, idx.shape, jnp.float32)
    else:
        u = 0.5
    z = near + (idx.astype(jnp.float32) + u) * dbin          # [R, k]

    rgb, sigma, delta = _field_at_z(
        field, params, rays_o, rays_d, z, times=times, train=train,
        rng=rng, max_level=max_level, grid_binary=grid_binary,
        grid_spec=grid_spec)
    sigma = sigma * (n_occ > 0).astype(jnp.float32)[:, None]

    norm = jnp.linalg.norm(rays_d, axis=-1, keepdims=True)
    dist = (n_occ * dbin / k)[:, None]                       # [R, 1]
    dists = jnp.broadcast_to(dist, (n_rays, k))
    last = jnp.where(occ_far, 1e10, dists[:, -1])
    dists = jnp.concatenate([dists[:, :-1], last[:, None]], axis=1) * norm

    rgb_map, depth_map, acc_map, _, extras = _composite_extras(
        rgb, sigma, z, rays_d, bg_color, dists, delta)
    return rgb_map, depth_map, acc_map, extras


def _resample_from_weights(z: jnp.ndarray, weights: jnp.ndarray,
                           k_fine: int, *, floor: float = 0.01,
                           rng: Optional[jax.Array] = None,
                           return_dists: bool = False):
    """Inverse-CDF resampling of `k_fine` depths from per-coarse-sample
    weights (classic NeRF hierarchical sampling, lane-arithmetic only).

    Bins are the z-intervals around each coarse sample (edges at neighbor
    midpoints); the pdf is weights + floor·mean so every bin stays
    reachable. Deterministic mid-quantile placement unless `rng` is given.
    Returns z_fine [R, k_fine] (unsorted within the merged set); with
    `return_dists` also returns the measure-consistent compositing
    distance of each sample — 1/k_fine of the CDF mass expressed as ray
    length, bin_width·total/(k_fine·w_bin). Fine-only composites MUST use
    these instead of z-differences: clustered surface samples otherwise
    collapse alpha (the round-2 "importance" negative result,
    AB_RESULTS.md).
    """
    n_rays, k = z.shape
    mids = 0.5 * (z[:, 1:] + z[:, :-1])
    lo = jnp.concatenate(
        [z[:, :1] - (mids[:, :1] - z[:, :1]), mids], axis=1)
    hi = jnp.concatenate(
        [mids, z[:, -1:] + (z[:, -1:] - mids[:, -1:])], axis=1)

    w = weights + floor * (jnp.mean(weights, axis=1, keepdims=True) + 1e-8)
    c = jnp.cumsum(w, axis=1)                                # [R, k]
    total = c[:, -1:]

    iota = jnp.arange(k, dtype=jnp.int32)
    if rng is not None:
        u_all = jax.random.uniform(rng, (n_rays, k_fine), jnp.float32)
    else:
        u_all = None
    cols = []
    dcols = []
    for j in range(k_fine):
        uj = ((j + 0.5) / k_fine if u_all is None
              else (j + u_all[:, j]) / k_fine)
        u = uj * total[:, 0]                                 # [R]
        b = jnp.sum((c < u[:, None]).astype(jnp.int32), axis=1)
        b = jnp.minimum(b, k - 1)
        onehot = (iota[None, :] == b[:, None])
        c_prev = jnp.sum(jnp.where(onehot, c - w, 0.0), axis=1)
        w_b = jnp.sum(jnp.where(onehot, w, 0.0), axis=1)
        z_lo = jnp.sum(jnp.where(onehot, lo, 0.0), axis=1)
        z_hi = jnp.sum(jnp.where(onehot, hi, 0.0), axis=1)
        frac = jnp.clip((u - c_prev) / jnp.maximum(w_b, 1e-12), 0.0, 1.0)
        cols.append(z_lo + frac * (z_hi - z_lo))
        if return_dists:
            dcols.append((z_hi - z_lo) * total[:, 0]
                         / (k_fine * jnp.maximum(w_b, 1e-12)))
    z_f = jnp.stack(cols, axis=1)                            # [R, k_fine]
    if return_dists:
        span = z[:, -1:] - z[:, :1] + (hi[:, -1:] - lo[:, -1:])
        return z_f, jnp.minimum(jnp.stack(dcols, axis=1), span)
    return z_f


def render_rays_hier(
    field,
    params,
    rays_o: jnp.ndarray,
    rays_d: jnp.ndarray,
    *,
    idx: jnp.ndarray,
    n_occ: jnp.ndarray,
    occ_far: jnp.ndarray,
    near: float,
    far: float,
    n_probe: int,
    k_fine: int,
    perturb: bool = False,
    rng: Optional[jax.Array] = None,
    times: Optional[jnp.ndarray] = None,
    grid_binary: Optional[jnp.ndarray] = None,
    grid_spec: Optional[DensityGridSpec] = None,
    bg_color: Optional[jnp.ndarray] = None,
    train: bool = False,
    max_level: Optional[int] = None,
    sigma_at=None,
    temper: float = 0.7,
    w_floor: float = 0.15,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, dict]:
    """Two-pass hierarchical rendering over occupancy-CDF coarse samples.

    Pass 1 evaluates the field at the k1 = idx.shape[1] occupancy-CDF
    placements (same as render_rays_cdf) and composites for per-sample
    weights. Pass 2 draws `k_fine` additional depths by inverse-CDF of
    those weights (the classic NeRF coarse/fine scheme, reference's dense
    path has no analog — its speed comes from CUDA compaction), evaluates
    only the new depths, and composites the merged k1+k_fine set sorted by
    z with z-difference distances.

    Unlike the experimental "importance" mode (AB_RESULTS.md negative
    result), the placement pdf comes from the REAL field evaluated at the
    coarse samples — not from the coarse density grid — so the profile is
    neither over-sharp nor misregistered. Total field cost is k1+k_fine
    evaluations; quality target is the dense masked metric at a fraction
    of its samples.

    With `sigma_at` (Field.sigma_at: a cheap sigma estimate, e.g. one
    nearest-vertex scalar gather on a baked field), pass 1 instead marches
    that estimate — no color MLP, no row gathers — and ONLY the k_fine
    resampled depths pay full field evaluations; the composite is over the
    fine set alone with z-difference distances. Placement robustness
    against estimate error comes from tempering (w^temper flattens an
    over-sharp profile) plus a floor mixed uniformly over the coarse
    placements (an underweighted surface still receives
    ~w_floor/(1+w_floor) of the budget); both knobs exist because the
    un-tempered grid-profile variant measured 4-6 dB WORSE than uniform
    CDF placement (AB_RESULTS.md "importance" negative result).
    """
    n_rays, k1 = idx.shape
    if bg_color is None:
        bg_color = jnp.ones((3,), jnp.float32)
    dbin = (far - near) / n_probe
    valid_ray = (n_occ > 0).astype(jnp.float32)

    r_coarse = r_fine = None
    if rng is not None:
        r_coarse, r_fine = jax.random.split(rng)

    if perturb and r_coarse is not None:
        u = jax.random.uniform(r_coarse, idx.shape, jnp.float32)
    else:
        u = 0.5
    z_c = near + (idx.astype(jnp.float32) + u) * dbin        # [R, k1]

    if sigma_at is not None:
        pts_c = rays_o[:, None, :] + rays_d[:, None, :] * z_c[..., None]
        sigma_cheap = sigma_at(params, pts_c.reshape(-1, 3)) \
            .astype(jnp.float32).reshape(n_rays, k1)
        sigma_cheap = sigma_cheap * valid_ray[:, None]

        norm = jnp.linalg.norm(rays_d, axis=-1, keepdims=True)
        dist_c = jnp.broadcast_to((n_occ * dbin / k1)[:, None],
                                  (n_rays, k1))
        alpha_c = 1.0 - jnp.exp(-sigma_cheap * dist_c * norm)
        trans_c = jnp.cumprod(1.0 - alpha_c + 1e-10, axis=-1)
        trans_c = jnp.concatenate(
            [jnp.ones_like(trans_c[:, :1]), trans_c[:, :-1]], axis=-1)
        w_c = jnp.power(jnp.maximum(alpha_c * trans_c, 0.0), temper)
        w_c = w_c / jnp.maximum(
            jnp.sum(w_c, axis=1, keepdims=True), 1e-12)
        w_c = w_c + w_floor / k1

        z_f, dist_f = _resample_from_weights(
            z_c, w_c, k_fine, floor=0.0,
            rng=r_fine if perturb else None, return_dists=True)
        rgb_f, sigma_f, delta_f = _field_at_z(
            field, params, rays_o, rays_d, z_f, times=times, train=train,
            rng=rng, max_level=max_level, grid_binary=grid_binary,
            grid_spec=grid_spec)
        sigma_f = sigma_f * valid_ray[:, None]

        # Measure-consistent dists from the placement pdf (see
        # _resample_from_weights): a fine-only composite with z-diff
        # dists collapses alpha where samples cluster on the surface.
        last = jnp.where(occ_far, 1e10, dist_f[:, -1])
        dists = jnp.concatenate([dist_f[:, :-1], last[:, None]], axis=1) \
            * norm
        rgb_map, depth_map, acc_map, _, extras = _composite_extras(
            rgb_f, sigma_f, z_f, rays_d, bg_color, dists, delta_f)
        return rgb_map, depth_map, acc_map, extras

    rgb_c, sigma_c, delta_c = _field_at_z(
        field, params, rays_o, rays_d, z_c, times=times, train=train,
        rng=rng, max_level=max_level, grid_binary=grid_binary,
        grid_spec=grid_spec)
    sigma_cm = sigma_c * valid_ray[:, None]

    # Coarse weights with the CDF path's measure-preserving dists.
    norm = jnp.linalg.norm(rays_d, axis=-1, keepdims=True)
    dist_c = jnp.broadcast_to((n_occ * dbin / k1)[:, None], (n_rays, k1))
    alpha_c = 1.0 - jnp.exp(-sigma_cm * dist_c * norm)
    trans_c = jnp.cumprod(1.0 - alpha_c + 1e-10, axis=-1)
    trans_c = jnp.concatenate(
        [jnp.ones_like(trans_c[:, :1]), trans_c[:, :-1]], axis=-1)
    w_c = jax.lax.stop_gradient(alpha_c * trans_c)

    z_f = _resample_from_weights(z_c, w_c, k_fine,
                                 rng=r_fine if perturb else None)
    rgb_f, sigma_f, delta_f = _field_at_z(
        field, params, rays_o, rays_d, z_f, times=times, train=train,
        rng=rng, max_level=max_level, grid_binary=grid_binary,
        grid_spec=grid_spec)

    # Merge the two sets sorted by z. lax.sort with one key and payload
    # operands is a lane-wise sorting network — no HBM gathers.
    z_all = jnp.concatenate([z_c, z_f], axis=1)              # [R, k1+k2]
    rgb_all = jnp.concatenate([rgb_c, rgb_f], axis=1)
    sigma_all = jnp.concatenate([sigma_cm, sigma_f * valid_ray[:, None]],
                                axis=1)
    ops = [z_all, sigma_all] + [rgb_all[..., i] for i in range(3)]
    if delta_c is not None:
        delta_all = jnp.concatenate([delta_c, delta_f], axis=1)
        ops += [delta_all[..., i] for i in range(3)]
    sorted_ops = jax.lax.sort(ops, dimension=1, num_keys=1)
    z_s, sigma_s = sorted_ops[0], sorted_ops[1]
    rgb_s = jnp.stack(sorted_ops[2:5], axis=-1)
    delta_s = (jnp.stack(sorted_ops[5:8], axis=-1)
               if delta_c is not None else None)

    diffs = z_s[:, 1:] - z_s[:, :-1]
    last = jnp.where(occ_far, 1e10, dbin)
    dists = jnp.concatenate([diffs, last[:, None]], axis=1) * norm

    rgb_map, depth_map, acc_map, _, extras = _composite_extras(
        rgb_s, sigma_s, z_s, rays_d, bg_color, dists, delta_s)
    return rgb_map, depth_map, acc_map, extras


def render_rays_z(
    field,
    params,
    rays_o: jnp.ndarray,
    rays_d: jnp.ndarray,
    *,
    z: jnp.ndarray,
    valid: jnp.ndarray,
    occ_far: jnp.ndarray,
    far: float,
    dbin: float,
    times: Optional[jnp.ndarray] = None,
    grid_binary: Optional[jnp.ndarray] = None,
    grid_spec: Optional[DensityGridSpec] = None,
    bg_color: Optional[jnp.ndarray] = None,
    train: bool = False,
    rng: Optional[jax.Array] = None,
    max_level: Optional[int] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, dict]:
    """Render rays at explicit ascending sample positions `z` [R, k]
    (importance placement, render/intervals.py::image_importance_cdf).

    Compositing distances are the forward z-differences — now KNOWN to be
    the reason this experimental mode measured 4-6 dB below the uniform
    occupancy CDF (round 3): at small k, samples clustered by the pdf get
    near-zero dz and their alpha collapses. The production paths
    (render_rays_hier sigma branch, render/block_fast.py) use
    measure-consistent pdf distances instead; porting them here requires
    image_importance_cdf to also emit its per-sample pdf. Kept
    experimental behind ImageRenderer(experimental=True).
    """
    if bg_color is None:
        bg_color = jnp.ones((3,), jnp.float32)

    rgb, sigma, delta = _field_at_z(
        field, params, rays_o, rays_d, z, times=times, train=train,
        rng=rng, max_level=max_level, grid_binary=grid_binary,
        grid_spec=grid_spec)
    sigma = sigma * valid.astype(jnp.float32)[:, None]

    norm = jnp.linalg.norm(rays_d, axis=-1, keepdims=True)
    diffs = z[:, 1:] - z[:, :-1]                            # [R, k-1]
    last = jnp.where(occ_far, 1e10, dbin)
    dists = jnp.concatenate([diffs, last[:, None]], axis=1) * norm

    rgb_map, depth_map, acc_map, _, extras = _composite_extras(
        rgb, sigma, z, rays_d, bg_color, dists, delta)
    return rgb_map, depth_map, acc_map, extras


def render_image(
    field,
    params,
    rays_o: jnp.ndarray,
    rays_d: jnp.ndarray,
    *,
    near: float,
    far: float,
    n_samples: int,
    chunk: int,
    time_scalar=None,
    grid_binary=None,
    grid_spec=None,
    bg_color=None,
    capacity: Optional[int] = None,
    ray_budget: Optional[int] = None,
    t0: Optional[jnp.ndarray] = None,
    t1: Optional[jnp.ndarray] = None,
    cdf: Optional[tuple] = None,
    zs: Optional[tuple] = None,
    n_probe: int = 128,
    k_fine: int = 0,
    max_level: Optional[int] = None,
    hier_coarse: str = "field",
) -> jnp.ndarray:
    """Render all given rays without perturbation, chunked via `lax.map`.

    Args:
      rays_o/rays_d: [N, 3] flattened image rays.
      chunk: rays per chunk (static).
      t0/t1: optional [N] per-ray occupied intervals (from
        render.intervals.image_intervals) — switches to interval sampling.
      cdf: optional (idx [N,k], n_occ [N], occ_far [N]) occupancy-CDF
        sample placement (render.intervals.image_occupancy_cdf) — switches
        to render_rays_cdf; n_probe is its z-bin count. With k_fine > 0
        the two-pass hierarchical path (render_rays_hier) adds k_fine
        weight-resampled samples per ray.
      hier_coarse: "field" evaluates the full field at the coarse
        placements and composites the merged set; "sigma" marches the
        field's cheap sigma estimate (Field.sigma_at, required) for
        placement only, and only the k_fine resampled depths pay full
        evaluations — the baked-field production configuration.
      zs: optional (z [N,k], valid [N], occ_far [N]) explicit importance
        sample positions (render.intervals.image_importance_cdf) —
        switches to render_rays_z.
      max_level: render-time LOD limit on hash-encoded fields.

    Returns rgb [N, 3] fp32. Callers reshape to [H, W, 3].
    """
    n = rays_o.shape[0]
    n_chunks = -(-n // chunk)
    pad = n_chunks * chunk - n
    ro = jnp.pad(rays_o, ((0, pad), (0, 0))).reshape(n_chunks, chunk, 3)
    # Pad dirs with ones to keep norms nonzero on padded rays.
    rd = jnp.pad(rays_d, ((0, pad), (0, 0)), constant_values=1.0)
    rd = rd.reshape(n_chunks, chunk, 3)

    times = None
    if field.needs_time:
        t = 0.0 if time_scalar is None else time_scalar
        times = jnp.full((chunk, 1), t, jnp.float32)

    if zs is not None:
        zv, validv, farv = zs
        zp = jnp.pad(zv, ((0, pad), (0, 0))).reshape(n_chunks, chunk, -1)
        vp = jnp.pad(validv, (0, pad)).reshape(n_chunks, chunk)
        fp = jnp.pad(farv, (0, pad)).reshape(n_chunks, chunk)
        dbin = (far - near) / n_probe

        def one_z(args):
            o, d, zz, vv, ff = args
            rgb_map, _, _, _ = render_rays_z(
                field, params, o, d, z=zz, valid=vv, occ_far=ff,
                far=far, dbin=dbin, times=times,
                grid_binary=grid_binary, grid_spec=grid_spec,
                bg_color=bg_color, train=False, max_level=max_level)
            return rgb_map

        rgb = jax.lax.map(one_z, (ro, rd, zp, vp, fp))
        return rgb.reshape(n_chunks * chunk, 3)[:n]

    if cdf is not None:
        idx, n_occ, occ_far = cdf
        # Padded rays get n_occ = 0 -> composited as pure background.
        idxp = jnp.pad(idx, ((0, pad), (0, 0))).reshape(n_chunks, chunk, -1)
        noccp = jnp.pad(n_occ, (0, pad)).reshape(n_chunks, chunk)
        farp = jnp.pad(occ_far, (0, pad)).reshape(n_chunks, chunk)

        if hier_coarse == "sigma" and field.sigma_at is None:
            raise ValueError(
                "hier_coarse='sigma' requires a field with a cheap sigma "
                "estimate (Field.sigma_at, e.g. a baked field)")
        sigma_at = field.sigma_at if hier_coarse == "sigma" else None

        def one_cdf(args):
            o, d, ii, no, of = args
            if k_fine > 0:
                rgb_map, _, _, _ = render_rays_hier(
                    field, params, o, d, idx=ii, n_occ=no, occ_far=of,
                    near=near, far=far, n_probe=n_probe, k_fine=k_fine,
                    perturb=False, times=times, grid_binary=grid_binary,
                    grid_spec=grid_spec, bg_color=bg_color, train=False,
                    max_level=max_level, sigma_at=sigma_at)
            else:
                rgb_map, _, _, _ = render_rays_cdf(
                    field, params, o, d, idx=ii, n_occ=no, occ_far=of,
                    near=near, far=far, n_probe=n_probe, perturb=False,
                    times=times, grid_binary=grid_binary,
                    grid_spec=grid_spec, bg_color=bg_color, train=False,
                    max_level=max_level)
            return rgb_map

        rgb = jax.lax.map(one_cdf, (ro, rd, idxp, noccp, farp))
        return rgb.reshape(n_chunks * chunk, 3)[:n]

    if t0 is not None:
        # Padded rays get empty intervals -> composited as pure background.
        t0p = jnp.pad(t0, (0, pad)).reshape(n_chunks, chunk)
        t1p = jnp.pad(t1, (0, pad)).reshape(n_chunks, chunk)

        def one_iv(args):
            o, d, a, b = args
            rgb_map, _, _, _ = render_rays_interval(
                field, params, o, d, t0=a, t1=b, n_samples=n_samples,
                far=far, perturb=False, times=times,
                grid_binary=grid_binary,
                grid_spec=grid_spec, bg_color=bg_color, train=False,
                max_level=max_level)
            return rgb_map

        rgb = jax.lax.map(one_iv, (ro, rd, t0p, t1p))
        return rgb.reshape(n_chunks * chunk, 3)[:n]

    def one(chunk_rays):
        o, d = chunk_rays
        rgb_map, _, _, _ = render_rays(
            field, params, o, d,
            near=near, far=far, n_samples=n_samples, perturb=False,
            times=times, grid_binary=grid_binary, grid_spec=grid_spec,
            bg_color=bg_color, train=False, capacity=capacity,
            ray_budget=ray_budget, max_level=max_level)
        return rgb_map

    rgb = jax.lax.map(one, (ro, rd)).reshape(n_chunks * chunk, 3)
    return rgb[:n]
