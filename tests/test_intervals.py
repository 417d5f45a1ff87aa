"""Interval-based fast eval rendering: conservativeness + integral parity.

The interval renderer (render/intervals.py, renderer.render_rays_interval)
replaces dense sampling + occupancy masking at eval time. These tests pin
its two contracts: (1) per-ray intervals CONSERVATIVELY cover every occupied
voxel any ray in the tile can see, and (2) the composited result converges
to the dense masked integral.
"""

import jax
import jax.numpy as jnp
import numpy as np

from nerf_tpu.models import build_field
from nerf_tpu.render.density_grid import DensityGridSpec, grid_active_mask
from nerf_tpu.render.intervals import (dilate_binary, image_intervals,
                                       ray_intervals)
from nerf_tpu.render.renderer import render_rays, render_rays_interval
from nerf_tpu.train.common import ImageRenderer
from nerf_tpu.render.rays import camera_directions, rays_from_pose

CFG = {"mode": "part2_instant", "n_levels": 4, "log2_hashmap_size": 10,
       "hidden_dim": 16, "scene_bound": 1.5}


def test_dilate_binary_grows_one_voxel():
    b = jnp.zeros((8, 8, 8), bool).at[4, 4, 4].set(True)
    d = dilate_binary(b, 1)
    assert bool(d[3, 3, 3]) and bool(d[5, 5, 5]) and bool(d[4, 4, 5])
    assert not bool(d[2, 4, 4]) and not bool(d[4, 4, 6])
    assert int(d.sum()) == 27


def test_ray_intervals_cover_all_active_samples(rng_key):
    spec = DensityGridSpec(resolution=16, bound=1.5, threshold=0.01)
    binary = jax.random.bernoulli(rng_key, 0.08, (16, 16, 16))
    n = 64
    ro = jnp.broadcast_to(jnp.asarray([2.5, 0.0, 0.0]), (n, 3))
    rd = jax.random.normal(rng_key, (n, 3)) * 0.2 \
        + jnp.asarray([-1.0, 0.0, 0.0])
    near, far, probes = 0.5, 4.5, 256
    # Probe the dilated grid, as production does: point-probing the raw grid
    # can miss corner-grazing intersections shorter than the probe spacing;
    # one voxel of dilation makes every crossing at least a voxel long.
    t0, t1 = ray_intervals(dilate_binary(binary, 1), spec, ro, rd,
                           near, far, probes)

    # dense ground truth: every active sample's z must lie in [t0, t1]
    z = jnp.linspace(near, far, 512)
    pts = ro[:, None, :] + rd[:, None, :] * z[None, :, None]
    m = np.asarray(grid_active_mask(binary, pts.reshape(-1, 3), spec)
                   ).reshape(n, 512)
    t0n, t1n = np.asarray(t0), np.asarray(t1)
    zn = np.asarray(z)
    # probe spacing limits accuracy: allow half a probe step of slack
    slack = (far - near) / (probes - 1)
    for r in range(n):
        act = zn[m[r]]
        # Conservativeness is one-sided: every active sample is covered.
        # (Rays with no actives may still get non-empty intervals from the
        # dilation margin — allowed, they only cost wasted samples.)
        if act.size:
            assert act.min() >= t0n[r] - slack
            assert act.max() <= t1n[r] + slack


def test_image_intervals_conservative_across_tiles(rng_key):
    """Per-pixel intervals from block-coarse probing must cover what exact
    per-ray probing finds (the 3x3 tile union + dilation guarantee)."""
    spec = DensityGridSpec(resolution=32, bound=1.5, threshold=0.01)
    lin = np.linspace(-1.5, 1.5, 32, dtype=np.float32)
    xx, yy, zz = np.meshgrid(lin, lin, lin, indexing="ij")
    binary = jnp.asarray((xx**2 + yy**2 + zz**2) < 0.8**2)

    H = W = 32
    dirs = camera_directions(H, W, 0.5 * W / np.tan(0.35))
    pose = jnp.eye(4).at[0, 3].set(3.0).at[:3, :3].set(
        jnp.asarray([[0., 0., 1.], [0., 1., 0.], [-1., 0., 0.]]))
    ro, rd = rays_from_pose(dirs, pose)
    near, far = 1.0, 5.0

    t0, t1 = image_intervals(binary, spec, ro, rd, near, far,
                             block=4, n_probe=96, dilate=1)
    # exact per-pixel intervals on the UNdilated grid
    e0, e1 = ray_intervals(binary, spec, ro.reshape(-1, 3),
                           rd.reshape(-1, 3), near, far, 256)
    e0 = np.asarray(e0).reshape(H, W)
    e1 = np.asarray(e1).reshape(H, W)
    t0n, t1n = np.asarray(t0), np.asarray(t1)
    hit = e1 > e0
    slack = (far - near) / 95
    assert np.all(t0n[hit] <= e0[hit] + slack)
    assert np.all(t1n[hit] >= e1[hit] - slack)


def test_interval_render_empty_grid_is_background(rng_key):
    field = build_field(CFG)
    params = jax.jit(field.init)(rng_key)
    n = 8
    ro = jnp.broadcast_to(jnp.asarray([2.5, 0.0, 0.0]), (n, 3))
    rd = jnp.broadcast_to(jnp.asarray([-1.0, 0.0, 0.0]), (n, 3))
    bg = jnp.asarray([0.2, 0.5, 0.7])
    t0 = jnp.full((n,), 2.0)
    t1 = jnp.full((n,), 2.0)   # empty intervals
    rgb, depth, acc, _ = render_rays_interval(
        field, params, ro, rd, t0=t0, t1=t1, n_samples=16, bg_color=bg)
    np.testing.assert_allclose(np.asarray(rgb),
                               np.tile(np.asarray(bg), (n, 1)), atol=1e-6)
    np.testing.assert_allclose(np.asarray(acc), 0.0, atol=1e-6)


def test_interval_render_converges_to_dense(rng_key):
    """On a full-interval scene the interval integral must converge to the
    dense masked integral as the budgets grow (same integrand, different
    quadrature points)."""
    field = build_field(CFG)
    params = jax.jit(field.init)(rng_key)
    spec = DensityGridSpec(resolution=16, bound=1.5, threshold=0.01)
    binary = jnp.ones((16, 16, 16), bool)

    n = 16
    ro = jnp.broadcast_to(jnp.asarray([2.5, 0.0, 0.0]), (n, 3))
    rd = jax.random.normal(rng_key, (n, 3)) * 0.1 \
        + jnp.asarray([-1.0, 0.0, 0.0])
    near, far = 0.5, 4.5
    bg = jnp.asarray([0.1, 0.2, 0.3])

    dense = render_rays(field, params, ro, rd, near=near, far=far,
                        n_samples=256, perturb=False, grid_binary=binary,
                        grid_spec=spec, bg_color=bg)
    t0, t1 = ray_intervals(binary, spec, ro, rd, near, far, 128)
    ivl = render_rays_interval(field, params, ro, rd, t0=t0, t1=t1,
                               n_samples=256, far=far, grid_binary=binary,
                               grid_spec=spec, bg_color=bg)
    np.testing.assert_allclose(np.asarray(ivl[0]), np.asarray(dense[0]),
                               atol=0.015)
    np.testing.assert_allclose(np.asarray(ivl[2]), np.asarray(dense[2]),
                               atol=0.015)


def test_image_renderer_interval_mode_close_to_dense(rng_key):
    """Full ImageRenderer pipeline: interval mode within tolerance of the
    dense masked render on a sphere-occupancy scene."""
    field = build_field(CFG)
    params = jax.jit(field.init)(rng_key)
    spec = DensityGridSpec(resolution=32, bound=1.5, threshold=0.01)
    lin = np.linspace(-1.5, 1.5, 32, dtype=np.float32)
    xx, yy, zz = np.meshgrid(lin, lin, lin, indexing="ij")
    binary = jnp.asarray((xx**2 + yy**2 + zz**2) < 0.8**2)

    H = W = 24
    dirs = camera_directions(H, W, 0.5 * W / np.tan(0.35))
    pose = jnp.eye(4).at[0, 3].set(3.0).at[:3, :3].set(
        jnp.asarray([[0., 0., 1.], [0., 1., 0.], [-1., 0., 0.]]))
    ro, rd = rays_from_pose(dirs, pose)

    kw = dict(near=1.0, far=5.0, chunk=256, grid_spec=spec)
    dense = ImageRenderer(field, n_samples=192, **kw)(
        params, ro, rd, grid_binary=binary)
    ivl = ImageRenderer(field, n_samples=192, sampling="interval",
                        interval_probes=96, **kw)(
        params, ro, rd, grid_binary=binary)
    err = float(jnp.max(jnp.abs(dense - ivl)))
    assert err < 0.03, f"interval render deviates by {err}"


def test_max_level_zero_matches_full_when_levels_unused(rng_key):
    """max_level >= n_levels must be a no-op."""
    field = build_field(CFG)
    params = jax.jit(field.init)(rng_key)
    pts = jax.random.uniform(rng_key, (32, 3), jnp.float32, -1.0, 1.0)
    dirs = jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0]), (32, 3))
    a = field.apply(params, pts, dirs)
    b = field.apply(params, pts, dirs, max_level=CFG["n_levels"])
    np.testing.assert_allclose(np.asarray(a[1]), np.asarray(b[1]), atol=0)
