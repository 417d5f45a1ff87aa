"""Occupancy-CDF sample placement (render/intervals.py::image_occupancy_cdf
+ renderer.render_rays_cdf).

The CDF sampler distributes the per-ray budget evenly over the occupied
z-bins instead of uniformly over the [t0, t1] hull, so rays whose occupied
set has gaps (multi-object scenes) spend no samples on free space. Contracts
pinned here: (1) uniform occupancy reproduces even spacing, (2) gap scenes
place every sample inside an occupied slab and none in the gap, (3) empty
rays composite to pure background, (4) the full ImageRenderer cdf mode
converges to the dense masked integral.
"""

import jax
import jax.numpy as jnp
import numpy as np

from nerf_tpu.models import build_field
from nerf_tpu.render.density_grid import DensityGridSpec
from nerf_tpu.render.intervals import image_occupancy_cdf, tile_occupancy
from nerf_tpu.render.renderer import render_rays_cdf
from nerf_tpu.render.rays import camera_directions, rays_from_pose
from nerf_tpu.train.common import ImageRenderer

CFG = {"mode": "part2_instant", "n_levels": 4, "log2_hashmap_size": 10,
       "hidden_dim": 16, "scene_bound": 1.5}


def _axis_rays(h, w, origin=(3.0, 0.0, 0.0), direction=(-1.0, 0.0, 0.0)):
    ro = jnp.broadcast_to(jnp.asarray(origin, jnp.float32), (h, w, 3))
    rd = jnp.broadcast_to(jnp.asarray(direction, jnp.float32), (h, w, 3))
    return ro, rd


def test_cdf_uniform_occupancy_is_even_spacing():
    spec = DensityGridSpec(resolution=16, bound=4.0, threshold=0.01)
    binary = jnp.ones((16, 16, 16), bool)
    ro, rd = _axis_rays(8, 8)
    near, far, P, k = 0.5, 4.5, 64, 16
    idx, n_occ, occ_far = image_occupancy_cdf(
        binary, spec, ro, rd, near, far, k,
        block=2, n_probe=P, dilate=0)
    assert idx.shape == (8, 8, k)
    np.testing.assert_array_equal(np.asarray(n_occ), P)
    assert bool(np.all(np.asarray(occ_far)))
    # Sample j sits at the u_j = (j+0.5)/k * P occupied-units quantile;
    # with c_p = p+1 that is bin #{p: p+1 < u_j} = ceil(u_j) - 1.
    u = (np.arange(k) + 0.5) / k * P
    expect = (np.ceil(u) - 1).astype(np.int32)
    np.testing.assert_array_equal(np.asarray(idx[4, 4]), expect)


def test_cdf_gap_scene_skips_the_gap():
    """Two slabs along x with a gap between: every sample must land in a
    slab, none in the gap, and both slabs must receive samples."""
    r = 32
    spec = DensityGridSpec(resolution=r, bound=1.5, threshold=0.01)
    lin = np.linspace(-1.5, 1.5, r, dtype=np.float32)
    occ = (np.abs(lin) >= 0.5)                       # x in [-1.5,-.5]+[.5,1.5]
    binary = jnp.asarray(np.broadcast_to(occ[:, None, None], (r, r, r)))

    ro, rd = _axis_rays(8, 8)                        # x = 3 - z
    # far reaches past the volume (x = -2.5) so the ray exits into free
    # space and the catch-all flag must be off.
    near, far, P, k = 0.5, 5.5, 128, 24
    idx, n_occ, occ_far = image_occupancy_cdf(
        binary, spec, ro, rd, near, far, k, block=2, n_probe=P, dilate=0)
    dbin = (far - near) / P
    z = near + (np.asarray(idx[0, 0]).astype(np.float64) + 0.5) * dbin
    x = 3.0 - z
    voxel = 3.0 / r
    # slabs: |x| >= 0.5 (one voxel of slack for bin/voxel quantization)
    assert np.all(np.abs(x) >= 0.5 - voxel - dbin), f"sample in gap: {x}"
    assert np.any(x > 0.5), "near slab unsampled"
    assert np.any(x < -0.5), "far slab unsampled"
    # occupancy count ~ both slab crossings: 2 x 1.0 length / dbin bins
    assert 1.6 / dbin <= float(n_occ[0, 0]) <= 2.4 / dbin
    assert not bool(occ_far[0, 0])                   # exits into free space


def test_cdf_empty_rays_are_background(rng_key):
    field = build_field(CFG)
    params = jax.jit(field.init)(rng_key)
    n, k = 8, 12
    ro = jnp.broadcast_to(jnp.asarray([2.5, 0.0, 0.0]), (n, 3))
    rd = jnp.broadcast_to(jnp.asarray([-1.0, 0.0, 0.0]), (n, 3))
    bg = jnp.asarray([0.2, 0.5, 0.7])
    rgb, depth, acc, _ = render_rays_cdf(
        field, params, ro, rd,
        idx=jnp.zeros((n, k), jnp.int32), n_occ=jnp.zeros((n,)),
        occ_far=jnp.zeros((n,), bool), near=0.5, far=4.5, n_probe=64,
        bg_color=bg)
    np.testing.assert_allclose(np.asarray(rgb),
                               np.tile(np.asarray(bg), (n, 1)), atol=1e-6)
    np.testing.assert_allclose(np.asarray(acc), 0.0, atol=1e-6)


def test_image_renderer_cdf_mode_close_to_dense(rng_key):
    """Full ImageRenderer pipeline: cdf mode within tolerance of the dense
    masked render on a sphere-occupancy scene, at a small budget."""
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
    cdf = ImageRenderer(field, n_samples=64, sampling="cdf",
                        interval_probes=192, **kw)(
        params, ro, rd, grid_binary=binary)
    err = float(jnp.max(jnp.abs(dense - cdf)))
    assert err < 0.05, f"cdf render deviates by {err}"


def test_cdf_mode_dynamic_field_smoke(rng_key):
    """cdf mode through a time-conditioned field (part3-instant)."""
    cfg = {"mode": "part3", "canonical_type": "instant", "n_levels": 3,
           "log2_hashmap_size": 9, "hidden_dim": 16,
           "deform_hidden_dim": 16, "L_embed_time": 4, "scene_bound": 1.5}
    field = build_field(cfg)
    params = jax.jit(field.init)(rng_key)
    spec = DensityGridSpec(resolution=8, bound=1.5, threshold=0.01)
    binary = jnp.ones((8, 8, 8), bool)
    H = W = 8
    dirs = camera_directions(H, W, 0.5 * W / np.tan(0.35))
    pose = jnp.eye(4).at[0, 3].set(3.0).at[:3, :3].set(
        jnp.asarray([[0., 0., 1.], [0., 1., 0.], [-1., 0., 0.]]))
    ro, rd = rays_from_pose(dirs, pose)
    out = ImageRenderer(field, near=1.0, far=5.0, chunk=64, n_samples=8,
                        sampling="cdf", interval_probes=32, grid_spec=spec)(
        params, ro, rd, time=0.3, grid_binary=binary)
    assert out.shape == (H, W, 3)
    assert bool(jnp.all(jnp.isfinite(out)))


def test_importance_cdf_concentrates_at_surface():
    """With a high-density slab at known depth, most samples must land
    near the slab entry; occupied bins elsewhere keep floor coverage."""
    from nerf_tpu.render.intervals import image_importance_cdf
    r = 32
    spec = DensityGridSpec(resolution=r, bound=1.5, threshold=0.01)
    lin = np.linspace(-1.5, 1.5, r, dtype=np.float32)
    occ = np.abs(lin) <= 1.4                       # nearly all occupied
    binary = jnp.asarray(np.broadcast_to(occ[:, None, None], (r, r, r)))
    # opaque wall at x in [0.0, 0.2]; elsewhere tiny density
    dens = np.where((lin >= 0.0) & (lin <= 0.2), 50.0, 0.02).astype(
        np.float32)
    density = jnp.asarray(np.broadcast_to(dens[:, None, None], (r, r, r)))

    ro, rd = _axis_rays(8, 8)                      # x = 3 - z
    near, far, P, k = 0.5, 5.5, 128, 16
    z, valid, occ_far = image_importance_cdf(
        binary, density, spec, ro, rd, near, far, k,
        block=2, n_probe=P, dilate=0, floor=0.1)
    assert bool(valid[0, 0])
    zs = np.asarray(z[0, 0])
    assert np.all(np.diff(zs) >= -1e-5), "samples must be ascending"
    x = 3.0 - zs
    # wall entry at x=0.2 <-> z=2.8; most samples near the wall
    near_wall = np.sum((x >= -0.3) & (x <= 0.5))
    assert near_wall >= k * 0.6, f"only {near_wall}/{k} samples near wall"
    # floor keeps coverage before the wall (the visible approach region)
    assert np.any(x > 0.6), "no floor coverage in the approach region"


def test_importance_render_close_to_dense(rng_key):
    """Full ImageRenderer importance mode vs dense masked on the sphere
    scene, at a small budget (the sphere's density grid profile)."""
    field = build_field(CFG)
    params = jax.jit(field.init)(rng_key)
    spec = DensityGridSpec(resolution=32, bound=1.5, threshold=0.01)
    lin = np.linspace(-1.5, 1.5, 32, dtype=np.float32)
    xx, yy, zz = np.meshgrid(lin, lin, lin, indexing="ij")
    inside = (xx**2 + yy**2 + zz**2) < 0.8**2
    binary = jnp.asarray(inside)
    # density profile: query the actual field at the grid centers so the
    # importance weights reflect the true sigma
    pts = jnp.asarray(np.stack([xx, yy, zz], -1).reshape(-1, 3))
    dirs0 = jnp.zeros_like(pts)
    _, sig = field.apply(params, pts, dirs0)
    density = sig.reshape(32, 32, 32) * binary

    H = W = 24
    dirs = camera_directions(H, W, 0.5 * W / np.tan(0.35))
    pose = jnp.eye(4).at[0, 3].set(3.0).at[:3, :3].set(
        jnp.asarray([[0., 0., 1.], [0., 1., 0.], [-1., 0., 0.]]))
    ro, rd = rays_from_pose(dirs, pose)

    kw = dict(near=1.0, far=5.0, chunk=256, grid_spec=spec)
    dense = ImageRenderer(field, n_samples=192, **kw)(
        params, ro, rd, grid_binary=binary)
    imp = ImageRenderer(field, n_samples=48, sampling="importance",
                        experimental=True,
                        interval_probes=192, **kw)(
        params, ro, rd, grid_binary=binary, grid_density=density)
    err = float(jnp.mean(jnp.abs(dense - imp)))
    assert err < 0.02, f"importance render deviates by mean {err}"


def test_hier_mode_close_to_dense(rng_key):
    """Two-pass hierarchical (cdf coarse + weight-resampled fine) within
    tolerance of the dense masked render at a small total budget, and at
    least as close as the flat cdf at the same budget."""
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
    hier = ImageRenderer(field, n_samples=16, fine_samples=16,
                         sampling="cdf", interval_probes=192, **kw)(
        params, ro, rd, grid_binary=binary)
    flat = ImageRenderer(field, n_samples=32, sampling="cdf",
                         interval_probes=192, **kw)(
        params, ro, rd, grid_binary=binary)
    err_hier = float(jnp.mean(jnp.abs(dense - hier)))
    err_flat = float(jnp.mean(jnp.abs(dense - flat)))
    assert err_hier < 0.03, f"hier render deviates by mean {err_hier}"
    assert err_hier <= err_flat * 1.5, (err_hier, err_flat)


def test_hier_empty_rays_are_background(rng_key):
    from nerf_tpu.render.renderer import render_rays_hier
    field = build_field(CFG)
    params = jax.jit(field.init)(rng_key)
    n, k = 8, 8
    ro = jnp.broadcast_to(jnp.asarray([2.5, 0.0, 0.0]), (n, 3))
    rd = jnp.broadcast_to(jnp.asarray([-1.0, 0.0, 0.0]), (n, 3))
    bg = jnp.asarray([0.2, 0.5, 0.7])
    rgb, depth, acc, _ = render_rays_hier(
        field, params, ro, rd,
        idx=jnp.zeros((n, k), jnp.int32), n_occ=jnp.zeros((n,)),
        occ_far=jnp.zeros((n,), bool), near=0.5, far=4.5, n_probe=64,
        k_fine=8, bg_color=bg)
    np.testing.assert_allclose(np.asarray(rgb),
                               np.tile(np.asarray(bg), (n, 1)), atol=1e-6)
    np.testing.assert_allclose(np.asarray(acc), 0.0, atol=1e-6)


def test_resample_from_weights_targets_peak():
    """Fine samples concentrate where the coarse weights peak and stay
    inside the coarse bin extent."""
    from nerf_tpu.render.renderer import _resample_from_weights
    z = jnp.broadcast_to(jnp.linspace(1.0, 4.0, 16), (4, 16))
    w = jnp.zeros((4, 16)).at[:, 5].set(1.0)       # peak at z ~ 2.0
    zf = _resample_from_weights(z, w, 12, floor=0.01)
    assert zf.shape == (4, 12)
    frac_near_peak = float(jnp.mean((jnp.abs(zf - z[:, 5:6]) < 0.25)
                                    .astype(jnp.float32)))
    assert frac_near_peak > 0.7, frac_near_peak
    assert float(zf.min()) >= 0.9 and float(zf.max()) <= 4.1
