"""Baked-field rendering: exactness at vertices, trilinear interior,
end-to-end render parity against the live field."""

import jax
import jax.numpy as jnp
import numpy as np

from nerf_tpu.models import build_field
from nerf_tpu.models import decoders as D
from nerf_tpu.render.bake import (BakedSpec, bake_instant_field, baked_h,
                                  build_baked_field)
from nerf_tpu.render.density_grid import DensityGridSpec
from nerf_tpu.render.intervals import ray_intervals
from nerf_tpu.render.renderer import render_rays, render_rays_interval

CFG = {"mode": "part2_instant", "n_levels": 4, "log2_hashmap_size": 10,
       "hidden_dim": 16, "scene_bound": 1.5}


def _field_params(rng_key):
    field = build_field(CFG)
    params = jax.jit(field.init)(rng_key)
    return field, params


def _h_ref(field, params, pts):
    enc = field.encode_for_bake(params, pts)
    return np.asarray(D.mlp_apply(params["decoder"]["sigma_net"], enc)
                      .astype(jnp.float32))


def test_baked_h_exact_at_vertices(rng_key):
    field, params = _field_params(rng_key)
    spec = BakedSpec(resolution=33, bound=1.5)
    baked = bake_instant_field(field, params, spec, dtype=jnp.float32)

    lin = np.linspace(-1.5, 1.5, 33, dtype=np.float32)
    idx = np.array([[0, 0, 0], [32, 32, 32], [5, 17, 9], [31, 1, 30]])
    pts = jnp.asarray(lin[idx])
    got = np.asarray(baked_h(baked, pts, spec))
    np.testing.assert_allclose(got, _h_ref(field, params, pts),
                               rtol=2e-4, atol=2e-5)


def test_baked_h_is_trilinear_inside_cells(rng_key):
    """Midpoint of a cell = average of its 8 vertex values."""
    field, params = _field_params(rng_key)
    spec = BakedSpec(resolution=17, bound=1.5)
    baked = bake_instant_field(field, params, spec, dtype=jnp.float32)

    lin = np.linspace(-1.5, 1.5, 17, dtype=np.float32)
    cells = np.array([[2, 3, 4], [9, 14, 1], [15, 15, 15]])
    corners = np.stack(np.meshgrid([0, 1], [0, 1], [0, 1],
                                   indexing="ij"), -1).reshape(8, 3)
    for c in cells:
        vpts = jnp.asarray(lin[c[None, :] + corners])     # [8, 3]
        mid = jnp.asarray(lin[c] + (lin[c + 1] - lin[c]) * 0.5)[None, :]
        hv = np.asarray(baked_h(baked, vpts, spec))
        hm = np.asarray(baked_h(baked, mid, spec))
        np.testing.assert_allclose(hm[0], hv.mean(axis=0),
                                   rtol=2e-4, atol=2e-5)


def test_baked_render_matches_live_field(rng_key):
    """Interval render through the baked field vs the live field: a bake at
    resolution >> the hash grid's finest level is near-lossless."""
    field, params = _field_params(rng_key)   # finest level res 54
    bspec = BakedSpec(resolution=160, bound=1.5)
    baked = bake_instant_field(field, params, bspec, dtype=jnp.float32)
    bfield = build_baked_field(bspec, L_dir=CFG.get("L_embed_dir", 4),
                               compute_dtype=jnp.float32)

    gspec = DensityGridSpec(resolution=16, bound=1.5, threshold=0.01)
    binary = jnp.ones((16, 16, 16), bool)
    n = 32
    ro = jnp.broadcast_to(jnp.asarray([2.5, 0.0, 0.0]), (n, 3))
    rd = jax.random.normal(rng_key, (n, 3)) * 0.12 \
        + jnp.asarray([-1.0, 0.0, 0.0])
    near, far = 0.5, 4.5
    bg = jnp.asarray([0.1, 0.2, 0.3])
    t0, t1 = ray_intervals(binary, gspec, ro, rd, near, far, 128)

    kw = dict(t0=t0, t1=t1, n_samples=64, far=far, bg_color=bg)
    live = render_rays_interval(field, params, ro, rd, **kw)
    bkd = render_rays_interval(bfield, baked, ro, rd, **kw)
    np.testing.assert_allclose(np.asarray(bkd[0]), np.asarray(live[0]),
                               atol=0.02)


def test_bake_folds_occupancy_pruning(rng_key):
    """Vertices in pruned voxels must render as empty space."""
    field, params = _field_params(rng_key)
    gspec = DensityGridSpec(resolution=16, bound=1.5, threshold=0.01)
    binary = jnp.zeros((16, 16, 16), bool)   # everything pruned
    bspec = BakedSpec(resolution=33, bound=1.5)
    baked = bake_instant_field(field, params, bspec, grid_binary=binary,
                               grid_spec=gspec, dtype=jnp.float32)
    bfield = build_baked_field(bspec, compute_dtype=jnp.float32)
    pts = jax.random.uniform(rng_key, (64, 3), jnp.float32, -1.4, 1.4)
    dirs = jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0]), (64, 3))
    _, sigma = bfield.apply(baked, pts, dirs)
    assert float(jnp.max(sigma)) < 1e-8


def test_int8_bake_close_to_fp32(rng_key):
    """int8 affine-quantized tables: per-channel step = range/254, so the
    interpolated h must match the fp32 bake within ~a quantization step."""
    field, params = _field_params(rng_key)
    spec = BakedSpec(resolution=17, bound=1.5)
    ref = bake_instant_field(field, params, spec, dtype=jnp.float32)
    q8 = bake_instant_field(field, params, spec, dtype=jnp.int8)
    assert q8["cells"].dtype == jnp.int8
    assert q8["qscale"].shape == (16,)

    pts = jax.random.uniform(rng_key, (256, 3), jnp.float32, -1.4, 1.4)
    h_ref = np.asarray(baked_h(ref, pts, spec))
    h_q = np.asarray(baked_h(q8, pts, spec))
    step = np.asarray(q8["qscale"])
    # bf16 storage of the dense volume + int8 rounding: allow 2 steps
    assert np.all(np.abs(h_q - h_ref) <= 2.0 * step[None, :] + 1e-3), \
        float(np.abs(h_q - h_ref).max())


def test_apply_grouped_matches_apply(rng_key):
    """The per-ray grouped evaluation must equal flat apply (the first
    color layer is linear in its concatenated input)."""
    import numpy as np
    from nerf_tpu.models import build_field
    from nerf_tpu.render.bake import (BakedSpec, bake_instant_field,
                                      build_baked_field)
    cfg = {"mode": "part2_instant", "n_levels": 3, "log2_hashmap_size": 9,
           "hidden_dim": 16, "scene_bound": 1.0}
    field = build_field(cfg)
    params = jax.jit(field.init)(rng_key)
    spec = BakedSpec(resolution=24, bound=1.0)
    baked = bake_instant_field(field, params, spec, dtype=jnp.bfloat16)
    bfield = build_baked_field(spec, compute_dtype=jnp.float32)

    r, k = 32, 6
    kp, kd = jax.random.split(rng_key)
    pts = jax.random.uniform(kp, (r, k, 3), minval=-1.0, maxval=1.0)
    dirs = jax.random.normal(kd, (r, 3))
    dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
    dirs_flat = jnp.broadcast_to(dirs[:, None, :], (r, k, 3)).reshape(-1, 3)

    rgb_f, sig_f = bfield.apply(baked, pts.reshape(-1, 3), dirs_flat)
    rgb_g, sig_g = bfield.apply_grouped(baked, pts, dirs)
    np.testing.assert_allclose(np.asarray(sig_g), np.asarray(sig_f),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(rgb_g), np.asarray(rgb_f),
                               rtol=1e-4, atol=1e-5)


def test_sigma_vol_nearest_matches_vertex_sigma(rng_key):
    """The sigma-only volume at vertex positions must equal
    softplus(h0 - 5) of the full bake there (up to int8 quantization)."""
    from nerf_tpu.render.bake import baked_sigma_nn
    field, params = _field_params(rng_key)
    spec = BakedSpec(resolution=33, bound=1.5)
    baked = bake_instant_field(field, params, spec, dtype=jnp.float32)
    assert baked["sigma_vol"].shape == (33 ** 3,)

    lin = np.linspace(-1.5, 1.5, 33, dtype=np.float32)
    idx = np.array([[0, 0, 0], [32, 32, 32], [5, 17, 9], [31, 1, 30]])
    pts = jnp.asarray(lin[idx])
    got = np.asarray(baked_sigma_nn(baked, pts, spec))
    want = np.asarray(jax.nn.softplus(
        jnp.asarray(_h_ref(field, params, pts))[:, 0] - 5.0))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)

    # int8 path dequantizes channel 0 with its own scale.
    q8 = bake_instant_field(field, params, spec, dtype=jnp.int8)
    got_q = np.asarray(baked_sigma_nn(q8, pts, spec))
    step = float(np.asarray(q8["qscale"])[0])
    assert np.all(np.abs(np.log(got_q + 1e-12) - np.log(want + 1e-12))
                  <= 4.0 * step + 1e-2)


def test_hier_sigma_coarse_close_to_dense(rng_key):
    """Cheap-coarse hierarchical rendering (sigma_at placement, fine-only
    composite) must stay close to the dense interval render on a baked
    field, and empty rays must composite to pure background."""
    from nerf_tpu.render.renderer import render_rays_hier
    from nerf_tpu.render.intervals import image_occupancy_cdf

    field, params = _field_params(rng_key)
    # Random-init h0 ~ 0 gives sigma ~ softplus(-5) ~ 0.007 — no surface
    # anywhere. Bias the sigma net's output so the volume has real density
    # (sigma ~ softplus(1) ~ 1.3) and the slab boundary forms a surface.
    params = jax.tree.map(lambda x: x, params)
    b = params["decoder"]["sigma_net"][-1]["b"]
    params["decoder"]["sigma_net"][-1]["b"] = \
        b.at[0].set(b[0] + 6.0)
    gspec = DensityGridSpec(resolution=16, bound=1.5, threshold=0.01)
    # Middle slab along x: rays (marching -x from x=2.5) terminate inside
    # it, so occ_far stays False and the catch-all dist never fires. The
    # bake folds the pruning (production config) so the field is zero
    # outside the slab and all sampling schemes integrate the SAME field —
    # the biased sigma net is dense throughout the volume otherwise.
    binary = jnp.zeros((16, 16, 16), bool).at[6:10].set(True)
    bspec = BakedSpec(resolution=160, bound=1.5)
    baked = bake_instant_field(field, params, bspec, grid_binary=binary,
                               grid_spec=gspec, dtype=jnp.float32)
    bfield = build_baked_field(bspec, L_dir=CFG.get("L_embed_dir", 4),
                               compute_dtype=jnp.float32)
    assert bfield.sigma_at is not None

    n, near, far = 64, 0.5, 4.5
    side = 8
    ro = jnp.broadcast_to(jnp.asarray([2.5, 0.0, 0.0]), (side, side, 3))
    rd = jax.random.normal(rng_key, (side, side, 3)) * 0.12 \
        + jnp.asarray([-1.0, 0.0, 0.0])
    bg = jnp.asarray([0.1, 0.2, 0.3])

    idx, n_occ, occ_far = image_occupancy_cdf(
        binary, gspec, ro, rd, near, far, 32, block=2, n_probe=96)
    flat = lambda a: a.reshape(n, *a.shape[2:])
    rgb_hier, _, _, _ = render_rays_hier(
        bfield, baked, flat(ro), flat(rd), idx=flat(idx),
        n_occ=flat(n_occ), occ_far=flat(occ_far), near=near, far=far,
        n_probe=96, k_fine=32, bg_color=bg, sigma_at=bfield.sigma_at)

    t0, t1 = ray_intervals(binary, gspec, flat(ro), flat(rd),
                           near, far, 128)
    dense = render_rays_interval(bfield, baked, flat(ro), flat(rd),
                                 t0=t0, t1=t1, n_samples=128, far=far,
                                 bg_color=bg)[0]
    err = float(jnp.mean(jnp.abs(rgb_hier - dense)))
    assert err < 0.03, err

    # All-empty grid: every ray must be exactly background.
    idx0, nocc0, far0 = image_occupancy_cdf(
        jnp.zeros((16, 16, 16), bool), gspec, ro, rd, near, far, 32,
        block=2, n_probe=96)
    rgb0, _, _, _ = render_rays_hier(
        bfield, baked, flat(ro), flat(rd), idx=flat(idx0),
        n_occ=flat(nocc0), occ_far=flat(far0), near=near, far=far,
        n_probe=96, k_fine=32, bg_color=bg, sigma_at=bfield.sigma_at)
    np.testing.assert_allclose(np.asarray(rgb0),
                               np.broadcast_to(np.asarray(bg), (n, 3)),
                               atol=1e-5)


def test_trilerp_fold_matches_reduce(rng_key, monkeypatch):
    """The factorized lane-slice fold is the same trilinear interpolation
    as the corner reduce: exact for f32 tables (associativity only), and
    within the int8 quantization floor for int8 tables in every mode."""
    field, params = _field_params(rng_key)
    spec = BakedSpec(resolution=17, bound=1.5)
    pts = jax.random.uniform(jax.random.PRNGKey(3), (256, 3),
                             jnp.float32, -1.6, 1.6)

    for dtype in (jnp.float32, jnp.int8):
        baked = bake_instant_field(field, params, spec, dtype=dtype)
        monkeypatch.setenv("BAKED_TRILERP", "reduce")
        h_reduce = np.asarray(baked_h(baked, pts, spec))
        monkeypatch.setenv("BAKED_TRILERP", "foldf32")
        h_foldf32 = np.asarray(baked_h(baked, pts, spec))
        monkeypatch.setenv("BAKED_TRILERP", "fold")
        h_fold = np.asarray(baked_h(baked, pts, spec))

        scale = max(1e-6, float(np.abs(h_reduce).max()))
        if dtype == jnp.float32:
            np.testing.assert_allclose(h_foldf32, h_reduce,
                                       rtol=1e-5, atol=1e-5 * scale)
            np.testing.assert_allclose(h_fold, h_reduce,
                                       rtol=1e-5, atol=1e-5 * scale)
        else:
            # bf16 fold roundoff stays under ~1% of the value range
            # (measured 0.76% max on worst-case random rows); foldf32 is
            # bf16-reduce-class.
            assert np.abs(h_foldf32 - h_reduce).max() < 0.01 * scale
            assert np.abs(h_fold - h_reduce).max() < 0.015 * scale
