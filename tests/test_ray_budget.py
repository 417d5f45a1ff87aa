"""Per-ray budgeted rendering vs dense masked rendering."""

import jax
import jax.numpy as jnp
import numpy as np

from nerf_tpu.models import build_field
from nerf_tpu.render.density_grid import DensityGridSpec
from nerf_tpu.render.renderer import _select_k_per_ray, render_rays

CFG = {"mode": "part2_instant", "n_levels": 4, "log2_hashmap_size": 10,
       "hidden_dim": 16, "scene_bound": 1.5}


def test_select_k_per_ray_exact():
    mask = jnp.asarray([
        [0, 1, 0, 1, 1, 0],
        [1, 1, 1, 1, 1, 1],
        [0, 0, 0, 0, 0, 0],
    ], bool)
    idx, valid = _select_k_per_ray(mask, 3)
    np.testing.assert_array_equal(np.asarray(idx[0]), [1, 3, 4])
    np.testing.assert_array_equal(np.asarray(valid[0]), [1, 1, 1])
    np.testing.assert_array_equal(np.asarray(idx[1]), [0, 1, 2])
    np.testing.assert_array_equal(np.asarray(valid[2]), [0, 0, 0])


def test_budget_matches_mask_path(rng_key):
    """When every ray has <= k active samples, the budgeted integral must
    equal the dense masked one exactly (eval mode, no perturbation)."""
    field = build_field(CFG)
    params = jax.jit(field.init)(rng_key)
    spec = DensityGridSpec(resolution=16, bound=1.5, threshold=0.01)
    # sparse random grid -> few active samples per ray
    binary = jax.random.bernoulli(rng_key, 0.10, (16, 16, 16))

    n = 16
    ro = jnp.broadcast_to(jnp.asarray([2.5, 0.0, 0.0]), (n, 3))
    rd = jax.random.normal(rng_key, (n, 3)) * 0.15 \
        + jnp.asarray([-1.0, 0.0, 0.0])

    kw = dict(near=0.5, far=4.0, n_samples=32, perturb=False,
              grid_binary=binary, grid_spec=spec,
              bg_color=jnp.asarray([0.2, 0.3, 0.4]))
    dense = render_rays(field, params, ro, rd, **kw)
    budget = render_rays(field, params, ro, rd, ray_budget=32, **kw)
    for a, b in zip(dense[:3], budget[:3]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)


def test_budget_truncation_bounded(rng_key):
    """With k smaller than the active count the result degrades gracefully
    (finite, acc <= dense acc)."""
    field = build_field(CFG)
    params = jax.jit(field.init)(rng_key)
    spec = DensityGridSpec(resolution=16, bound=1.5, threshold=0.01)
    binary = jnp.ones((16, 16, 16), bool)
    n = 8
    ro = jnp.broadcast_to(jnp.asarray([2.5, 0.0, 0.0]), (n, 3))
    rd = jnp.broadcast_to(jnp.asarray([-1.0, 0.0, 0.0]), (n, 3))
    kw = dict(near=0.5, far=4.0, n_samples=32, perturb=False,
              grid_binary=binary, grid_spec=spec)
    dense = render_rays(field, params, ro, rd, **kw)
    budget = render_rays(field, params, ro, rd, ray_budget=8, **kw)
    assert bool(jnp.all(jnp.isfinite(budget[0])))
    assert float(budget[2].max()) <= float(dense[2].max()) + 1e-5


def test_budget_dynamic_field(rng_key):
    field = build_field({"mode": "part4", "n_levels": 4,
                         "log2_hashmap_size": 10, "deform_n_levels": 3,
                         "deform_log2_hashmap_size": 9, "hidden_dim": 16,
                         "L_embed_time": 4, "time_modulation_dim": 8})
    params = jax.jit(field.init)(rng_key)
    spec = DensityGridSpec(resolution=8, bound=1.5, threshold=0.01)
    binary = jax.random.bernoulli(rng_key, 0.3, (8, 8, 8))
    n = 8
    ro = jnp.broadcast_to(jnp.asarray([2.5, 0.0, 0.0]), (n, 3))
    rd = jax.random.normal(rng_key, (n, 3)) * 0.1 \
        + jnp.asarray([-1.0, 0.0, 0.0])
    t = jax.random.uniform(rng_key, (n, 1))
    rgb, depth, acc, extras = render_rays(
        field, params, ro, rd, near=0.5, far=4.0, n_samples=16,
        perturb=True, rng=rng_key, times=t, grid_binary=binary,
        grid_spec=spec, ray_budget=8, train=True)
    assert rgb.shape == (n, 3)
    assert extras["mean_delta_x"].shape == (n, 3)


def test_budget_compaction_matches_uncompacted(rng_key):
    """budget + capacity (second-stage compaction) must reproduce the plain
    budget path exactly when capacity covers the active count — the field
    sees the same points, the scatter-back restores the layout."""
    field = build_field(CFG)
    params = jax.jit(field.init)(rng_key)
    spec = DensityGridSpec(resolution=16, bound=1.5, threshold=0.01)
    binary = jax.random.bernoulli(rng_key, 0.10, (16, 16, 16))
    n = 32
    ro = jnp.broadcast_to(jnp.asarray([2.5, 0.0, 0.0]), (n, 3))
    rd = jax.random.normal(rng_key, (n, 3)) * 0.15 \
        + jnp.asarray([-1.0, 0.0, 0.0])
    for mode in ("first", "cdf"):
        kw = dict(near=0.5, far=4.0, n_samples=32, perturb=True,
                  rng=rng_key, train=True, grid_binary=binary,
                  grid_spec=spec, ray_budget=8, budget_mode=mode,
                  bg_color=jnp.asarray([0.2, 0.3, 0.4]))
        plain = render_rays(field, params, ro, rd, **kw)
        compact = render_rays(field, params, ro, rd, capacity=n * 8, **kw)
        for a, b in zip(plain[:3], compact[:3]):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-5, atol=1e-6)


def test_budget_compaction_grads_match(rng_key):
    """Hash-table gradients flow identically through the compacted path."""
    field = build_field(CFG)
    params = jax.jit(field.init)(rng_key)
    spec = DensityGridSpec(resolution=16, bound=1.5, threshold=0.01)
    binary = jax.random.bernoulli(rng_key, 0.10, (16, 16, 16))
    n = 16
    ro = jnp.broadcast_to(jnp.asarray([2.5, 0.0, 0.0]), (n, 3))
    rd = jax.random.normal(rng_key, (n, 3)) * 0.15 \
        + jnp.asarray([-1.0, 0.0, 0.0])

    def loss(p, cap):
        rgb, _, _, _ = render_rays(
            field, p, ro, rd, near=0.5, far=4.0, n_samples=32,
            perturb=False, grid_binary=binary, grid_spec=spec,
            ray_budget=8, capacity=cap,
            bg_color=jnp.asarray([0.2, 0.3, 0.4]))
        return jnp.mean(rgb ** 2)

    from jax.flatten_util import ravel_pytree
    g_plain = jax.grad(lambda p: loss(p, None))(params)
    g_comp = jax.grad(lambda p: loss(p, n * 8))(params)
    flat_p, _ = ravel_pytree(g_plain)
    flat_c, _ = ravel_pytree(g_comp)
    np.testing.assert_allclose(np.asarray(flat_p), np.asarray(flat_c),
                               rtol=1e-5, atol=1e-7)


def test_budget_compaction_overflow_keeps_first_actives(rng_key):
    """With capacity below the active count the dropped samples read as
    sigma=0 (graceful degradation, never NaN)."""
    field = build_field(CFG)
    params = jax.jit(field.init)(rng_key)
    spec = DensityGridSpec(resolution=16, bound=1.5, threshold=0.01)
    binary = jnp.ones((16, 16, 16), bool)
    n = 8
    ro = jnp.broadcast_to(jnp.asarray([2.5, 0.0, 0.0]), (n, 3))
    rd = jnp.broadcast_to(jnp.asarray([-1.0, 0.0, 0.0]), (n, 3))
    out = render_rays(field, params, ro, rd, near=0.5, far=4.0,
                      n_samples=32, perturb=False, grid_binary=binary,
                      grid_spec=spec, ray_budget=8, capacity=16)
    assert bool(jnp.all(jnp.isfinite(out[0])))


def test_select_k_cdf_spreads_over_occupied():
    from nerf_tpu.render.renderer import _select_k_cdf
    mask = jnp.asarray([
        [0, 1, 0, 1, 1, 0, 1, 1],     # 5 occupied bins
        [1, 1, 1, 1, 1, 1, 1, 1],
        [0, 0, 0, 0, 0, 0, 0, 0],
    ], bool)
    idx, n_act = _select_k_cdf(mask, 5)
    # k == n_act for ray 0: quantiles hit each occupied bin exactly once
    np.testing.assert_array_equal(np.asarray(idx[0]), [1, 3, 4, 6, 7])
    np.testing.assert_array_equal(np.asarray(n_act), [5, 8, 0])
    # ray 1: k=5 over 8 bins spans first to last (no far truncation)
    assert int(idx[1, 0]) == 0 and int(idx[1, -1]) >= 6


def test_budget_cdf_close_to_mask_path(rng_key):
    """cdf budget mode approximates the dense masked integral (it is the
    eval estimator applied at training time)."""
    field = build_field(CFG)
    params = jax.jit(field.init)(rng_key)
    spec = DensityGridSpec(resolution=16, bound=1.5, threshold=0.01)
    lin = np.linspace(-1.5, 1.5, 16, dtype=np.float32)
    xx, yy, zz = np.meshgrid(lin, lin, lin, indexing="ij")
    binary = jnp.asarray((xx**2 + yy**2 + zz**2) < 0.9**2)

    n = 32
    ro = jnp.broadcast_to(jnp.asarray([2.8, 0.0, 0.0]), (n, 3))
    rd = jax.random.normal(rng_key, (n, 3)) * 0.12 \
        + jnp.asarray([-1.0, 0.0, 0.0])
    kw = dict(near=1.0, far=5.0, perturb=False,
              grid_binary=binary, grid_spec=spec)
    dense, _, _, _ = render_rays(field, params, ro, rd,
                                 n_samples=96, **kw)
    cdf, _, _, _ = render_rays(field, params, ro, rd, n_samples=96,
                               ray_budget=32, budget_mode="cdf", **kw)
    err = float(jnp.max(jnp.abs(dense - cdf)))
    assert err < 0.05, f"cdf budget deviates by {err}"
