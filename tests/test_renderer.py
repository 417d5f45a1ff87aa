import jax
import jax.numpy as jnp
import numpy as np

from nerf_tpu.models import build_field
from nerf_tpu.render.density_grid import (DensityGridSpec,
                                          density_grid_init,
                                          grid_active_mask,
                                          make_grid_updater)
from nerf_tpu.render.renderer import _compact_indices, render_image, \
    render_rays

CFG = {"mode": "part2_instant", "n_levels": 4, "log2_hashmap_size": 10,
       "hidden_dim": 16, "scene_bound": 1.5}


def _setup(rng_key):
    field = build_field(CFG)
    params = jax.jit(field.init)(rng_key)
    n = 8
    ro = jnp.zeros((n, 3)) + jnp.asarray([2.5, 0.0, 0.0])
    rd = jax.random.normal(rng_key, (n, 3)) * 0.1 \
        + jnp.asarray([-1.0, 0.0, 0.0])
    return field, params, ro, rd


def test_compact_indices_exact():
    mask = jnp.asarray([False, True, False, True, True, False])
    take, valid = _compact_indices(mask, 4)
    np.testing.assert_array_equal(np.asarray(take[:3]), [1, 3, 4])
    np.testing.assert_array_equal(np.asarray(valid), [1, 1, 1, 0])


def test_mask_and_compaction_agree(rng_key):
    field, params, ro, rd = _setup(rng_key)
    spec = DensityGridSpec(resolution=16, bound=1.5, threshold=1e-4)
    # random sparse grid
    binary = jax.random.bernoulli(rng_key, 0.3, (16, 16, 16))
    out_mask = render_rays(field, params, ro, rd, near=0.5, far=4.0,
                           n_samples=24, perturb=False,
                           grid_binary=binary, grid_spec=spec)[0]
    out_comp = render_rays(field, params, ro, rd, near=0.5, far=4.0,
                           n_samples=24, perturb=False,
                           grid_binary=binary, grid_spec=spec,
                           capacity=8 * 24)[0]
    np.testing.assert_allclose(np.asarray(out_mask), np.asarray(out_comp),
                               rtol=1e-5, atol=1e-6)


def test_empty_grid_renders_background(rng_key):
    field, params, ro, rd = _setup(rng_key)
    spec = DensityGridSpec(resolution=8, bound=1.5, threshold=0.01)
    binary = jnp.zeros((8, 8, 8), jnp.bool_)
    bg = jnp.asarray([0.1, 0.5, 0.9])
    rgb, _, acc, _ = render_rays(field, params, ro, rd, near=0.5, far=4.0,
                                 n_samples=16, perturb=False,
                                 grid_binary=binary, grid_spec=spec,
                                 bg_color=bg)
    np.testing.assert_allclose(np.asarray(acc), 0.0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(rgb), np.tile(bg, (8, 1)),
                               rtol=1e-5)


def test_render_image_matches_render_rays(rng_key):
    field, params, ro, rd = _setup(rng_key)
    full = render_rays(field, params, ro, rd, near=0.5, far=4.0,
                       n_samples=16, perturb=False)[0]
    img = render_image(field, params, ro, rd, near=0.5, far=4.0,
                       n_samples=16, chunk=3)  # non-divisible chunk
    np.testing.assert_allclose(np.asarray(img), np.asarray(full),
                               rtol=1e-4, atol=1e-5)


def test_grid_active_mask_bounds():
    spec = DensityGridSpec(resolution=4, bound=1.0, threshold=0.0)
    binary = jnp.ones((4, 4, 4), jnp.bool_)
    pts = jnp.asarray([[0.0, 0.0, 0.0], [2.0, 0.0, 0.0], [-1.5, 0.0, 0.0]])
    mask = grid_active_mask(binary, pts, spec)
    np.testing.assert_array_equal(np.asarray(mask), [True, False, False])


def test_density_grid_update_finds_density(rng_key):
    """A field with an analytically dense region should turn the grid on
    exactly there."""
    class FakeField:
        needs_time = False

        @staticmethod
        def apply(params, x, d, t=None, train=False, rng=None):
            inside = (jnp.linalg.norm(x, axis=-1, keepdims=True)
                      < 0.5).astype(jnp.float32)
            return jnp.zeros((x.shape[0], 3)), inside * 10.0

    spec = DensityGridSpec(resolution=16, bound=1.0, threshold=0.01)
    update = make_grid_updater(FakeField.apply, spec, needs_time=False,
                               chunk=512)
    state, ar = update({}, density_grid_init(spec), jnp.zeros((1,)), 1.0)
    ar = float(ar)
    # volume of r=0.5 sphere in [-1,1]^3 box = (4/3 pi 0.125) / 8 ~ 6.5%
    assert 0.02 < ar < 0.15
    mask = grid_active_mask(state["binary"],
                            jnp.asarray([[0.0, 0.0, 0.0], [0.9, 0.9, 0.9]]),
                            spec)
    np.testing.assert_array_equal(np.asarray(mask), [True, False])


def test_density_grid_prune_drops_stale_memory(rng_key):
    """decay=1.0 union keeps every cell the field EVER marked (reference
    parity, src/renderer.py:123); prune=True rebuilds from the current
    field only (reference part-4 intent, run.py:1979-1984)."""
    from nerf_tpu.render.density_grid import (DensityGridSpec,
                                              density_grid_init,
                                              make_grid_updater)

    class MovingField:
        needs_time = True

        @staticmethod
        def apply(params, x, d, t=None, train=False, rng=None):
            # dense ball centered at (c, 0, 0), c = params["c"]
            cen = jnp.asarray([params["c"], 0.0, 0.0])
            inside = (jnp.linalg.norm(x - cen, axis=-1, keepdims=True)
                      < 0.4).astype(jnp.float32)
            return jnp.zeros((x.shape[0], 3)), inside * 10.0, None

    spec = DensityGridSpec(resolution=16, bound=1.0, threshold=0.01)
    update = make_grid_updater(MovingField.apply, spec, needs_time=True,
                               chunk=512)
    times = jnp.zeros((1,))
    # Ball at x=-0.5, then the "trained" field moves it to x=+0.5.
    state, ar0 = update({"c": -0.5}, density_grid_init(spec), times, 1.0)
    state_union, ar_union = update({"c": +0.5}, state, times, 1.0)
    state_prune, ar_prune = update({"c": +0.5}, state, times, 1.0,
                                   jnp.asarray(True))
    # Permanent memory keeps both ball positions active; prune keeps one.
    assert float(ar_union) > 1.7 * float(ar0)
    np.testing.assert_allclose(float(ar_prune), float(ar0), atol=0.01)
    # The pruned grid no longer marks the stale position.
    from nerf_tpu.render.density_grid import grid_active_mask
    stale = jnp.asarray([[-0.5, 0.0, 0.0]])
    assert bool(grid_active_mask(state_union["binary"], stale, spec)[0])
    assert not bool(grid_active_mask(state_prune["binary"], stale, spec)[0])
