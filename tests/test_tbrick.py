"""tbrick layout: tied brick rows (ops/hashgrid.py::hash_encode_tbrick).

The layout's contract: per-point math identical to the per-vertex exact
impl on dense levels (the expansion ties every duplicated brick-row lane
to its single canonical vertex, killing the brick layout's seams) and
identical to the brick impl on hashed levels — at brick's one-row-gather
descriptor cost everywhere.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nerf_tpu.ops.hashgrid import (HashGridSpec, hash_encode,
                                   hash_grid_init)


def _pts(n=257, bound=1.0, seed=3):
    rng = np.random.default_rng(seed)
    return jnp.asarray(rng.uniform(-bound, bound, size=(n, 3)), jnp.float32)


def test_tbrick_matches_exact_when_all_levels_dense():
    """With every level below the dense cap, tbrick must reproduce the
    exact impl bit-for-bit in values AND gradients: same canonical
    per-vertex parameters, same trilerp, different storage plumbing."""
    kw = dict(n_levels=4, n_features_per_level=2, log2_hashmap_size=12,
              base_resolution=4, per_level_scale=1.5, bound=1.0)
    spec_e = HashGridSpec(impl="exact", **kw)
    spec_t = HashGridSpec(impl="tbrick", **kw)
    assert spec_t.tbrick_split == 4  # all dense

    key = jax.random.PRNGKey(0)
    tab_e = hash_grid_init(key, spec_e)          # [n_vertices, F]
    tab_t = tab_e.reshape(-1)                    # same flat layout
    assert tab_t.shape[0] == spec_t.tbrick_n_params

    x = _pts()
    out_e = hash_encode(tab_e, x, spec_e)
    out_t = hash_encode(tab_t, x, spec_t)
    np.testing.assert_allclose(np.asarray(out_t), np.asarray(out_e),
                               rtol=0, atol=1e-6)

    g_e = jax.grad(lambda t: jnp.sum(jnp.sin(hash_encode(t, x, spec_e))))(
        tab_e)
    g_t = jax.grad(lambda t: jnp.sum(jnp.sin(hash_encode(t, x, spec_t))))(
        tab_t)
    np.testing.assert_allclose(np.asarray(g_t),
                               np.asarray(g_e).reshape(-1),
                               rtol=1e-5, atol=1e-7)


def test_tbrick_equals_vbrick_on_identical_tables():
    """When the two layouts' dense/hashed splits coincide, their flat
    tables have identical layout (per-vertex dense region + per-level
    hashed brick-row regions) — so encode outputs must match exactly,
    proving tbrick's expansion+row-gather dense path computes the same
    trilerp as vbrick's 8-vertex-gather dense path AND its hashed path
    is bit-identical brick rows."""
    kw = dict(n_levels=6, n_features_per_level=2, log2_hashmap_size=12,
              base_resolution=4, per_level_scale=1.5, bound=1.0)
    spec_v = HashGridSpec(impl="vbrick", **kw)
    spec_t = HashGridSpec(impl="tbrick", **kw)
    assert spec_v.mixed_split == spec_t.tbrick_split == 4
    assert spec_v.vbrick_n_params == spec_t.tbrick_n_params

    tab = hash_grid_init(jax.random.PRNGKey(1), spec_t)
    x = _pts(401)
    out_v = hash_encode(tab, x, spec_v)
    out_t = hash_encode(tab, x, spec_t)
    np.testing.assert_allclose(np.asarray(out_t), np.asarray(out_v),
                               rtol=0, atol=1e-6)


def test_tbrick_max_level_zero_fills():
    kw = dict(n_levels=6, n_features_per_level=2, log2_hashmap_size=12,
              base_resolution=4, per_level_scale=1.5, bound=1.0)
    spec = HashGridSpec(impl="tbrick", **kw)
    tab = hash_grid_init(jax.random.PRNGKey(2), spec)
    x = _pts(65)
    out = hash_encode(tab, x, spec, max_level=3)
    assert out.shape == (65, 12)
    np.testing.assert_array_equal(np.asarray(out[:, 6:]), 0.0)
    full = hash_encode(tab, x, spec)
    np.testing.assert_allclose(np.asarray(out[:, :6]),
                               np.asarray(full[:, :6]), atol=1e-6)


def test_tbrick_dense_cap_widens_the_collision_free_prefix():
    """dense_max_entries pushes the first hashed level out; the widened
    spec has strictly more dense levels and still encodes/differentiates."""
    kw = dict(n_levels=6, n_features_per_level=2, log2_hashmap_size=12,
              base_resolution=4, per_level_scale=1.5, bound=1.0)
    base = HashGridSpec(impl="tbrick", **kw)
    wide = HashGridSpec(impl="tbrick", dense_max_entries=30000, **kw)
    assert wide.tbrick_split > base.tbrick_split
    assert wide.tbrick_split == 6  # res 30 -> 27000 <= 30000: all dense

    tab = hash_grid_init(jax.random.PRNGKey(3), wide)
    x = _pts(129)
    out = hash_encode(tab, x, wide)
    assert out.shape == (129, 12)
    g = jax.grad(lambda t: jnp.sum(hash_encode(t, x, wide) ** 2))(tab)
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.sum(jnp.abs(g))) > 0


def test_tbrick_field_trains(tmp_path):
    """build_field wiring: hash_impl: tbrick trains through the Instant
    recipe surface (init + apply + grad on the real field)."""
    from nerf_tpu.models import build_field
    cfg = {"mode": "part2_instant", "n_levels": 6, "log2_hashmap_size": 11,
           "base_resolution": 4, "hidden_dim": 16, "scene_bound": 1.5,
           "hash_impl": "tbrick", "hash_dense_max_entries": 3000}
    field = build_field(cfg)
    params = jax.jit(field.init)(jax.random.PRNGKey(0))
    x = _pts(128, bound=1.5)
    d = jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]]), (128, 1))

    def loss(p):
        rgb, sigma = field.apply(p, x, d)[:2]
        return jnp.mean(rgb ** 2) + jnp.mean(sigma ** 2)

    l0, g = jax.value_and_grad(loss)(params)
    assert np.isfinite(float(l0))
    moved = sum(float(jnp.sum(jnp.abs(v)))
                for v in jax.tree_util.tree_leaves(g))
    assert moved > 0
