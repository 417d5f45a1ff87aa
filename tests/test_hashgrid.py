import jax
import jax.numpy as jnp
import numpy as np

from nerf_tpu.ops.hashgrid import HashGridSpec, hash_encode, hash_grid_init


def small_spec(**kw):
    base = dict(n_levels=4, n_features_per_level=2, log2_hashmap_size=10,
                base_resolution=4, per_level_scale=2.0, bound=1.0)
    base.update(kw)
    return HashGridSpec(**base)


def test_layout():
    spec = small_spec()
    assert spec.resolutions == (4, 8, 16, 32)
    # 4^3=64 and 8^3=512 are dense (<=1024); 16^3, 32^3 hash to 1024.
    assert spec.level_sizes == (64, 512, 1024, 1024)
    assert spec.n_entries == 64 + 512 + 1024 + 1024
    assert spec.out_dim == 8


def test_shapes_and_grad(rng_key):
    spec = small_spec()
    table = hash_grid_init(rng_key, spec)
    x = jax.random.uniform(rng_key, (33, 3), minval=-1.0, maxval=1.0)
    out = hash_encode(table, x, spec)
    assert out.shape == (33, spec.out_dim)
    g = jax.grad(lambda t: jnp.sum(hash_encode(t, x, spec) ** 2))(table)
    assert g.shape == table.shape
    assert float(jnp.sum(jnp.abs(g))) > 0.0


def test_dense_level_vertex_exact(rng_key):
    """At an exact grid vertex of a dense level, the interpolated feature
    must equal the table entry (trilinear weights collapse to one corner)."""
    spec = small_spec(n_levels=1)  # single dense level, res 4
    table = hash_grid_init(rng_key, spec)
    res = spec.resolutions[0]
    # vertex (1, 2, 3) in [0, res-1] -> world coords
    vid = np.array([1, 2, 3])
    x01 = vid / (res - 1)
    x = jnp.asarray((x01 * 2.0 - 1.0)[None, :], jnp.float32)
    out = hash_encode(table, x, spec)
    lin = vid[0] + vid[1] * res + vid[2] * res * res
    np.testing.assert_allclose(np.asarray(out[0]),
                               np.asarray(table[lin]), rtol=1e-5)


def test_clamping(rng_key):
    spec = small_spec()
    table = hash_grid_init(rng_key, spec)
    inside = hash_encode(table, jnp.asarray([[1.0, 1.0, 1.0]]), spec)
    outside = hash_encode(table, jnp.asarray([[5.0, 9.0, 7.0]]), spec)
    np.testing.assert_allclose(np.asarray(inside), np.asarray(outside))


def test_interpolation_is_continuous(rng_key):
    spec = small_spec()
    table = hash_grid_init(rng_key, spec)
    x = jnp.asarray([[0.1, 0.2, 0.3]])
    eps = 1e-4
    a = hash_encode(table, x, spec)
    b = hash_encode(table, x + eps, spec)
    assert float(jnp.max(jnp.abs(a - b))) < 1e-2


def test_gradient_scatters_to_touched_entries(rng_key):
    spec = small_spec(n_levels=1)
    table = hash_grid_init(rng_key, spec)
    x = jnp.asarray([[0.0, 0.0, 0.0]])  # mid-cell point
    g = jax.grad(lambda t: jnp.sum(hash_encode(t, x, spec)))(table)
    touched = int(jnp.sum(jnp.any(g != 0, axis=-1)))
    assert 1 <= touched <= 8
