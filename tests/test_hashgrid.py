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
    # brick budget = 2^(10-6) = 16 rows for hashed levels
    assert spec.max_bricks == 16
    # bricks/axis = ceil((res-1)/3): 1, 3, 5, 11
    assert spec.bricks_per_axis == (1, 3, 5, 11)
    # dense if nb^3 <= 16: level0 dense (1), others hashed (16)
    assert spec.level_bricks == (1, 16, 16, 16)
    assert spec.n_bricks == 49
    assert spec.out_dim == 8


def test_shapes_and_grad(rng_key):
    spec = small_spec()
    table = hash_grid_init(rng_key, spec)
    assert table.shape == (spec.n_bricks, 128)
    x = jax.random.uniform(rng_key, (33, 3), minval=-1.0, maxval=1.0)
    out = hash_encode(table, x, spec)
    assert out.shape == (33, spec.out_dim)
    g = jax.grad(lambda t: jnp.sum(hash_encode(t, x, spec) ** 2))(table)
    assert g.shape == table.shape
    assert float(jnp.sum(jnp.abs(g))) > 0.0
    gx = jax.grad(lambda xx: jnp.sum(hash_encode(table, xx, spec)))(x)
    assert float(jnp.sum(jnp.abs(gx))) > 0.0  # dx gradients flow (part3/4)


def test_trilinear_center_is_corner_mean(rng_key):
    """At a cell center, multilinear interpolation equals the mean of the
    8 corner values — corners of one cell always share a brick row.

    The cell is chosen interior to a single brick: per-vertex encodes read
    the same brick copy as the center's interpolation (vertex copies on
    brick seams are independent parameters by design)."""
    spec = small_spec(n_levels=1, base_resolution=8)
    table = hash_grid_init(rng_key, spec) * 1e4  # scale up for precision
    res = spec.resolutions[0]

    cell = np.array([1, 1, 1])  # corners in [1,2]^3, all inside brick 0
    corners = []
    for c in range(8):
        v = cell + np.array([(c >> 2) & 1, (c >> 1) & 1, c & 1])
        x01 = v / (res - 1)
        corners.append((x01 * 2 - 1))
    corners = jnp.asarray(np.stack(corners), jnp.float32)
    center = jnp.mean(corners, axis=0, keepdims=True)

    enc_corners = hash_encode(table, corners, spec)
    enc_center = hash_encode(table, center, spec)
    np.testing.assert_allclose(np.asarray(enc_center[0]),
                               np.asarray(enc_corners.mean(0)),
                               rtol=1e-4, atol=1e-5)


def test_linear_along_axis(rng_key):
    """Multilinear: along an axis-aligned segment inside one cell the
    encoding is linear."""
    spec = small_spec(n_levels=1, base_resolution=8)
    table = hash_grid_init(rng_key, spec) * 1e4
    res = spec.resolutions[0]
    a01 = np.array([2.2, 3.4, 4.1]) / (res - 1)
    b01 = a01 + np.array([0.6, 0.0, 0.0]) / (res - 1)
    a = jnp.asarray((a01 * 2 - 1)[None], jnp.float32)
    b = jnp.asarray((b01 * 2 - 1)[None], jnp.float32)
    mid = 0.5 * (a + b)
    ea = hash_encode(table, a, spec)
    eb = hash_encode(table, b, spec)
    em = hash_encode(table, mid, spec)
    np.testing.assert_allclose(np.asarray(em), np.asarray(0.5 * (ea + eb)),
                               rtol=1e-4, atol=1e-5)


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


def test_gradient_scatters_to_touched_bricks(rng_key):
    spec = small_spec(n_levels=1, base_resolution=8)
    table = hash_grid_init(rng_key, spec)
    x = jnp.asarray([[0.05, 0.05, 0.05]])
    g = jax.grad(lambda t: jnp.sum(hash_encode(t, x, spec)))(table)
    touched_rows = int(jnp.sum(jnp.any(g != 0, axis=-1)))
    assert touched_rows == 1  # all 8 corners live in one brick row
    touched_lanes = int(jnp.sum(g != 0))
    assert touched_lanes == 16  # 8 corners x 2 features


def test_distinct_points_distinct_features(rng_key):
    spec = small_spec()
    table = jax.random.normal(rng_key, (spec.n_bricks, 128))
    x = jax.random.uniform(rng_key, (64, 3), minval=-1.0, maxval=1.0)
    out = hash_encode(table, x, spec)
    # features should not be degenerate across points
    assert float(jnp.std(out)) > 1e-3


def test_max_level_lod(rng_key):
    """max_level computes a prefix of levels and zero-pads the rest."""
    spec = small_spec()
    table = jax.random.normal(rng_key, (spec.n_bricks, 128))
    x = jax.random.uniform(rng_key, (9, 3), minval=-1.0, maxval=1.0)
    full = hash_encode(table, x, spec)
    lod = hash_encode(table, x, spec, max_level=2)
    f = spec.n_features_per_level
    np.testing.assert_allclose(np.asarray(lod[:, :2 * f]),
                               np.asarray(full[:, :2 * f]), rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(lod[:, 2 * f:]), 0.0)
