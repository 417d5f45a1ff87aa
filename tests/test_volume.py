import jax
import jax.numpy as jnp
import numpy as np

from nerf_tpu.ops.volume import composite, sample_stratified


def test_stratified_bounds(rng_key):
    z = sample_stratified(rng_key, 2.0, 6.0, 32, 16, perturb=True)
    assert z.shape == (16, 32)
    assert float(z.min()) >= 2.0 - 1e-5
    assert float(z.max()) <= 6.0 + 1e-5
    # monotone along each ray
    assert bool(jnp.all(z[:, 1:] >= z[:, :-1]))


def test_stratified_deterministic_without_perturb():
    z = sample_stratified(None, 1.0, 3.0, 5, 2, perturb=False)
    np.testing.assert_allclose(np.asarray(z[0]),
                               np.linspace(1.0, 3.0, 5), rtol=1e-6)


def test_composite_constant_density_closed_form():
    """For constant sigma and uniform spacing, acc = 1 - exp(-sigma * span)
    (up to the reference's 1e-10 epsilon and the 1e10 last interval)."""
    n_rays, n_s = 4, 64
    sigma_v = 0.7
    z = jnp.broadcast_to(jnp.linspace(0.0, 2.0, n_s), (n_rays, n_s))
    rgb = jnp.ones((n_rays, n_s, 3)) * 0.5
    sigma = jnp.full((n_rays, n_s), sigma_v)
    rays_d = jnp.concatenate(
        [jnp.ones((n_rays, 1)), jnp.zeros((n_rays, 2))], axis=-1)
    rgb_map, depth, acc, weights = composite(rgb, sigma, z, rays_d,
                                             bg_color=jnp.zeros(3))
    # Last interval is 1e10 -> alpha_last = 1 -> total acc = 1.
    np.testing.assert_allclose(np.asarray(acc), 1.0, rtol=1e-4)
    # weights sum to acc
    np.testing.assert_allclose(np.asarray(weights.sum(-1)),
                               np.asarray(acc), rtol=1e-5)
    # constant radiance -> rgb = 0.5 everywhere
    np.testing.assert_allclose(np.asarray(rgb_map), 0.5, rtol=1e-4)


def test_background_compositing():
    """Zero density -> pure background."""
    n_rays, n_s = 3, 8
    z = jnp.broadcast_to(jnp.linspace(1.0, 2.0, n_s), (n_rays, n_s))
    rgb = jnp.zeros((n_rays, n_s, 3))
    sigma = jnp.zeros((n_rays, n_s))
    rays_d = jnp.concatenate(
        [jnp.ones((n_rays, 1)), jnp.zeros((n_rays, 2))], axis=-1)
    bg = jnp.asarray([0.2, 0.4, 0.8])
    rgb_map, _, acc, _ = composite(rgb, sigma, z, rays_d, bg_color=bg)
    np.testing.assert_allclose(np.asarray(acc), 0.0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(rgb_map),
                               np.tile(bg, (n_rays, 1)), rtol=1e-5)


def test_dist_scaling_by_ray_norm():
    """Doubling ||rays_d|| doubles the effective optical depth."""
    n_rays, n_s = 2, 16
    z = jnp.broadcast_to(jnp.linspace(0.0, 1.0, n_s), (n_rays, n_s))
    rgb = jnp.ones((n_rays, n_s, 3))
    sigma = jnp.full((n_rays, n_s), 0.3)
    d1 = jnp.concatenate([jnp.ones((n_rays, 1)), jnp.zeros((n_rays, 2))], -1)
    _, _, acc1, w1 = composite(rgb, sigma, z, d1, None)
    _, _, acc2, w2 = composite(rgb, sigma, z, d1 * 2.0, None)
    # inner weights (excluding the 1e10 catch-all last sample) grow
    assert float(w2[:, :-1].sum()) > float(w1[:, :-1].sum())
