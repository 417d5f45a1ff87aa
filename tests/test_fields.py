import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nerf_tpu.models import build_field

SMALL = {
    "part1": {"mode": "part1_fourier", "L_embed": 4, "hidden_dim": 16,
              "output_dim": 3, "num_layers": 2},
    "part2": {"mode": "part2_nerf", "L_embed": 4, "hidden_dim": 16,
              "num_layers": 3, "skip_layer": 2, "view_dim": 8},
    "part2_instant": {"mode": "part2_instant", "n_levels": 4,
                      "log2_hashmap_size": 10, "hidden_dim": 16},
    "part3_nerf": {"mode": "part3", "canonical_type": "nerf",
                   "hidden_dim": 16, "num_layers": 3, "skip_layer": 2,
                   "view_dim": 8, "deform_hidden_dim": 8,
                   "deform_num_layers": 3},
    "part3_instant": {"mode": "part3", "canonical_type": "instant",
                      "n_levels": 4, "log2_hashmap_size": 10,
                      "hidden_dim": 16, "deform_hidden_dim": 8,
                      "deform_num_layers": 3},
    "part3_dtc": {"mode": "part3", "direct_time_conditioning": True,
                  "hidden_dim": 16, "num_layers": 3, "skip_layer": 2,
                  "view_dim": 8},
    "part4": {"mode": "part4", "n_levels": 4, "log2_hashmap_size": 10,
              "deform_n_levels": 3, "deform_log2_hashmap_size": 9,
              "hidden_dim": 16},
}


@pytest.mark.parametrize("name", list(SMALL))
def test_all_modes_forward(name, rng_key):
    field = build_field(SMALL[name])
    params = jax.jit(field.init)(rng_key)
    x = jax.random.uniform(rng_key, (13, 3), minval=-1.0, maxval=1.0)
    d = jax.random.normal(rng_key, (13, 3))
    t = jax.random.uniform(rng_key, (13, 1))
    if field.mode == "part1_fourier":
        out = field.apply(params, x[:, :2])
        assert out.shape == (13, 3)
    elif field.needs_time:
        rgb, sigma, dx = field.apply(params, x, d, t, train=True,
                                     rng=rng_key)
        assert rgb.shape == (13, 3)
        assert sigma.shape == (13, 1)
        assert dx.shape == (13, 3)
    else:
        rgb, sigma = field.apply(params, x, d)
        assert rgb.shape == (13, 3)
        assert sigma.shape == (13, 1)


def test_part4_triangle_weights_anchor_exact(rng_key):
    """At t=0 the tri-grid interp must reduce to the start grid alone
    (reference: src/core.py:313-335)."""
    field = build_field(SMALL["part4"])
    params = jax.jit(field.init)(rng_key)
    x = jax.random.uniform(rng_key, (9, 3), minval=-1.0, maxval=1.0)
    t0 = jnp.zeros((9, 1))
    via = field.deform_delta_via_grid(params, "deform_grid_start", x, t0)
    full = field.deform_delta(params, x, t0)
    np.testing.assert_allclose(np.asarray(via), np.asarray(full),
                               rtol=1e-4, atol=1e-7)


def test_part4_triangle_weights_sum_and_mid(rng_key):
    field = build_field(SMALL["part4"])
    params = jax.jit(field.init)(rng_key)
    x = jax.random.uniform(rng_key, (9, 3), minval=-1.0, maxval=1.0)
    t_mid = jnp.full((9, 1), 0.5)
    via = field.deform_delta_via_grid(params, "deform_grid_mid", x, t_mid)
    full = field.deform_delta(params, x, t_mid)
    np.testing.assert_allclose(np.asarray(via), np.asarray(full),
                               rtol=1e-4, atol=1e-7)


def test_part3_dtc_zero_delta(rng_key):
    field = build_field(SMALL["part3_dtc"])
    params = jax.jit(field.init)(rng_key)
    x = jax.random.uniform(rng_key, (5, 3))
    _, _, dx = field.apply(params, x, x, jnp.zeros((5, 1)))
    np.testing.assert_allclose(np.asarray(dx), 0.0)


def test_train_noise_changes_output_only_in_train(rng_key):
    cfg = dict(SMALL["part3_nerf"])
    cfg.update(use_coord_noise=True, coord_noise_std=0.05,
               time_noise_std=0.05)
    field = build_field(cfg)
    params = jax.jit(field.init)(rng_key)
    x = jax.random.uniform(rng_key, (5, 3))
    t = jnp.full((5, 1), 0.5)
    eval_a = field.apply(params, x, x, t, train=False)
    eval_b = field.apply(params, x, x, t, train=False)
    np.testing.assert_allclose(np.asarray(eval_a[0]), np.asarray(eval_b[0]))
    k1, k2 = jax.random.split(rng_key)
    tr_a = field.apply(params, x, x, t, train=True, rng=k1)
    tr_b = field.apply(params, x, x, t, train=True, rng=k2)
    assert float(jnp.abs(tr_a[0] - tr_b[0]).max()) > 0.0


def test_part4_blended_field_matches_full_apply(rng_key):
    """For one scalar t, rendering through the tri-grid-blended params must
    equal the full triangle-weighted three-grid apply (the encode is linear
    in the table entries)."""
    cfg = {"mode": "part4", "n_levels": 4, "log2_hashmap_size": 10,
           "deform_n_levels": 3, "deform_log2_hashmap_size": 9,
           "hidden_dim": 16, "deform_hidden_dim": 16,
           "time_modulation_dim": 16, "scene_bound": 1.5}
    field = build_field(cfg)
    params = jax.jit(field.init)(rng_key)
    n = 64
    x = jax.random.uniform(rng_key, (n, 3), jnp.float32, -1.2, 1.2)
    d = jax.random.normal(rng_key, (n, 3))

    for t_scalar in (0.0, 0.23, 0.5, 0.77, 1.0):
        t = jnp.full((n, 1), t_scalar, jnp.float32)
        rgb_f, sig_f, dx_f = field.apply(params, x, d, t)
        bp = field.blend_params(params, jnp.float32(t_scalar))
        rgb_b, sig_b, dx_b = field.blended_field.apply(bp, x, d, t)
        np.testing.assert_allclose(np.asarray(dx_b), np.asarray(dx_f),
                                   rtol=1e-4, atol=1e-6)
        np.testing.assert_allclose(np.asarray(sig_b), np.asarray(sig_f),
                                   rtol=1e-4, atol=1e-6)
        np.testing.assert_allclose(np.asarray(rgb_b), np.asarray(rgb_f),
                                   rtol=1e-3, atol=1e-3)
