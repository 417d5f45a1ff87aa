import jax
import jax.numpy as jnp
import numpy as np

from nerf_tpu.models import decoders as D


def test_standard_mlp(rng_key):
    p = D.standard_mlp_init(rng_key, 10, hidden_dim=16, output_dim=3,
                            num_layers=2)
    out = D.standard_mlp_apply(p, jnp.zeros((5, 10)))
    assert out.shape == (5, 3)
    assert float(out.min()) >= 0.0 and float(out.max()) <= 1.0


def test_nerf_decoder(rng_key):
    p = D.nerf_decoder_init(rng_key, 63, 27, hidden_dim=32, num_layers=4,
                            skip_layer=2, view_dim=16)
    rgb, sigma = D.nerf_decoder_apply(p, jnp.ones((7, 63)),
                                      jnp.ones((7, 27)), skip=2)
    assert rgb.shape == (7, 3) and sigma.shape == (7, 1)
    assert float(sigma.min()) >= 0.0  # ReLU density


def test_instant_decoder_sigma_bias(rng_key):
    """softplus(h - 5) should start tiny (reference: src/decoders.py:153)."""
    p = D.instant_decoder_init(rng_key, 32, 27, hidden_dim=16)
    rgb, sigma = D.instant_decoder_apply(p, jnp.zeros((9, 32)),
                                         jnp.zeros((9, 27)))
    assert rgb.shape == (9, 3) and sigma.shape == (9, 1)
    assert float(sigma.mean()) < 0.05


def test_deformation_starts_near_identity(rng_key):
    p = D.deformation_net_init(rng_key, 63, 21, hidden_dim=16, num_layers=3)
    delta = D.deformation_net_apply(p, jnp.ones((11, 63)), jnp.ones((11, 21)))
    assert delta.shape == (11, 3)
    assert float(jnp.abs(delta).max()) < 1e-2


def test_time_modulation_initial_gate(rng_key):
    """bias -1 => initial sigmoid output near 0.27
    (reference: src/decoders.py:358-359)."""
    p = D.time_modulation_init(rng_key, 21, output_dim=8, hidden_dim=8)
    out = D.time_modulation_apply(p, jnp.zeros((5, 21)))
    assert out.shape == (5, 8)
    assert 0.0 < float(out.min()) and float(out.max()) < 1.0
    np.testing.assert_allclose(np.asarray(out[0]).mean(),
                               1 / (1 + np.e), atol=0.1)


def test_hash_deform_scale(rng_key):
    p = D.hash_deform_decoder_init(rng_key, 24, 8, hidden_dim=16)
    np.testing.assert_allclose(float(p["displacement_scale"]), 0.1)
    d = D.hash_deform_decoder_apply(p, jnp.ones((4, 24)), jnp.ones((4, 8)))
    assert d.shape == (4, 3)
