import jax.numpy as jnp
import numpy as np

from nerf_tpu.ops.fourier import fourier_encode, fourier_out_dim


def test_out_dim():
    assert fourier_out_dim(2, 10) == 2 + 2 * 2 * 10
    assert fourier_out_dim(3, 4) == 3 + 2 * 3 * 4
    assert fourier_out_dim(3, 0) == 3


def test_passthrough_when_L0():
    x = jnp.ones((5, 3))
    assert fourier_encode(x, 0).shape == (5, 3)
    np.testing.assert_allclose(fourier_encode(x, 0), x)


def test_values_closed_form():
    x = jnp.asarray([[0.25, -0.5]])
    out = np.asarray(fourier_encode(x, 2))
    # layout: (x, sin(pi x), cos(pi x), sin(2 pi x), cos(2 pi x))
    assert out.shape == (1, 2 + 2 * 2 * 2)
    np.testing.assert_allclose(out[0, :2], [0.25, -0.5], rtol=1e-6)
    np.testing.assert_allclose(out[0, 2:4],
                               np.sin(np.pi * np.array([0.25, -0.5])),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(out[0, 4:6],
                               np.cos(np.pi * np.array([0.25, -0.5])),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(out[0, 6:8],
                               np.sin(2 * np.pi * np.array([0.25, -0.5])),
                               rtol=1e-5, atol=1e-6)


def test_batch_shape():
    x = jnp.zeros((4, 7, 3))
    assert fourier_encode(x, 5).shape == (4, 7, 3 + 2 * 3 * 5)
