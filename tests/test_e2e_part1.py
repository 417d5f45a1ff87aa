"""End-to-end Part 1: fit a small gradient image and check PSNR improves
well past the untrained baseline (SURVEY.md section 4 integration tests)."""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from nerf_tpu.data.synthetic import make_gradient_image
from nerf_tpu.models import build_field
from nerf_tpu.utils.metrics import compute_psnr


def test_part1_fits_gradient_image(rng_key):
    img = make_gradient_image(24, 24)
    h, w, _ = img.shape
    yy, xx = np.meshgrid(np.linspace(0, 1, h), np.linspace(0, 1, w),
                         indexing="ij")
    coords = jnp.asarray(np.stack([yy, xx], -1).reshape(-1, 2), jnp.float32)
    gt = jnp.asarray(img.reshape(-1, 3))

    cfg = {"mode": "part1_fourier", "L_embed": 6, "hidden_dim": 64,
           "output_dim": 3, "num_layers": 3,
           "use_positional_encoding": True}
    field = build_field(cfg)
    params = jax.jit(field.init)(rng_key)
    tx = optax.adam(5e-3)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state):
        def loss_fn(p):
            return jnp.mean((field.apply(p, coords) - gt) ** 2)
        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    first = None
    for i in range(400):
        params, opt_state, loss = step(params, opt_state)
        if first is None:
            first = float(loss)
    final = float(loss)
    assert final < first * 0.1
    assert compute_psnr(final) > 20.0
