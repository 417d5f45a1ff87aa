"""Multi-device data parallelism on the 8-virtual-CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from nerf_tpu.data.blender import RayData
from nerf_tpu.models import build_field
from nerf_tpu.parallel.mesh import make_mesh, make_parallel_train_step


@pytest.mark.skipif(jax.device_count() < 8, reason="needs 8 devices")
def test_sharded_train_step_runs_and_improves(rng_key):
    cfg = {"mode": "part2_instant", "n_levels": 4, "log2_hashmap_size": 10,
           "hidden_dim": 16, "scene_bound": 1.5}
    field = build_field(cfg)
    params = jax.jit(field.init)(rng_key)

    n_img, H, W = 4, 8, 8
    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.uniform(size=(n_img, H, W, 4)), jnp.float32)
    poses = jnp.broadcast_to(jnp.eye(4), (n_img, 4, 4)).at[:, 0, 3].set(3.0)
    data = RayData(images, poses, None)

    mesh = make_mesh(8)
    tx = optax.adam(1e-2)
    opt_state = tx.init(params)
    step = make_parallel_train_step(field, tx, data, mesh,
                                    batch_size=128, H=H, W=W, focal=8.0,
                                    n_samples=8)
    losses = []
    key = rng_key
    for _ in range(10):
        key, s = jax.random.split(key)
        params, opt_state, loss = step(params, opt_state, s)
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]


@pytest.mark.skipif(jax.device_count() < 8, reason="needs 8 devices")
def test_dryrun_multichip_entrypoint():
    import __graft_entry__ as g
    g.dryrun_multichip(8)


def test_entry_compiles_single_device():
    import __graft_entry__ as g
    fn, args = g.entry()
    out = jax.jit(fn)(*args)
    assert out[0].shape == (256, 3)
    assert bool(jnp.all(jnp.isfinite(out[0])))
