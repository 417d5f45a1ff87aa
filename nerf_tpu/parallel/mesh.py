"""Multi-chip data parallelism over the ray-batch axis.

The reference is strictly single-GPU (SURVEY.md section 2.3: no
torch.distributed anywhere); the natural TPU scaling story for NeRF training
is data parallelism over rays: parameters replicated (every model in the zoo
is well under 100 MB), each chip renders its own ray sub-batch, and gradients
are reduced with one `psum` riding the ICI mesh. This module implements that
with `shard_map` over a 1-D `jax.sharding.Mesh`, so the same code drives a
v5e pod slice or the 8-virtual-device CPU mesh used in tests.

The sample-per-ray axis (the framework's sequence/context-parallel analog,
SURVEY.md section 2.3) stays on-chip: samples along a ray interact through
the compositing scan, so splitting rays — which are embarrassingly parallel —
is strictly cheaper than ring-style sample parallelism.
"""

from __future__ import annotations

from functools import partial
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, PartitionSpec as P

from ..data.blender import sample_random_rays
from ..render.renderer import render_rays

shard_map = jax.shard_map


def make_mesh(n_devices: Optional[int] = None, axis: str = "data") -> Mesh:
    """1-D device mesh over the ray-batch axis."""
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(devs, (axis,))


def make_parallel_train_step(
    field,
    tx: optax.GradientTransformation,
    data,
    mesh: Mesh,
    *,
    batch_size: int,
    H: int,
    W: int,
    focal: float,
    scene_scale: float = 1.0,
    near: float = 2.0,
    far: float = 6.0,
    n_samples: int = 32,
    white_bkgd: bool = True,
    axis: str = "data",
) -> Callable:
    """Build a jitted, mesh-sharded train step.

    Per device: sample batch/n_dev rays with a device-unique key, render,
    MSE against the composited target, local grads. Cross-device: one psum
    over grads (and the loss) — parameters and optimizer state stay
    replicated bit-identically on every chip.

    Returns step(params, opt_state, rng) -> (params, opt_state, loss).
    """
    n_dev = mesh.shape[axis]
    if batch_size % n_dev:
        raise ValueError(f"batch_size {batch_size} must be divisible by "
                         f"the mesh size {n_dev}")
    local_batch = batch_size // n_dev
    bg = (jnp.ones((3,), jnp.float32) if white_bkgd
          else jnp.zeros((3,), jnp.float32))

    def _local_step(params, rng, data):
        # Device-unique randomness: fold in the mesh position.
        rng = jax.random.fold_in(rng, jax.lax.axis_index(axis))
        r_sample, r_render = jax.random.split(rng)
        rays_o, rays_d, rgba, times = sample_random_rays(
            data, r_sample, local_batch, H, W, focal, scene_scale)
        target = rgba[:, :3] * rgba[:, 3:4] + bg * (1.0 - rgba[:, 3:4])

        def loss_fn(p):
            out = render_rays(
                field, p, rays_o, rays_d, rng=r_render, near=near, far=far,
                n_samples=n_samples, perturb=True, times=times,
                bg_color=bg, train=True)
            return jnp.mean((out[0] - target) ** 2)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        # Ride the ICI: mean-reduce grads + loss across the mesh.
        grads = jax.lax.pmean(grads, axis)
        loss = jax.lax.pmean(loss, axis)
        return loss, grads

    sharded = shard_map(
        _local_step, mesh=mesh,
        in_specs=(P(), P(), P()),     # params + rng + dataset replicated
        out_specs=(P(), P()),         # loss + grads replicated (post-pmean)
        check_vma=False,
    )

    @jax.jit
    def step(params, opt_state, rng):
        loss, grads = sharded(params, rng, data)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return step
