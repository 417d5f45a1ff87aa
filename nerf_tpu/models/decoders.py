"""Functional decoder heads (param pytree + apply function per decoder).

Re-designs of the reference decoder zoo (reference: src/decoders.py). The two
tiny-cuda-nn `FullyFusedMLP` decoders become plain XLA matmul chains — on TPU
the MXU executes these tiny [N,64]x[64,64] GEMMs at full throughput once the
point batch is large, and XLA fuses the elementwise activations, so a
hand-fused kernel is only used where profiling says it wins (see ops/).

Init tricks that materially affect convergence are preserved exactly:
  * Instant sigma bias: sigma = softplus(h0 - 5) (reference: src/decoders.py:153).
  * Deformation output layer ~ U(-1e-4, 1e-4), zero bias
    (reference: src/decoders.py:185-187).
  * displacement_scale scalar init 0.1 (reference: src/decoders.py:298).
  * Time-modulation last bias -1.0 so sigmoid starts ~0.27
    (reference: src/decoders.py:358-359).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops.mlp import linear_apply, linear_init, mlp_apply, mlp_init


# ----------------------------------------------------------------- StandardMLP
def standard_mlp_init(key, input_dim, hidden_dim=256, output_dim=3,
                      num_layers=3):
    """Part-1 decoder: Linear+ReLU x num_layers, then Linear+Sigmoid
    (reference: src/decoders.py:6-26)."""
    dims = [input_dim] + [hidden_dim] * num_layers + [output_dim]
    return mlp_init(key, dims)


def standard_mlp_apply(params, x):
    return mlp_apply(params, x, final_activation=jax.nn.sigmoid)


# ----------------------------------------------------------------- NeRFDecoder
def nerf_decoder_init(key, pos_dim, dir_dim, hidden_dim=256, num_layers=8,
                      skip_layer=4, view_dim=128):
    """8x256 trunk with a skip concat at `skip_layer`, density + view-dependent
    RGB heads (reference: src/decoders.py:29-87)."""
    ks = jax.random.split(key, num_layers + 4)
    pts = []
    for i in range(num_layers):
        in_dim = pos_dim if i == 0 else hidden_dim
        if i == skip_layer and i > 0:
            in_dim += pos_dim
        pts.append(linear_init(ks[i], in_dim, hidden_dim))
    return {
        "pts": pts,
        "sigma": linear_init(ks[num_layers], hidden_dim, 1),
        "feature": linear_init(ks[num_layers + 1], hidden_dim, hidden_dim),
        "view": linear_init(ks[num_layers + 2], hidden_dim + dir_dim, view_dim),
        "rgb": linear_init(ks[num_layers + 3], view_dim, 3),
    }


def nerf_decoder_apply(params, x, d, *, skip=4):
    h = x
    for i, layer in enumerate(params["pts"]):
        if i == skip and i > 0:
            h = jnp.concatenate([h, x], axis=-1)
        h = jax.nn.relu(linear_apply(layer, h))
    sigma = jax.nn.relu(linear_apply(params["sigma"], h))
    feat = linear_apply(params["feature"], h)
    hv = jnp.concatenate([feat, d], axis=-1)
    hv = jax.nn.relu(linear_apply(params["view"], hv))
    rgb = jax.nn.sigmoid(linear_apply(params["rgb"], hv))
    return rgb, sigma


# -------------------------------------------------------------- InstantDecoder
def instant_decoder_init(key, pos_dim, dir_dim, hidden_dim=64):
    """Instant-NGP head: 1-hidden-layer sigma net (out 16 = 1 sigma + 15 geo),
    2-hidden-layer color net with sigmoid output
    (reference: src/decoders.py:90-162)."""
    k1, k2 = jax.random.split(key)
    return {
        "sigma_net": mlp_init(k1, [pos_dim, hidden_dim, 16]),
        "color_net": mlp_init(k2, [16 + dir_dim, hidden_dim, hidden_dim, 3]),
    }


def instant_decoder_apply(params, x_enc, d_enc):
    h = mlp_apply(params["sigma_net"], x_enc)              # [N, 16]
    # softplus(x - 5): low default density, smooth gradient
    # (reference: src/decoders.py:151-153). Keep in fp32 for stability.
    sigma = jax.nn.softplus(h[..., 0:1].astype(jnp.float32) - 5.0)
    color_in = jnp.concatenate([h, d_enc], axis=-1)
    rgb = mlp_apply(params["color_net"], color_in,
                    final_activation=jax.nn.sigmoid)
    return rgb, sigma


# -------------------------------------------------------- DeformationNetwork
def deformation_net_init(key, pos_dim, time_dim, hidden_dim=128, num_layers=4):
    """(embed(x), embed(t)) -> delta_x; tiny-uniform output init so the field
    starts near identity (reference: src/decoders.py:165-195)."""
    dims = [pos_dim + time_dim] + [hidden_dim] * (num_layers - 1) + [3]
    layers = mlp_init(key, dims)
    out_key = jax.random.fold_in(key, 1)
    layers[-1] = {
        "w": jax.random.uniform(out_key, layers[-1]["w"].shape,
                                jnp.float32, -1e-4, 1e-4),
        "b": jnp.zeros_like(layers[-1]["b"]),
    }
    return layers


def deformation_net_apply(params, x_feat, t_feat):
    h = jnp.concatenate([x_feat, t_feat], axis=-1)
    return mlp_apply(params, h)


# --------------------------------------------------- HashDeformationDecoder
def hash_deform_decoder_init(key, hash_dim, time_mod_dim, hidden_dim=64):
    """(hash_feat ++ time_mod) -> delta_x via 2x64 MLP, scaled by a learnable
    scalar initialized to 0.1 (reference: src/decoders.py:264-318)."""
    return {
        "net": mlp_init(key, [hash_dim + time_mod_dim,
                              hidden_dim, hidden_dim, 3]),
        "displacement_scale": jnp.asarray(0.1, jnp.float32),
    }


def hash_deform_decoder_apply(params, hash_feat, time_mod):
    h = jnp.concatenate([hash_feat, time_mod], axis=-1)
    delta = mlp_apply(params["net"], h)
    return delta * params["displacement_scale"].astype(delta.dtype)


# ---------------------------------------------------- TimeModulationNetwork
def time_modulation_init(key, time_dim, output_dim=64, hidden_dim=64,
                         num_layers=2):
    """embed(t) -> sigmoid-gated modulation vector in [0,1]^output_dim; last
    layer bias -1.0 so initial gates sit near 0.27
    (reference: src/decoders.py:321-371)."""
    dims = [time_dim] + [hidden_dim] * (num_layers - 1) + [output_dim]
    layers = mlp_init(key, dims)
    # Xavier-uniform final weight + constant -1 bias.
    in_dim, out_dim = layers[-1]["w"].shape
    bound = (6.0 / (in_dim + out_dim)) ** 0.5
    wkey = jax.random.fold_in(key, 2)
    layers[-1] = {
        "w": jax.random.uniform(wkey, (in_dim, out_dim), jnp.float32,
                                -bound, bound),
        "b": jnp.full((out_dim,), -1.0, jnp.float32),
    }
    return layers


def time_modulation_apply(params, time_feat):
    return jax.nn.sigmoid(mlp_apply(params, time_feat))
