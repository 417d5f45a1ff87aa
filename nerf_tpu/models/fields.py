"""Field assembly: config -> (init, apply) for each of the five pipeline modes.

Functional re-design of the reference's `NeuralField` nn.Module
(reference: src/core.py:9-363). Instead of a mode-if/else forward on a
stateful module, `build_field(config)` returns a `Field` whose `apply` is a
pure function of a parameter pytree — the whole train step jit-compiles into
one XLA program with a threaded PRNG key for the train-time coordinate/time
noise augmentation (reference: src/core.py:254-262, 287-294).

Parameter-tree keys intentionally mirror the reference attribute names
(`deform_grid_start`, `canonical_repr`, ...) so the part-4 grouped learning
rates (reference: run.py:1684-1738) and the TV regularizers map over 1:1.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from ..ops.fourier import fourier_encode, fourier_out_dim
from ..ops.hashgrid import (DEFAULT_HASH_IMPL, HashGridSpec,
                            hash_encode, hash_grid_init)
from . import decoders as D


@dataclasses.dataclass(frozen=True)
class Field:
    """A pure-functional neural field.

    apply(params, x, d=None, t=None, *, train=False, rng=None,
          max_level=None) returns
      part1:          rgb [N, 3]
      part2*/static:  (rgb [N,3], sigma [N,1])
      part3/part4:    (rgb [N,3], sigma [N,1], delta_x [N,3])

    `max_level` is the render-time LOD knob: hash-encoded fields evaluate
    only their first `max_level` resolution levels (zeroing the rest), which
    cuts the dominant row-gather cost proportionally. Measured on a trained
    scene: dropping the 2 finest of 12 levels costs 0.00 dB. Fields without
    a hash canonical encoding ignore it.
    """
    mode: str
    init: Callable
    apply: Callable
    needs_dirs: bool
    needs_time: bool
    # Param-tree keys of flat hash tables (for TV losses / checkpoints).
    hash_tables: Tuple[str, ...] = ()
    specs: Dict[str, HashGridSpec] = dataclasses.field(default_factory=dict)
    # Deformation-only displacement: delta(params, x, t) -> [N, 3]
    # (used by the temporal-smoothness / volume-conservation regularizers,
    # reference: run.py:1123-1163, 1862-1896).
    deform_delta: Optional[Callable] = None
    # part4 only: delta through one named anchor grid
    # (reference: run.py:1905-1936 anchor losses).
    deform_delta_via_grid: Optional[Callable] = None
    # Encoder producing the sigma-net input (for render/bake.py): present on
    # fields whose decoder is the instant sigma/color pair.
    encode_for_bake: Optional[Callable] = None
    # Render-time time specialization (part4): the tri-grid triangle
    # interpolation is LINEAR in the tables, so for a single scalar t the
    # three displacement tables blend into ONE (encode(sum_i w_i T_i, x) ==
    # sum_i w_i encode(T_i, x)), halving the hash fields per render point.
    # `blended_field` is the Field that renders blended params;
    # `blend_params(params, t) -> params'` computes them (cheap, per frame).
    blended_field: Optional["Field"] = None
    blend_params: Optional[Callable] = None
    # Optional ray-grouped evaluation: apply_grouped(params, pts [R,k,3],
    # dirs [R,3], t=None, ...) with per-RAY view directions. Render paths
    # broadcast one direction to all k samples of a ray; a field that
    # implements this evaluates its direction encoding / first color-layer
    # contribution once per ray instead of once per sample (k-fold fewer
    # transcendentals on the VPU). Returns the same flat [R*k, ...] shapes
    # as `apply`.
    apply_grouped: Optional[Callable] = None
    # Optional cheap sigma estimate: sigma_at(params, pts [N,3]) -> [N].
    # Orders of magnitude cheaper than `apply` (e.g. one nearest-vertex
    # scalar gather on a baked field vs a 128-lane row + color MLP); used
    # by the hierarchical render path's coarse surface-localization pass,
    # where only a density ESTIMATE for sample placement is needed.
    sigma_at: Optional[Callable] = None


def _hash_spec_from_cfg(cfg: dict, prefix: str = "",
                        default_bound: float = 1.0) -> HashGridSpec:
    g = lambda k, d: cfg.get(prefix + k, d)
    n_feats = g("n_features_per_level", 2)
    # Default history: brick -> exact (round 5, CPU ladder) -> tbrick
    # (round 5, chip A/B at full recipe scale). The CPU ladder's +3.2 dB
    # exact-over-brick gap COMPRESSES to ~0.14 dB at chip scale (2k-step
    # gate recipe: brick 25.75 / tbrick 25.89 / tbrick_hd 25.88), while
    # exact costs ~8x the step time — so the tied-brick layout, which
    # takes the quality edge at brick-class speed, is the default
    # (ops/hashgrid.py::DEFAULT_HASH_IMPL; evidence in AB_RESULTS.md).
    impl = cfg.get("hash_impl", DEFAULT_HASH_IMPL)
    if n_feats != 2 and impl != "exact":
        # Row layouts (brick/tbrick/cell/...) are laid out for F=2; other
        # widths (a valid reference config key) fall back to the faithful
        # per-vertex implementation instead of crashing.
        impl = "exact"
    return HashGridSpec(
        n_levels=g("n_levels", 16),
        n_features_per_level=n_feats,
        log2_hashmap_size=g("log2_hashmap_size", 19),
        base_resolution=g("base_resolution", 16),
        per_level_scale=g("per_level_scale", 1.5),
        bound=cfg.get("scene_bound", default_bound),
        impl=impl,
        # tbrick only: widen the dense (collision-free) level prefix
        # beyond the reference's 2^log2_hashmap_size GPU-memory artifact
        # (key `hash_dense_max_entries`, per-grid via the same prefix
        # rule as the other hash keys).
        dense_max_entries=g("hash_dense_max_entries", None),
    )


def _noise(rng, x, std):
    return x + jax.random.normal(rng, x.shape, x.dtype) * std


def _compute_dtype(cfg: dict):
    """Decoder compute dtype. bf16 halves the MLP/extraction cost on TPU and
    replaces the reference's AMP machinery (reference: run.py:21-27); density
    softplus and compositing always stay fp32."""
    return jnp.bfloat16 if cfg.get("compute_dtype") == "bfloat16" \
        else jnp.float32


def build_field(config: dict) -> Field:
    mode = config["mode"]
    builder = {
        "part1_fourier": _build_part1,
        "part2_nerf": _build_part2,
        "part2_instant": _build_part2_instant,
        "part3": _build_part3,
        "part4": _build_part4,
    }.get(mode)
    if builder is None:
        raise ValueError(f"Unsupported mode: {mode}")
    return builder(config)


# ------------------------------------------------------------------- part 1
def _build_part1(cfg: dict) -> Field:
    use_pe = cfg.get("use_positional_encoding", True)
    L = cfg.get("L_embed", 0) if use_pe else 0
    in_dim = fourier_out_dim(2, L)

    def init(key):
        return {"decoder": D.standard_mlp_init(
            key, in_dim,
            hidden_dim=cfg["hidden_dim"],
            output_dim=cfg["output_dim"],
            num_layers=cfg.get("num_layers", 3))}

    def apply(params, x, d=None, t=None, *, train=False, rng=None,
              max_level=None):
        h = fourier_encode(x, L)
        return D.standard_mlp_apply(params["decoder"], h)

    return Field(mode="part1_fourier", init=init, apply=apply,
                 needs_dirs=False, needs_time=False)


# ------------------------------------------------------------------- part 2
def _build_part2(cfg: dict) -> Field:
    use_pe = cfg.get("use_positional_encoding", True)
    L = cfg.get("L_embed", 0) if use_pe else 0
    use_dir = cfg.get("use_viewdirs", True)
    L_dir = cfg.get("L_embed_dir", 4) if use_dir else 0
    pos_dim = fourier_out_dim(3, L)
    dir_dim = fourier_out_dim(3, L_dir)
    skip = cfg.get("skip_layer", 4)

    def init(key):
        return {"decoder": D.nerf_decoder_init(
            key, pos_dim, dir_dim,
            hidden_dim=cfg.get("hidden_dim", 256),
            num_layers=cfg.get("num_layers", 8),
            skip_layer=skip,
            view_dim=cfg.get("view_dim", 128))}

    def apply(params, x, d=None, t=None, *, train=False, rng=None,
              max_level=None):
        h = fourier_encode(x, L)
        de = fourier_encode(d, L_dir)
        return D.nerf_decoder_apply(params["decoder"], h, de, skip=skip)

    return Field(mode="part2_nerf", init=init, apply=apply,
                 needs_dirs=True, needs_time=False)


# ----------------------------------------------------------- part 2 instant
def _build_part2_instant(cfg: dict) -> Field:
    spec = _hash_spec_from_cfg(cfg, default_bound=1.0)
    L_dir = cfg.get("L_embed_dir", 4)
    dir_dim = fourier_out_dim(3, L_dir)
    cd = _compute_dtype(cfg)

    def init(key):
        k1, k2 = jax.random.split(key)
        return {
            "representation": hash_grid_init(k1, spec),
            "decoder": D.instant_decoder_init(
                k2, spec.out_dim, dir_dim,
                hidden_dim=cfg.get("hidden_dim", 64)),
        }

    def apply(params, x, d=None, t=None, *, train=False, rng=None,
              max_level=None):
        h = hash_encode(params["representation"], x, spec,
                        max_level=max_level).astype(cd)
        de = fourier_encode(d, L_dir).astype(cd)
        return D.instant_decoder_apply(params["decoder"], h, de)

    def encode_for_bake(params, x):
        return hash_encode(params["representation"], x, spec).astype(cd)

    return Field(mode="part2_instant", init=init, apply=apply,
                 needs_dirs=True, needs_time=False,
                 hash_tables=("representation",),
                 specs={"representation": spec},
                 encode_for_bake=encode_for_bake)


# ------------------------------------------------------------------- part 3
def _build_part3(cfg: dict) -> Field:
    L_dir = cfg.get("L_embed_dir", 4)
    L_time = cfg.get("L_embed_time", 10)
    L_deform = cfg.get("L_embed", 10)
    dir_dim = fourier_out_dim(3, L_dir)
    time_dim = fourier_out_dim(1, L_time)
    deform_pos_dim = fourier_out_dim(3, L_deform)
    canonical_type = cfg.get("canonical_type", "nerf")
    dtc = cfg.get("direct_time_conditioning", False)
    skip = cfg.get("skip_layer", 4)

    use_coord_noise = cfg.get("use_coord_noise", False)
    coord_std = cfg.get("coord_noise_std", 0.005)
    time_std = cfg.get("time_noise_std", 0.02)
    cd = _compute_dtype(cfg)

    spec = None
    if canonical_type == "instant":
        spec = _hash_spec_from_cfg(cfg, default_bound=1.0)
        canon_feat_dim = spec.out_dim
    else:
        L_canon = cfg.get("L_embed_canon", 10)
        canon_feat_dim = fourier_out_dim(3, L_canon)

    def init(key):
        ks = jax.random.split(key, 4)
        params = {}
        if dtc:
            # Direct Time Conditioning reuses the NeRF decoder on
            # [embed(x), embed(t)] features (reference: src/core.py:133-146);
            # the reference's separate DirectTimeDecoder is dead code
            # (SURVEY.md quirk) so only the live path is built.
            params["decoder_direct"] = D.nerf_decoder_init(
                ks[0], deform_pos_dim + time_dim, dir_dim,
                hidden_dim=cfg.get("hidden_dim", 256),
                num_layers=cfg.get("num_layers", 8),
                skip_layer=skip, view_dim=cfg.get("view_dim", 128))
            return params
        params["deform_net"] = D.deformation_net_init(
            ks[0], deform_pos_dim, time_dim,
            hidden_dim=cfg.get("deform_hidden_dim", 128),
            num_layers=cfg.get("deform_num_layers", 4))
        if canonical_type == "instant":
            params["canonical_repr"] = hash_grid_init(ks[1], spec)
            params["decoder"] = D.instant_decoder_init(
                ks[2], canon_feat_dim + time_dim, dir_dim,
                hidden_dim=cfg.get("hidden_dim", 64))
        else:
            params["decoder"] = D.nerf_decoder_init(
                ks[2], canon_feat_dim + time_dim, dir_dim,
                hidden_dim=cfg.get("hidden_dim", 256),
                num_layers=cfg.get("num_layers", 8),
                skip_layer=skip, view_dim=cfg.get("view_dim", 128))
        return params

    def _canon_feat(params, x_c, max_level=None):
        if canonical_type == "instant":
            return hash_encode(params["canonical_repr"], x_c, spec,
                               max_level=max_level)
        return fourier_encode(x_c, cfg.get("L_embed_canon", 10))

    def deform_delta(params, x, t):
        fx = fourier_encode(x, L_deform)
        ft = fourier_encode(t, L_time)
        return D.deformation_net_apply(params["deform_net"], fx, ft)

    def apply(params, x, d=None, t=None, *, train=False, rng=None,
              max_level=None):
        if dtc:
            fx = fourier_encode(x, L_deform)
            ft = fourier_encode(t, L_time)
            fd = fourier_encode(d, L_dir)
            h = jnp.concatenate([fx, ft], axis=-1)
            rgb, sigma = D.nerf_decoder_apply(
                params["decoder_direct"], h, fd, skip=skip)
            return rgb, sigma, jnp.zeros_like(x)

        x_deform, t_deform = x, t
        if train and use_coord_noise:
            r1, r2 = jax.random.split(rng)
            if coord_std > 0:
                x_deform = _noise(r1, x, coord_std)
            if time_std > 0:
                t_deform = jnp.clip(_noise(r2, t, time_std), 0.0, 1.0)

        ft = fourier_encode(t_deform, L_time)
        fx = fourier_encode(x_deform, L_deform)
        delta_x = D.deformation_net_apply(params["deform_net"], fx, ft)
        x_canonical = x + delta_x  # original x, not noised (src/core.py:268)

        feat_can = _canon_feat(params, x_canonical, max_level)
        fd = fourier_encode(d, L_dir)
        h = jnp.concatenate([feat_can, ft], axis=-1)
        if canonical_type == "instant":
            rgb, sigma = D.instant_decoder_apply(params["decoder"],
                                                 h.astype(cd), fd.astype(cd))
        else:
            rgb, sigma = D.nerf_decoder_apply(params["decoder"], h, fd,
                                              skip=skip)
        return rgb, sigma, delta_x

    tables = ("canonical_repr",) if (canonical_type == "instant" and not dtc) \
        else ()
    return Field(mode="part3", init=init, apply=apply,
                 needs_dirs=True, needs_time=True,
                 hash_tables=tables,
                 specs={"canonical_repr": spec} if spec else {},
                 deform_delta=None if dtc else deform_delta)


# ------------------------------------------------------------------- part 4
def _build_part4(cfg: dict) -> Field:
    L_dir = cfg.get("L_embed_dir", 4)
    L_time = cfg.get("L_embed_time", 10)
    dir_dim = fourier_out_dim(3, L_dir)
    time_dim = fourier_out_dim(1, L_time)
    time_mod_dim = cfg.get("time_modulation_dim", 64)
    time_mod_layers = cfg.get("time_modulation_layers", 2)

    deform_feats = cfg.get("deform_n_features_per_level", 2)
    deform_impl = cfg.get("hash_impl", DEFAULT_HASH_IMPL)
    if deform_feats != 2 and deform_impl != "exact":
        deform_impl = "exact"   # row layouts are F=2-only (see above)
    deform_spec = HashGridSpec(
        n_levels=cfg.get("deform_n_levels", 14),
        n_features_per_level=deform_feats,
        log2_hashmap_size=cfg.get("deform_log2_hashmap_size", 19),
        base_resolution=cfg.get("deform_base_resolution", 16),
        per_level_scale=cfg.get("deform_per_level_scale", 1.5),
        bound=cfg.get("scene_bound", 1.5),
        impl=deform_impl,
        dense_max_entries=cfg.get("deform_hash_dense_max_entries", None),
    )
    canon_spec = _hash_spec_from_cfg(cfg, default_bound=1.5)

    use_coord_noise = cfg.get("use_coord_noise", False)
    coord_std = cfg.get("coord_noise_std", 0.005)
    time_std = cfg.get("time_noise_std", 0.02)
    cd = _compute_dtype(cfg)

    # Interpolation anchors at t = 0, 0.5, 1 with triangle weights of
    # bandwidth 0.5 (reference: src/core.py:300-338; the comments in the
    # reference contradict the code — the code's anchors are used).
    anchors = jnp.asarray([0.0, 0.5, 1.0], jnp.float32)

    def init(key):
        ks = jax.random.split(key, 8)
        start = hash_grid_init(ks[0], deform_spec)
        # Perturb mid/end so the three anchor grids break symmetry
        # (reference: src/core.py:192-196).
        mid = hash_grid_init(ks[0], deform_spec) \
            + jax.random.normal(ks[1], start.shape) * 1e-4
        end = hash_grid_init(ks[0], deform_spec) \
            + jax.random.normal(ks[2], start.shape) * 1e-4
        return {
            "deform_grid_start": start,
            "deform_grid_mid": mid,
            "deform_grid_end": end,
            "time_modulation": D.time_modulation_init(
                ks[3], time_dim, output_dim=time_mod_dim,
                hidden_dim=time_mod_dim, num_layers=time_mod_layers),
            "deform_decoder": D.hash_deform_decoder_init(
                ks[4], deform_spec.out_dim, time_mod_dim,
                hidden_dim=cfg.get("deform_hidden_dim", 64)),
            "canonical_repr": hash_grid_init(ks[5], canon_spec),
            "decoder": D.instant_decoder_init(
                ks[6], canon_spec.out_dim + time_dim, dir_dim,
                hidden_dim=cfg.get("hidden_dim", 64)),
        }

    def _tri_weights(t_val):
        # w_i = clamp(1 - |t - t_i| / 0.5, 0, 1), normalized
        # (reference: src/core.py:319-332).
        w = jnp.clip(1.0 - jnp.abs(t_val - anchors[None, :]) / 0.5, 0.0, 1.0)
        return w / (jnp.sum(w, axis=-1, keepdims=True) + 1e-8)

    def _deform(params, x_q, t_q):
        """Displacement at query points/times (no noise)."""
        ft = fourier_encode(t_q, L_time)
        tmod = D.time_modulation_apply(params["time_modulation"], ft)
        f_start = hash_encode(params["deform_grid_start"], x_q, deform_spec)
        f_mid = hash_encode(params["deform_grid_mid"], x_q, deform_spec)
        f_end = hash_encode(params["deform_grid_end"], x_q, deform_spec)
        w = _tri_weights(t_q)  # [N, 3]
        feat = (w[:, 0:1] * f_start + w[:, 1:2] * f_mid + w[:, 2:3] * f_end)
        return D.hash_deform_decoder_apply(params["deform_decoder"],
                                           feat, tmod)

    def deform_delta_via_grid(params, grid_name, x_q, t_q):
        ft = fourier_encode(t_q, L_time)
        tmod = D.time_modulation_apply(params["time_modulation"], ft)
        feat = hash_encode(params[grid_name], x_q, deform_spec)
        return D.hash_deform_decoder_apply(params["deform_decoder"],
                                           feat, tmod)

    def apply(params, x, d=None, t=None, *, train=False, rng=None,
              max_level=None):
        x_deform, t_deform = x, t
        if train and use_coord_noise:
            r1, r2 = jax.random.split(rng)
            if coord_std > 0:
                x_deform = _noise(r1, x, coord_std)
            if time_std > 0:
                t_deform = jnp.clip(_noise(r2, t, time_std), 0.0, 1.0)

        delta_x = _deform(params, x_deform, t_deform)
        x_canonical = x + delta_x  # original x (reference: src/core.py:341)

        ft = fourier_encode(t_deform, L_time)
        feat_can = hash_encode(params["canonical_repr"], x_canonical,
                               canon_spec, max_level=max_level)
        fd = fourier_encode(d, L_dir)
        h = jnp.concatenate([feat_can, ft], axis=-1)
        rgb, sigma = D.instant_decoder_apply(params["decoder"],
                                             h.astype(cd), fd.astype(cd))
        return rgb, sigma, delta_x

    # ---- render-time tri-grid blending (eval only) -----------------------
    # For one scalar t the triangle-weighted sum of three encodes equals a
    # single encode of the weight-blended table (trilinear interpolation
    # and the level concat are linear in table entries; the three grids
    # share one spec so their brick/hash indexing is identical). This
    # halves the hash fields per render point: 3 deform + 1 canonical -> 2.
    def blend_params(params, t_scalar):
        t_val = jnp.reshape(jnp.asarray(t_scalar, jnp.float32), (1, 1))
        w = _tri_weights(t_val)[0]                       # [3]
        blended = (w[0] * params["deform_grid_start"]
                   + w[1] * params["deform_grid_mid"]
                   + w[2] * params["deform_grid_end"])
        return {"deform_grid_blend": blended,
                "time_modulation": params["time_modulation"],
                "deform_decoder": params["deform_decoder"],
                "canonical_repr": params["canonical_repr"],
                "decoder": params["decoder"]}

    def apply_blended(params, x, d=None, t=None, *, train=False, rng=None,
                      max_level=None):
        ft = fourier_encode(t, L_time)
        tmod = D.time_modulation_apply(params["time_modulation"], ft)
        feat = hash_encode(params["deform_grid_blend"], x, deform_spec)
        delta_x = D.hash_deform_decoder_apply(params["deform_decoder"],
                                              feat, tmod)
        x_canonical = x + delta_x
        feat_can = hash_encode(params["canonical_repr"], x_canonical,
                               canon_spec, max_level=max_level)
        fd = fourier_encode(d, L_dir)
        h = jnp.concatenate([feat_can, ft], axis=-1)
        rgb, sigma = D.instant_decoder_apply(params["decoder"],
                                             h.astype(cd), fd.astype(cd))
        return rgb, sigma, delta_x

    blended_field = Field(mode="part4_blended", init=None,
                          apply=apply_blended,
                          needs_dirs=True, needs_time=True)

    return Field(
        mode="part4", init=init, apply=apply,
        needs_dirs=True, needs_time=True,
        hash_tables=("deform_grid_start", "deform_grid_mid",
                     "deform_grid_end", "canonical_repr"),
        specs={"deform_grid_start": deform_spec,
               "deform_grid_mid": deform_spec,
               "deform_grid_end": deform_spec,
               "canonical_repr": canon_spec},
        deform_delta=_deform,
        deform_delta_via_grid=deform_delta_via_grid,
        blended_field=blended_field,
        blend_params=jax.jit(blend_params),
    )
