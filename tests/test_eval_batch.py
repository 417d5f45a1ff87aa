"""Frame-batched eval (ImageRenderer.eval_split_mses) == per-image eval.

The batched path exists purely to amortize per-image dispatch latency;
it must produce the SAME per-image PSNRs as the per-image loop (same
sampler, same chunking, same target compositing)."""

import numpy as np
import pytest

import jax.numpy as jnp

from nerf_tpu.data.blender import BlenderDataset, DynamicDataset
from nerf_tpu.data.synthetic import make_synthetic_blender_scene
from nerf_tpu.models import build_field
from nerf_tpu.render.density_grid import DensityGridSpec
from nerf_tpu.train.common import ImageRenderer, evaluate_split

import jax


def _tiny_cfg(mode="part2_instant", **kw):
    cfg = {
        "mode": mode, "n_levels": 4, "n_features_per_level": 2,
        "log2_hashmap_size": 10, "base_resolution": 4,
        "per_level_scale": 1.5, "scene_bound": 1.5, "L_embed_dir": 2,
        "hidden_dim": 16, "near": 2.0, "far": 6.0,
    }
    cfg.update(kw)
    return cfg


@pytest.mark.parametrize("sampling", ["dense", "cdf"])
def test_eval_batch_matches_per_image(tmp_path, sampling):
    root = make_synthetic_blender_scene(
        str(tmp_path / "s"), n_train=2, n_val=2, n_test=5, image_size=24)
    ds = BlenderDataset(root, "test", 1, True, 1.0)
    cfg = _tiny_cfg()
    field = build_field(cfg)
    params = jax.jit(field.init)(jax.random.PRNGKey(0))
    spec = DensityGridSpec(8, 1.5, 0.01)
    binary = jnp.asarray(
        np.random.default_rng(0).random((8, 8, 8)) < 0.5)

    renderer = ImageRenderer(
        field, near=2.0, far=6.0, n_samples=16, chunk=256,
        grid_spec=spec, sampling=sampling)

    # per-image reference: force the fallback loop
    orig = renderer.eval_split_mses
    renderer.eval_split_mses = lambda *a, **k: None
    ref_avg, ref_ps = evaluate_split(field, params, ds, renderer,
                                     grid_binary=binary)
    renderer.eval_split_mses = orig

    avg, ps = evaluate_split(field, params, ds, renderer,
                             grid_binary=binary)
    assert len(ps) == len(ref_ps) == 5
    np.testing.assert_allclose(ps, ref_ps, rtol=0, atol=1e-4)
    np.testing.assert_allclose(avg, ref_avg, atol=1e-4)


def test_eval_batch_dynamic_time(tmp_path):
    root = make_synthetic_blender_scene(
        str(tmp_path / "d"), n_train=2, n_val=2, n_test=4, image_size=24,
        dynamic=True)
    ds = DynamicDataset(root, "test", 1, True, 1.0)
    cfg = _tiny_cfg(mode="part3", canonical_type="instant",
                    deform_n_levels=3,
                    deform_n_features_per_level=2,
                    deform_log2_hashmap_size=9,
                    deform_base_resolution=4,
                    deform_per_level_scale=1.5, deform_hidden_dim=16)
    field = build_field(cfg)
    params = jax.jit(field.init)(jax.random.PRNGKey(1))
    spec = DensityGridSpec(8, 1.5, 0.01)
    binary = jnp.ones((8, 8, 8), bool)

    renderer = ImageRenderer(field, near=2.0, far=6.0, n_samples=16,
                             chunk=256, grid_spec=spec, sampling="cdf")

    orig = renderer.eval_split_mses
    renderer.eval_split_mses = lambda *a, **k: None
    ref_avg, ref_ps = evaluate_split(field, params, ds, renderer,
                                     grid_binary=binary)
    renderer.eval_split_mses = orig
    avg, ps = evaluate_split(field, params, ds, renderer,
                             grid_binary=binary)
    # time must differ per frame: a wrong (e.g. zero) time would still
    # "pass" a pure-equality check only if the field ignored time, so
    # sanity-check the per-frame PSNRs are not all identical.
    np.testing.assert_allclose(ps, ref_ps, rtol=0, atol=1e-4)
    assert len(set(np.round(ps, 6))) > 1
