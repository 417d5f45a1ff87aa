"""Outage-resume: full-train-state save/restore (utils/resume.py).

The relay tunnel to the TPU has died mid-run in three separate rounds;
`run.py --resume` must continue a killed training run from its last
validation checkpoint with NOTHING lost: optimizer moments, cosine
phase, step counter, and the host RNG stream all come back, so an
interrupted-and-resumed run produces bit-identical parameters to an
uninterrupted one.
"""

import os
import types

import jax
import jax.numpy as jnp
import numpy as np
import optax

from nerf_tpu.utils.resume import load_train_state, save_train_state


def test_roundtrip_preserves_optax_state(tmp_path):
    """opt_state pytrees (nested namedtuples with counts) survive the
    numpy pickle roundtrip structurally intact."""
    params = {"w": jnp.arange(6.0).reshape(2, 3), "b": jnp.zeros((3,))}
    tx = optax.chain(optax.clip_by_global_norm(1.0),
                     optax.adamw(optax.cosine_decay_schedule(1e-2, 100)))
    opt_state = tx.init(params)
    # advance one step so counts/moments are non-trivial
    grads = jax.tree.map(jnp.ones_like, params)
    _, opt_state = tx.update(grads, opt_state, params)

    path = str(tmp_path / "resume.pth")
    rng = jax.random.PRNGKey(7)
    save_train_state(path, params, opt_state, step=41, best_val=26.5,
                     rng=rng, wall=123.4, extra={"grid": None})
    st = load_train_state(path)
    assert st["step"] == 41
    assert st["best_val"] == 26.5
    assert st["wall"] == 123.4
    assert st["grid"] is None
    np.testing.assert_array_equal(st["rng"], np.asarray(rng))
    restored = jax.tree.map(jnp.asarray, st["opt_state"])
    # structure (incl. namedtuple classes) and values match
    chex_like = jax.tree_util.tree_structure(opt_state)
    assert jax.tree_util.tree_structure(restored) == chex_like
    for a, b in zip(jax.tree_util.tree_leaves(opt_state),
                    jax.tree_util.tree_leaves(restored)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))


def test_load_missing_or_corrupt_returns_none(tmp_path):
    assert load_train_state(str(tmp_path / "absent.pth")) is None
    bad = tmp_path / "bad.pth"
    bad.write_bytes(b"not a pickle")
    assert load_train_state(str(bad)) is None


def _args(data_dir, resume=False):
    return types.SimpleNamespace(
        data_dir=data_dir, checkpoint=None, eval_only=False, render_n=0,
        render_chunk=None, image=None, resume=resume)


def test_interrupted_resume_matches_straight_run(tmp_path):
    """Train 6 steps straight vs 3 steps + resume for 3 more: identical
    final params (same RNG stream, same optimizer trajectory).

    Flat LR (eta_min == lr) so the cosine phase is independent of the
    first segment's shorter train_iters; no density grid so the staged
    update schedule (a function of train_iters) cannot diverge either.
    """
    from nerf_tpu.data.synthetic import make_synthetic_blender_scene
    from nerf_tpu.train.part2_instant import run_part2_instant

    scene = make_synthetic_blender_scene(
        str(tmp_path / "scene"), n_train=4, n_val=2, n_test=2,
        image_size=16)
    base = {
        "mode": "part2_instant", "n_levels": 4, "log2_hashmap_size": 9,
        "hidden_dim": 16, "scene_bound": 1.5, "batch_size": 64,
        "n_samples": 8, "render_n_samples": 8, "chunk": 256,
        "learning_rate": 0.01, "eta_min": 0.01,
        "log_every": 3, "val_every": 3, "use_density_grid": False,
    }
    cfg_a = {**base, "train_iters": 6, "log_dir": str(tmp_path / "A")}
    run_part2_instant(cfg_a, _args(scene))

    cfg_b = {**base, "train_iters": 3, "log_dir": str(tmp_path / "B")}
    run_part2_instant(cfg_b, _args(scene))
    cfg_b2 = {**base, "train_iters": 6, "log_dir": str(tmp_path / "B")}
    run_part2_instant(cfg_b2, _args(scene, resume=True))

    name = os.path.basename(scene)
    st_a = load_train_state(str(tmp_path / "A" / name / "resume.pth"))
    st_b = load_train_state(str(tmp_path / "B" / name / "resume.pth"))
    assert st_a["step"] == st_b["step"] == 6
    # wall accumulates across segments (B's total covers both)
    assert st_b["wall"] > 0
    for a, b in zip(jax.tree_util.tree_leaves(st_a["params"]),
                    jax.tree_util.tree_leaves(st_b["params"])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=0, atol=0)
