"""Stage-level timing of the part2_instant train step on the TPU.

Isolates the step's cost components to target the <5-minute training
budget (reference: README.md:12, configs/part2_instant.yaml.example):
  * full jitted train step (the production path, grid on, budget mode)
  * forward-only loss
  * forward+backward without the optimizer update
  * hash encode forward alone / encode forward+backward (the scatter-add
    suspect: 16 brick-row scatters per point by the v5e cost model)
  * occupancy probe + budget selection alone

Methodology (memory: tpu-v5e-performance-model): one jit per stage,
varied inputs every timed call (tunnel memoizes), float() digest sync,
measured null-dispatch overhead subtracted.

Usage: python -u tools/profile_train.py [--batch 16384] [--budget 32]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16384)
    ap.add_argument("--budget", type=int, default=32)
    ap.add_argument("--n_samples", type=int, default=128)
    ap.add_argument("--budget_mode", default="first")
    ap.add_argument("--reps", type=int, default=10)
    ap.add_argument("--hash_impl", default=None,
                    help="pin the hash table layout (brick/exact/...); "
                         "default = the package default")
    ap.add_argument("--dense_max_entries", type=int, default=None,
                    help="tbrick dense-prefix cap (hash_dense_max_entries)")
    args = ap.parse_args()

    from nerf_tpu import enable_compile_cache
    enable_compile_cache()
    import jax
    import jax.numpy as jnp
    import numpy as np

    from nerf_tpu.models import build_field
    from nerf_tpu.ops.hashgrid import hash_encode
    from nerf_tpu.render.density_grid import (DensityGridSpec,
                                              grid_active_mask)
    from nerf_tpu.render.renderer import render_rays, _select_k_cdf, \
        _select_k_per_ray

    cfg = {
        "mode": "part2_instant", "n_levels": 16, "n_features_per_level": 2,
        "log2_hashmap_size": 19, "base_resolution": 16,
        "per_level_scale": 1.5, "scene_bound": 1.5, "L_embed_dir": 4,
        "hidden_dim": 64,
    }
    if args.hash_impl:
        cfg["hash_impl"] = args.hash_impl
    if args.dense_max_entries:
        cfg["hash_dense_max_entries"] = args.dense_max_entries
    field = build_field(cfg)
    params = jax.jit(field.init)(jax.random.PRNGKey(0))
    table_key = next(iter(field.specs))
    spec = field.specs[table_key]
    gspec = DensityGridSpec(128, 1.5, 0.01)
    lin = np.linspace(-1.5, 1.5, 128, dtype=np.float32)
    xx, yy, zz = np.meshgrid(lin, lin, lin, indexing="ij")
    binary = jnp.asarray((xx ** 2 + yy ** 2 + zz ** 2) < 0.9 ** 2)

    B, S, K = args.batch, args.n_samples, args.budget
    key = jax.random.PRNGKey(1)
    ks = jax.random.split(key, 4)
    # Synthetic rays through the ball.
    d = jax.random.normal(ks[0], (B, 3))
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    rays_o = -4.0 * d
    rays_d = d
    target = jax.random.uniform(ks[1], (B, 3))

    null = jax.jit(lambda p: jnp.sum(p))
    float(null(target))
    t0 = time.perf_counter()
    for i in range(args.reps):
        float(null(target + i * 1e-6))
    overhead = (time.perf_counter() - t0) / args.reps
    print(f"dispatch+sync overhead: {overhead*1e3:.1f} ms", flush=True)

    def timed(name, fn, *arrs):
        f = jax.jit(fn)
        float(f(params, *[a + 99e-6 for a in arrs]))
        t0 = time.perf_counter()
        for i in range(args.reps):
            float(f(params, *[a + i * 1e-6 for a in arrs]))
        dt = (time.perf_counter() - t0) / args.reps - overhead
        print(f"{name:40s} {dt*1e3:8.1f} ms", flush=True)
        return dt

    rng = jax.random.PRNGKey(2)

    def make_loss(capacity):
        def loss_only(p, ro, rd, tg):
            pred, _, _, _ = render_rays(
                field, p, ro, rd, rng=rng, near=2.0, far=6.0, n_samples=S,
                perturb=True, bg_color=jnp.ones(3), train=True,
                grid_binary=binary, grid_spec=gspec, ray_budget=K,
                budget_mode=args.budget_mode, capacity=capacity)
            return jnp.mean((pred - tg) ** 2)
        return loss_only

    def make_fwd_bwd(capacity):
        loss_only = make_loss(capacity)

        def fwd_bwd(p, ro, rd, tg):
            l, g = jax.value_and_grad(loss_only)(p, ro, rd, tg)
            return l \
                + sum(jnp.sum(x[..., :1]) * 0 for x in jax.tree.leaves(g)) \
                + jnp.sum(jax.tree.leaves(g)[0][:3].astype(jnp.float32)) \
                * 1e-12
        return fwd_bwd

    cap = max(4096, int(B * K * 0.5) // 1024 * 1024)
    timed("forward loss (budget path)", make_loss(None),
          rays_o, rays_d, target)
    timed(f"forward loss (budget+compact {cap//1024}k)", make_loss(cap),
          rays_o, rays_d, target)
    timed("forward+backward (budget path)", make_fwd_bwd(None),
          rays_o, rays_d, target)
    timed(f"forward+backward (budget+compact {cap//1024}k)",
          make_fwd_bwd(cap), rays_o, rays_d, target)

    # Hash encode alone at the step's point count.
    pts = jax.random.uniform(ks[2], (B * K, 3), minval=-1.0, maxval=1.0)

    def enc_fwd(p, x):
        return jnp.sum(hash_encode(p[table_key], x, spec)
                       .astype(jnp.float32)[::997])
    timed(f"hash encode fwd ({B*K/1e6:.1f}M pts)", enc_fwd, pts)

    def enc_bwd(p, x):
        def f(tbl):
            return jnp.sum(hash_encode(tbl, x, spec).astype(jnp.float32))
        g = jax.grad(f)(p[table_key])
        return jnp.sum(g[:5].astype(jnp.float32))
    timed(f"hash encode fwd+bwd ({B*K/1e6:.1f}M pts)", enc_bwd, pts)
    pts_c = pts[:cap]
    timed(f"hash encode fwd+bwd ({cap/1e6:.1f}M pts)", enc_bwd, pts_c)

    if spec.impl == "tbrick":
        # The expansion alone (per-step O(table) overhead of tying the
        # dense levels): forward and its overlap-add transpose.
        from nerf_tpu.ops.hashgrid import (_BRICK_C,
                                           _expand_vertices_to_brick_rows)
        f_ = spec.n_features_per_level

        def expand_all(p, x):
            tbl = p[table_key] + x[0, 0] * 1e-9
            acc = 0.0
            for lvl in range(spec.tbrick_split):
                res = spec.resolutions[lvl]
                nb = max(1, -(-(res - 1) // _BRICK_C))
                o = spec.tbrick_dense_offsets[lvl]
                rows = _expand_vertices_to_brick_rows(
                    tbl[o * f_: (o + res ** 3) * f_], res, nb, f_)
                acc = acc + jnp.sum(rows[::1009])
            return acc
        timed(f"tbrick expansion fwd ({spec.tbrick_split} dense lvls)",
              expand_all, pts)

        def expand_bwd(p, x):
            g = jax.grad(lambda t: expand_all({table_key: t}, x))(
                p[table_key])
            return jnp.sum(g[:5])
        timed("tbrick expansion fwd+bwd", expand_bwd, pts)

    # Occupancy probe + budget select alone.
    def probe_select(p, ro, rd):
        t_lin = jnp.linspace(0.0, 1.0, S, dtype=jnp.float32)
        z = 2.0 * (1.0 - t_lin) + 6.0 * t_lin
        pa = ro[:, None, :] + rd[:, None, :] * z[None, :, None]
        m = grid_active_mask(binary, pa.reshape(-1, 3), gspec) \
            .reshape(B, S)
        if args.budget_mode == "cdf":
            idx, n_act = _select_k_cdf(m, K)
        else:
            idx, _ = _select_k_per_ray(m, K)
        return jnp.sum(idx[::101])
    timed("occupancy probe + budget select", probe_select, rays_o, rays_d)


if __name__ == "__main__":
    main()
