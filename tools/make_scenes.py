"""Materialize the persistent proxy scenes used by the at-scale runs.

The build VM wipes /tmp between sessions; every chip job needs these
Blender-format scene directories, so they live under data_scenes/
(gitignored — regenerate with this script, ~8 min per variant on the
1-core host). Generation is idempotent: a `.complete` marker skips
already-populated scenes.

Scenes (mirroring the reference's NeRF-Synthetic Lego / D-NeRF Standup
workloads, reference README.md:11-14):
  * lego_proxy   — static, 100/10/20 at 800^2 (part1/2/2i benchmarks)
  * dyn_proxy    — dynamic 'smooth' motion (part3/part4)
  * dyn_gentle   — dynamic 'gentle' motion (part4 second scene)
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

# CPU-only workload; do not touch the TPU tunnel.
import jax

jax.config.update("jax_platforms", "cpu")

ROOT = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "data_scenes")


def main():
    from nerf_tpu.data.synthetic import make_lego_proxy_scene

    only = sys.argv[1] if len(sys.argv) > 1 else None
    jobs = [
        ("lego_proxy", dict(dynamic=False)),
        ("dyn_proxy", dict(dynamic=True, motion="smooth")),
        ("dyn_gentle", dict(dynamic=True, motion="gentle")),
    ]
    for name, kw in jobs:
        if only and name != only:
            continue
        t0 = time.time()
        path = make_lego_proxy_scene(os.path.join(ROOT, name), **kw)
        print(f"[scenes] {name}: ready at {path} "
              f"({time.time() - t0:.0f}s)", flush=True)


if __name__ == "__main__":
    main()
