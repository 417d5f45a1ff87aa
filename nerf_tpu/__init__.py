"""nerf_tpu — a TPU-native neural radiance field framework (JAX/XLA/Pallas).

Re-implements the full capability surface of the reference Project-NeRF chain
(2D Fourier fitting, vanilla NeRF, Instant-NGP, D-NeRF, Dual-Hash dynamic NeRF)
as a functional JAX framework designed for TPU: static shapes, jit-compiled
train/render steps, bf16 compute with fp32 compositing, Pallas kernels for the
hash-grid hot path, and `jax.sharding` data parallelism over the ray axis.
"""

__version__ = "0.1.0"

import os as _os

if not _os.environ.get("NERF_TPU_NO_COMPILE_CACHE"):
    # Persistent XLA compilation cache: the render/train programs take
    # minutes to compile (remote TPU compile service + single host core);
    # caching makes every rerun of an unchanged program near-free. Opt out
    # with NERF_TPU_NO_COMPILE_CACHE=1.
    import jax as _jax

    _jax.config.update("jax_compilation_cache_dir",
                       _os.path.expanduser("~/.jax_cache"))
    _jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
