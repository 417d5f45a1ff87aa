"""nerf_tpu — a TPU-native neural radiance field framework (JAX/XLA/Pallas).

Re-implements the full capability surface of the reference Project-NeRF chain
(2D Fourier fitting, vanilla NeRF, Instant-NGP, D-NeRF, Dual-Hash dynamic NeRF)
as a functional JAX framework designed for TPU: static shapes, jit-compiled
train/render steps, bf16 compute with fp32 compositing, Pallas kernels for the
hash-grid hot path, and `jax.sharding` data parallelism over the ray axis.
"""

__version__ = "0.1.0"


def enable_compile_cache(cache_dir: str = "~/.jax_cache") -> None:
    """Enable JAX's persistent compilation cache.

    The render/train programs take minutes to compile (remote TPU compile
    service + single host core); caching makes every rerun of an unchanged
    program near-free. Called by the CLI entrypoints (run.py, bench.py,
    tools/) rather than at import time, so embedding processes importing
    nerf_tpu as a library do not inherit a mutated global JAX config.
    Opt out with NERF_TPU_NO_COMPILE_CACHE=1.
    """
    import os

    if os.environ.get("NERF_TPU_NO_COMPILE_CACHE"):
        return
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser(cache_dir))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
