"""nerf_tpu — a TPU-native neural radiance field framework (JAX/XLA/Pallas).

Re-implements the full capability surface of the reference Project-NeRF chain
(2D Fourier fitting, vanilla NeRF, Instant-NGP, D-NeRF, Dual-Hash dynamic NeRF)
as a functional JAX framework designed for TPU: static shapes, jit-compiled
train/render steps, bf16 compute with fp32 compositing, Pallas kernels for the
hash-grid hot path, and `jax.sharding` data parallelism over the ray axis.
"""

__version__ = "0.1.0"
