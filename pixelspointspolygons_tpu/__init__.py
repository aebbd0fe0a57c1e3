"""P3-TPU: TPU-native (JAX/XLA/Pallas) multimodal building-vectorization framework.

From-scratch rebuild of the capabilities of raphaelsulzer/PixelsPointsPolygons
(reference mounted at /root/reference) with an idiomatic JAX architecture:
functional models (flax.linen), jitted SPMD train/eval steps over a
jax.sharding.Mesh, Pallas kernels for hot ops, and host-side geometry kept
minimal and vectorized.
"""

from .config.engine import Config, compose, default_config_dir

__version__ = "0.1.0"

__all__ = ["Config", "compose", "default_config_dir", "__version__"]
