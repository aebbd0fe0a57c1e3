"""Scharr spatial gradient in (i, j) = (row, col) coordinates.

Behavioral spec: the vendored kornia SpatialGradient with coord="ij"
(ffl_submodules/pytorch_lydorn/torch_lydorn/kornia/filters/sobel.py:8-70),
used by FFL's seg-gradient losses. Output (B, C, 2, H, W): channel 0 = d/di
(rows), channel 1 = d/dj (cols). Normalized Scharr (weights sum of |.| = 1).
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax

_SCHARR_DJ = jnp.array(
    [[-3.0, 0.0, 3.0], [-10.0, 0.0, 10.0], [-3.0, 0.0, 3.0]], dtype=jnp.float32
) / 32.0
_SCHARR_DI = _SCHARR_DJ.T


def spatial_gradient(x: jnp.ndarray) -> jnp.ndarray:
    """x: (B, C, H, W) → (B, C, 2, H, W) with [d/di, d/dj]."""
    b, c, h, w = x.shape
    k = jnp.stack([_SCHARR_DI, _SCHARR_DJ])[:, None]  # (2,1,3,3)
    k = jnp.tile(k, (c, 1, 1, 1))  # (2C,1,3,3)
    out = lax.conv_general_dilated(
        x,
        k,
        window_strides=(1, 1),
        padding="SAME",
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
        feature_group_count=c,
    )
    return out.reshape(b, c, 2, h, w)
