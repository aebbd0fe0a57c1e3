"""Batched bilinear map lookup (the ACM/ASM polygonization data term).

Behavioral spec: ffl_submodules/pytorch_lydorn/torch_lydorn/torch/nn/
functionnal.py:4-42 — positions are (y, x) float pixel coords; corner pixels
clamp at the border; channels gathered per position.
"""

from __future__ import annotations

import jax.numpy as jnp


def bilinear_interpolate(im: jnp.ndarray, pos: jnp.ndarray, batch: jnp.ndarray | None = None) -> jnp.ndarray:
    """Sample `im` at fractional positions.

    im:   (B, C, H, W)
    pos:  (N, 2) in (y, x) order, float
    batch: (N,) int batch index per position (defaults to all zeros)

    Returns (N, C).
    """
    B, C, H, W = im.shape
    y = pos[:, 0]
    x = pos[:, 1]
    if batch is None:
        batch = jnp.zeros((pos.shape[0],), dtype=jnp.int32)

    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    x1 = x0 + 1.0
    y1 = y0 + 1.0

    x0i = jnp.clip(x0.astype(jnp.int32), 0, W - 1)
    x1i = jnp.clip(x1.astype(jnp.int32), 0, W - 1)
    y0i = jnp.clip(y0.astype(jnp.int32), 0, H - 1)
    y1i = jnp.clip(y1.astype(jnp.int32), 0, H - 1)

    Ia = im[batch, :, y0i, x0i]  # (N, C)
    Ib = im[batch, :, y1i, x0i]
    Ic = im[batch, :, y0i, x1i]
    Id = im[batch, :, y1i, x1i]

    wa = ((x1 - x) * (y1 - y))[:, None]
    wb = ((x1 - x) * (y - y0))[:, None]
    wc = ((x - x0) * (y1 - y))[:, None]
    wd = ((x - x0) * (y - y0))[:, None]

    return wa * Ia + wb * Ib + wc * Ic + wd * Id
