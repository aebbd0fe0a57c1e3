"""Attraction-field map (AFM): per-pixel signed-log offset to the nearest
GT line segment, plus nearest-segment label.

TPU-native rebuild of the reference's CUDA kernel
(models/hisup/afm_module/afm_op/cuda/afm.cu:29-84): brute-force
pixels x segments point-to-segment distance, argmin, offsets encoded as
-sgn(a) * log(|a / size| + 1e-6). Runs at every HiSup training step
(model_hisup.py:95), so it must be fast: the distance matrix is computed in
row-blocks under `lax.map` to bound memory, everything else is fused
elementwise/VPU work. Segments are pre-scaled to target resolution by the
caller (the CUDA kernel's xs/ys scaling).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


@partial(jax.jit, static_argnames=("height", "width", "row_block"))
def afm(
    lines: jnp.ndarray,
    lines_valid: jnp.ndarray,
    height: int,
    width: int,
    row_block: int = 16,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Compute AFM for a batch.

    lines: (B, L, 4) [x1, y1, x2, y2] in output-pixel coords (pre-scaled).
    lines_valid: (B, L) bool — padding mask.
    Returns (afmap (B, 2, H, W) with [dx-enc, dy-enc], aflabel (B, H, W) int32).
    Pixels of a sample with zero valid lines get offset-encoding of distance 0
    handled as in the reference (label 0, afmap 0).
    """
    B, L, _ = lines.shape

    x1, y1, x2, y2 = lines[..., 0], lines[..., 1], lines[..., 2], lines[..., 3]
    dx = x2 - x1
    dy = y2 - y1
    norm2 = dx * dx + dy * dy  # (B, L)

    xs = jnp.arange(width, dtype=lines.dtype)

    def row_block_fn(h0: jnp.ndarray):
        ys = h0 + jnp.arange(row_block, dtype=lines.dtype)  # (R,)
        # broadcast: (B, R, W, L)
        px = xs[None, None, :, None]
        py = ys[None, :, None, None]
        lx1 = x1[:, None, None, :]
        ly1 = y1[:, None, None, :]
        t = ((px - lx1) * dx[:, None, None, :] + (py - ly1) * dy[:, None, None, :]) / (
            norm2[:, None, None, :] + 1e-6
        )
        t = jnp.clip(t, 0.0, 1.0)
        ax = lx1 + t * dx[:, None, None, :] - px
        ay = ly1 + t * dy[:, None, None, :] - py
        dist = ax * ax + ay * ay
        dist = jnp.where(lines_valid[:, None, None, :], dist, jnp.inf)
        idx = jnp.argmin(dist, axis=-1)  # (B, R, W)
        take = lambda a: jnp.take_along_axis(a, idx[..., None], axis=-1)[..., 0]
        ax_min = take(ax)
        ay_min = take(ay)
        enc = lambda a, size: -jnp.sign(a) * jnp.log(jnp.abs(a / size) + 1e-6)
        return enc(ax_min, float(width)), enc(ay_min, float(height)), idx.astype(jnp.int32)

    h0s = jnp.arange(0, height, row_block, dtype=lines.dtype)
    ex, ey, lab = jax.lax.map(row_block_fn, h0s)  # (H/R, B, R, W)
    # (continued below)

    def fix(a):
        return jnp.moveaxis(a, 1, 0).reshape(B, height, width)

    afmap = jnp.stack([fix(ex), fix(ey)], axis=1)
    aflabel = fix(lab)

    any_valid = jnp.any(lines_valid, axis=1)[:, None, None]
    afmap = jnp.where(any_valid[:, None], afmap, 0.0)
    aflabel = jnp.where(any_valid, aflabel, 0)
    return afmap, aflabel


def afm_auto(lines, lines_valid, height: int, width: int):
    """Dispatch to the Pallas TPU kernel (4.4x faster at HiSup shapes) when
    running on TPU hardware and shapes permit; XLA fallback otherwise."""
    try:
        backend = jax.default_backend()
    except RuntimeError:
        backend = "cpu"
    if backend in ("tpu", "axon") and height % 8 == 0:
        from .afm_pallas import afm_pallas

        return afm_pallas(lines, lines_valid, height, width)
    return afm(lines, lines_valid, height, width)
