"""Pallas TPU kernel for the attraction-field map (AFM).

The XLA version (ops/afm.py) materializes a (row_block, W, L) distance tensor
per map step; this kernel instead keeps the GT segments resident in VMEM and
streams a (TILE_H, W) pixel tile through the VPU with a `fori_loop` over
segments, carrying the running (min-dist, offset, label) — no HBM traffic
beyond one read of the segment list and one write of the outputs.

Semantics identical to afm.cu:29-84 / ops/afm.py (signed-log offsets,
argmin labels); falls back to interpreter mode off-TPU so tests run on CPU.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

TILE_H = 8


def _afm_kernel(lines_ref, valid_ref, afmap_ref, label_ref, *, height, width, tile_h):
    ti = pl.program_id(1)
    L = lines_ref.shape[1]

    # TPU iota must be integer-typed; cast after
    rows = (
        ti * tile_h + jax.lax.broadcasted_iota(jnp.int32, (tile_h, width), 0)
    ).astype(jnp.float32)
    cols = jax.lax.broadcasted_iota(jnp.int32, (tile_h, width), 1).astype(jnp.float32)

    init = (
        jnp.full((tile_h, width), 1e30, jnp.float32),  # best dist²
        jnp.zeros((tile_h, width), jnp.float32),  # ax
        jnp.zeros((tile_h, width), jnp.float32),  # ay
        jnp.zeros((tile_h, width), jnp.int32),  # label
    )

    def body(i, carry):
        best, bax, bay, blab = carry
        x1 = lines_ref[0, i, 0]
        y1 = lines_ref[0, i, 1]
        x2 = lines_ref[0, i, 2]
        y2 = lines_ref[0, i, 3]
        ok = valid_ref[0, i, 0] > 0
        dx = x2 - x1
        dy = y2 - y1
        norm2 = dx * dx + dy * dy
        t = ((cols - x1) * dx + (rows - y1) * dy) / (norm2 + 1e-6)
        t = jnp.clip(t, 0.0, 1.0)
        ax = x1 + t * dx - cols
        ay = y1 + t * dy - rows
        d = ax * ax + ay * ay
        upd = (d < best) & ok
        return (
            jnp.where(upd, d, best),
            jnp.where(upd, ax, bax),
            jnp.where(upd, ay, bay),
            jnp.where(upd, i, blab),
        )

    best, ax, ay, lab = jax.lax.fori_loop(0, L, body, init)

    enc = lambda a, size: -jnp.sign(a) * jnp.log(jnp.abs(a / size) + 1e-6)
    any_valid = best[0, 0] < 1e29  # at least one segment updated
    afmap_ref[0, 0] = jnp.where(any_valid, enc(ax, float(width)), 0.0)
    afmap_ref[0, 1] = jnp.where(any_valid, enc(ay, float(height)), 0.0)
    label_ref[0] = jnp.where(any_valid, lab, 0)


@partial(jax.jit, static_argnames=("height", "width", "interpret"))
def afm_pallas(
    lines: jnp.ndarray,
    lines_valid: jnp.ndarray,
    height: int,
    width: int,
    interpret: bool = False,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """lines: (B, L, 4); lines_valid: (B, L) → ((B,2,H,W), (B,H,W))."""
    B, L, _ = lines.shape
    tile_h = TILE_H
    grid = (B, height // tile_h)
    valid_f = lines_valid.astype(jnp.float32)[..., None]  # (B, L, 1)

    afmap, label = pl.pallas_call(
        partial(_afm_kernel, height=height, width=width, tile_h=tile_h),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, L, 4), lambda b, t: (b, 0, 0)),
            pl.BlockSpec((1, L, 1), lambda b, t: (b, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, 2, tile_h, width), lambda b, t: (b, 0, t, 0)),
            pl.BlockSpec((1, tile_h, width), lambda b, t: (b, t, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, 2, height, width), jnp.float32),
            jax.ShapeDtypeStruct((B, height, width), jnp.int32),
        ],
        interpret=interpret,
    )(lines.astype(jnp.float32), valid_f)
    return afmap, label
