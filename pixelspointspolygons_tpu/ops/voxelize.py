"""Pillar voxelization: fixed-shape, deterministic, fully on-device.

TPU-native rebuild of the Open3D-ML PointPillars voxelization +
PillarFeatureNet input construction + scatter that the reference uses as its
LiDAR patch-embed (reference: models/pointpillars/pointpillars_o3d.py:11-107;
native ops inventoried in SURVEY.md §2.15 item 3).

Reference semantics preserved:
- grid over point-cloud-range [0,0,0,W,H,100] with voxel (vx,vy,vz), vz spans
  the full z range so pillars are 2-D cells;
- at most `max_points_per_voxel` points kept per pillar, FIRST-COME in input
  order (this is the knob of the LiDAR-density ablation, so order semantics
  matter — implemented via stable sort by pillar id + within-run rank);
- per-point decorated features: [x, y, z, dx_c, dy_c, dz_c, dx_p, dy_p]
  (offsets to the pillar's kept-point centroid and to the pillar x/y center);
- scatter of per-pillar features to a dense (ny, nx) canvas.

Consciously TPU-first divergence (documented per SURVEY.md §7.4): no
`max_num_voxels` truncation — the canvas is dense, so the reference's
memory cap (64000 of 65536 cells at 512px) is unnecessary; at 224px the cap
equals the full grid anyway.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .segment import rank_in_run, segment_sum


class PillarAssignment(NamedTuple):
    """Per-point pillar assignment for one sample (sorted by pillar id)."""

    points: jnp.ndarray  # (N, 3) sorted by pillar id (invalid last)
    pillar_id: jnp.ndarray  # (N,) int32; = n_cells for dropped/invalid points
    keep: jnp.ndarray  # (N,) bool: valid & within per-pillar capacity
    features: jnp.ndarray  # (N, 8) decorated PFN input features
    n_cells: int  # nx * ny


def assign_pillars(
    points: jnp.ndarray,
    valid: jnp.ndarray,
    *,
    width: float,
    height: float,
    voxel_x: float,
    voxel_y: float,
    max_points_per_voxel: int,
) -> PillarAssignment:
    """Compute pillar ids, capacity mask, and decorated features.

    points: (N, 3) float (x, y, z) in pixel coords; valid: (N,) bool mask for
    padding. Fully static shapes; vmap over the batch dimension.
    """
    nx = int(round(width / voxel_x))
    ny = int(round(height / voxel_y))
    n_cells = nx * ny
    n = points.shape[0]

    x, y = points[:, 0], points[:, 1]
    ix = jnp.floor(x / voxel_x).astype(jnp.int32)
    iy = jnp.floor(y / voxel_y).astype(jnp.int32)
    in_range = (0 <= ix) & (ix < nx) & (0 <= iy) & (iy < ny) & valid
    pid = jnp.where(in_range, iy * nx + ix, n_cells)

    # stable sort by pillar id keeps input order within a pillar → first-come
    order = jnp.argsort(pid, stable=True)
    pid_s = pid[order]
    pts_s = points[order]

    rank = rank_in_run(pid_s)
    keep = (pid_s < n_cells) & (rank < max_points_per_voxel)
    pid_kept = jnp.where(keep, pid_s, n_cells)

    # kept-point centroid per pillar
    w = keep.astype(points.dtype)[:, None]
    sums = segment_sum(pts_s * w, pid_kept, n_cells + 1)  # (n_cells+1, 3)
    cnts = segment_sum(w, pid_kept, n_cells + 1)  # (n_cells+1, 1)
    centroid = sums / jnp.maximum(cnts, 1.0)
    c = centroid[pid_kept]  # (N, 3)

    cx = (pid_s % nx).astype(points.dtype) * voxel_x + voxel_x / 2
    cy = (pid_s // nx).astype(points.dtype) * voxel_y + voxel_y / 2

    feats = jnp.concatenate(
        [
            pts_s,
            pts_s - c,
            (pts_s[:, 0] - cx)[:, None],
            (pts_s[:, 1] - cy)[:, None],
        ],
        axis=1,
    )
    feats = feats * w  # zero out dropped points

    return PillarAssignment(pts_s, pid_kept, keep, feats, n_cells)


def scatter_pillars(
    point_feats: jnp.ndarray,
    pillar_id: jnp.ndarray,
    keep: jnp.ndarray,
    n_cells: int,
    ny: int,
    nx: int,
) -> jnp.ndarray:
    """Max-pool per-point features into pillars and scatter to a dense canvas.

    point_feats: (N, C); returns (ny, nx, C). Empty pillars are zero.
    """
    neg = jnp.finfo(point_feats.dtype).min
    masked = jnp.where(keep[:, None], point_feats, neg)
    pooled = jax.ops.segment_max(masked, pillar_id, num_segments=n_cells + 1)
    # empty segments come back as -inf, fully-masked ones as finfo.min
    pooled = jnp.where(pooled > neg / 2, pooled, 0.0)[:n_cells]
    return pooled.reshape(ny, nx, -1)


def voxelize_batch(
    points: jnp.ndarray,
    valid: jnp.ndarray,
    **kw,
) -> PillarAssignment:
    """vmap of assign_pillars over the batch: points (B,N,3), valid (B,N)."""
    return jax.vmap(lambda p, v: assign_pillars(p, v, **kw))(points, valid)
