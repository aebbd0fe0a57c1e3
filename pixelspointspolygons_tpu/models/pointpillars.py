"""PointPillars-style LiDAR encoders: pillar voxelization → PillarFeatureNet →
dense canvas → ViT trunk.

Capability parity with the reference's Open3D-ML-backed encoders
(models/pointpillars/pointpillars_o3d.py:11-107 PointPillarsEncoder used as a
ViT patch-embed, pointpillars_vit.py:13-76 PointPillarsViT), rebuilt on the
fixed-shape voxelizer in ops/voxelize.py — no CUDA voxelization op, no jagged
tensors: (B, N, 3) + validity mask in, (B, tokens, D) out, all jittable.

PillarFeatureNet follows the reference's two-layer config
(pointpillars_vit.py:59-62: feat_channels [64, patch_feature_dim]): layer 1
Linear(8→64)+BN+ReLU with per-pillar max concatenated back to each point,
layer 2 Linear(128→D)+BN+ReLU, final per-pillar max scattered to the canvas.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.voxelize import assign_pillars
from .layers import adaptive_avg_pool1d
from .vit import ViTBackbone

Dtype = Any


def _masked_segment_max(x, keep, segment_ids, num_segments):
    neg = jnp.finfo(x.dtype).min
    masked = jnp.where(keep[:, None], x, neg)
    pooled = jax.ops.segment_max(masked, segment_ids, num_segments=num_segments)
    return jnp.where(pooled > neg / 2, pooled, 0.0)


class PillarFeatureNet(nn.Module):
    """Per-point MLP with pillar-max context → pooled per-pillar features."""

    feat_channels: tuple[int, ...] = (64, 384)
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, feats, pillar_id, keep, num_segments: int, *, train: bool = False):
        """feats: (N, 8); pillar_id: (N,) in [0, num_segments);
        returns (num_segments, C_last) pooled features."""
        x = feats.astype(self.dtype)
        n_layers = len(self.feat_channels)
        for li, ch in enumerate(self.feat_channels):
            x = nn.Dense(ch, use_bias=False, dtype=self.dtype)(x)
            x = nn.BatchNorm(momentum=0.9, use_running_average=not train, dtype=self.dtype)(x)
            x = nn.relu(x)
            x = x * keep[:, None]
            pooled = _masked_segment_max(x, keep, pillar_id, num_segments)
            if li < n_layers - 1:
                x = jnp.concatenate([x, pooled[pillar_id]], axis=-1)
        return pooled


class PillarCanvas(nn.Module):
    """Voxelize a batch of point clouds and produce the dense feature canvas."""

    width: float
    height: float
    voxel_x: float
    voxel_y: float
    max_points_per_voxel: int
    feat_channels: tuple[int, ...] = (64, 384)
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, points, valid, *, train: bool = False):
        """points: (B, N, 3); valid: (B, N) bool → (B, ny, nx, C)."""
        nx = int(round(self.width / self.voxel_x))
        ny = int(round(self.height / self.voxel_y))
        pfn = PillarFeatureNet(tuple(self.feat_channels), dtype=self.dtype)

        # vmap over batch; BN inside PFN sees per-sample stats if vmapped, so
        # instead flatten batch into one big point set with offset pillar ids —
        # keeps BatchNorm statistics global (matches torch BN over all points).
        B, N, _ = points.shape
        assigns = jax.vmap(
            lambda p, v: assign_pillars(
                p,
                v,
                width=self.width,
                height=self.height,
                voxel_x=self.voxel_x,
                voxel_y=self.voxel_y,
                max_points_per_voxel=self.max_points_per_voxel,
            )
        )(points, valid)
        n_cells = nx * ny
        offsets = (jnp.arange(B) * (n_cells + 1))[:, None]
        flat_pid = (assigns.pillar_id + offsets).reshape(-1)
        flat_feats = assigns.features.reshape(B * N, -1)
        flat_keep = assigns.keep.reshape(-1)

        pooled = pfn(flat_feats, flat_pid, flat_keep, B * (n_cells + 1), train=train)
        C = pooled.shape[-1]
        # drop each sample's dump cell, lay out as dense canvas
        canvas = pooled.reshape(B, n_cells + 1, C)[:, :n_cells]
        return canvas.reshape(B, ny, nx, C)


class PointPillarsViTEncoder(nn.Module):
    """LiDAR-only token encoder: pillar canvas as ViT patch embedding."""

    img_size: int = 224
    patch_size: int = 8
    dim: int = 384
    depth: int = 12
    num_heads: int = 6
    out_dim: int | None = 256
    width: float = 224.0
    height: float = 224.0
    voxel_x: float = 8.0
    voxel_y: float = 8.0
    max_points_per_voxel: int = 64
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, points, valid, *, train: bool = False, deterministic: bool = True):
        canvas = PillarCanvas(
            self.width,
            self.height,
            self.voxel_x,
            self.voxel_y,
            self.max_points_per_voxel,
            feat_channels=(64, self.dim),
            dtype=self.dtype,
            name="pillar_canvas",
        )(points, valid, train=train)
        B, ny, nx, C = canvas.shape
        tokens = canvas.reshape(B, ny * nx, C)
        x = ViTBackbone(
            self.img_size, self.patch_size, self.dim, self.depth, self.num_heads,
            dtype=self.dtype, name="vit",
        )(tokens=tokens, deterministic=deterministic)
        x = x[:, 1:]
        if self.out_dim is not None and self.out_dim != self.dim:
            x = adaptive_avg_pool1d(x, self.out_dim)
        return x


class PointPillarsDenseEncoder(nn.Module):
    """Full PointPillars (canvas → conv backbone → dense map) for HiSup/FFL
    lidar-only at 512px (reference pointpillars_o3d.py:111-220: SECOND
    backbone + SECONDFPN neck + reduce-dim conv). Simplified conv pyramid with
    the same strides/out_channels contract from config."""

    width: float
    height: float
    voxel_x: float
    voxel_y: float
    max_points_per_voxel: int
    out_channels: tuple[int, ...] = (128, 128, 128)
    upsample_strides: tuple[int, ...] = (1, 2, 4)
    out_size: int = 224
    out_dim: int = 256
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, points, valid, *, train: bool = False):
        canvas = PillarCanvas(
            self.width, self.height, self.voxel_x, self.voxel_y,
            self.max_points_per_voxel, feat_channels=(64, 64), dtype=self.dtype,
            name="pillar_canvas",
        )(points, valid, train=train)
        feats = []
        x = canvas
        for i, ch in enumerate(self.out_channels):
            stride = 1 if i == 0 else 2
            x = nn.Conv(ch, (3, 3), (stride, stride), padding="SAME", dtype=self.dtype)(x)
            x = nn.BatchNorm(momentum=0.9, use_running_average=not train, dtype=self.dtype)(x)
            x = nn.relu(x)
            x = nn.Conv(ch, (3, 3), padding="SAME", dtype=self.dtype)(x)
            x = nn.BatchNorm(momentum=0.9, use_running_average=not train, dtype=self.dtype)(x)
            x = nn.relu(x)
            feats.append(x)
        # FPN-style upsample to common resolution and concat
        target = feats[0].shape[1:3]
        ups = [
            jax.image.resize(f, (f.shape[0], *target, f.shape[-1]), "bilinear")
            for f in feats
        ]
        x = jnp.concatenate(ups, axis=-1)
        x = jax.image.resize(x, (x.shape[0], self.out_size, self.out_size, x.shape[-1]), "bilinear")
        x = nn.Conv(self.out_dim, (3, 3), padding="SAME", dtype=self.dtype)(x)
        x = nn.BatchNorm(momentum=0.9, use_running_average=not train, dtype=self.dtype)(x)
        return nn.relu(x)
