"""HiSup-specific encoder variant: PointPillarsViTCNN
(reference models/pointpillars/pointpillars_vit_cnn.py: pillar-ViT tokens →
dense map projection, same head as ViTCNN)."""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..pointpillars import PointPillarsViTEncoder

Dtype = Any


class PointPillarsViTCNNEncoder(nn.Module):
    img_size: int = 224
    patch_size: int = 8
    dim: int = 384
    depth: int = 12
    num_heads: int = 6
    out_size: int = 224
    out_dim: int = 256
    width: float = 224.0
    height: float = 224.0
    voxel_x: float = 8.0
    voxel_y: float = 8.0
    max_points_per_voxel: int = 64
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, points, valid, *, train: bool = False, deterministic: bool = True):
        tokens = PointPillarsViTEncoder(
            img_size=self.img_size,
            patch_size=self.patch_size,
            dim=self.dim,
            depth=self.depth,
            num_heads=self.num_heads,
            out_dim=None,
            width=self.width,
            height=self.height,
            voxel_x=self.voxel_x,
            voxel_y=self.voxel_y,
            max_points_per_voxel=self.max_points_per_voxel,
            dtype=self.dtype,
            name="pp_vit",
        )(points, valid, train=train, deterministic=deterministic)
        B, N, C = tokens.shape
        g = int(round(N**0.5))
        x = tokens.reshape(B, g, g, C)
        x = jax.image.resize(x, (B, self.out_size, self.out_size, C), "bilinear")
        x = nn.Conv(self.out_dim, (3, 3), padding="SAME", dtype=self.dtype)(x)
        x = nn.BatchNorm(momentum=0.9, use_running_average=not train, dtype=self.dtype)(x)
        return nn.relu(x)
