"""Multimodal fusion encoders.

Capability parity with the reference fusion layers
(models/fusion_layers/early_fusion_vit.py:13-127 EarlyFusionViT,
early_fusion_vit_cnn.py EarlyFusionViTCNN, fusion_hrnet.py FusionHRNet):
image patch features and lidar pillar features are concatenated on the
channel axis at the patch grid and fused with a 3x3 conv + BN + ReLU before
the shared ViT trunk. Whole-batch stochastic lidar-feature dropout
(cfg.experiment.lidar_dropout, early_fusion_vit.py:113-121) is reproduced
with an explicit rng so it stays jittable.
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from .layers import adaptive_avg_pool1d
from .pointpillars import PillarCanvas
from .vit import ViTBackbone

Dtype = Any


class EarlyFusionViTEncoder(nn.Module):
    """Image + LiDAR early fusion → ViT tokens (B, N, out_dim)."""

    img_size: int = 224
    patch_size: int = 8
    dim: int = 384
    depth: int = 12
    num_heads: int = 6
    out_dim: Optional[int] = 256
    width: float = 224.0
    height: float = 224.0
    voxel_x: float = 8.0
    voxel_y: float = 8.0
    max_points_per_voxel: int = 64
    lidar_dropout: Optional[float] = None
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, images, points, valid, *, train: bool = False, deterministic: bool = True):
        # image patch embedding (same conv patch embed as the plain ViT)
        x_img = nn.Conv(
            self.dim,
            (self.patch_size, self.patch_size),
            strides=(self.patch_size, self.patch_size),
            padding="VALID",
            dtype=self.dtype,
            name="patch_embed",
        )(images)  # (B, gh, gw, D)

        x_lidar = PillarCanvas(
            self.width, self.height, self.voxel_x, self.voxel_y,
            self.max_points_per_voxel, feat_channels=(64, self.dim),
            dtype=self.dtype, name="pillar_canvas",
        )(points, valid, train=train)  # (B, gh, gw, D)

        if self.lidar_dropout is not None and train:
            # whole-batch feature dropout, one bernoulli per step
            drop = jax.random.uniform(self.make_rng("lidar_dropout"), ()) <= self.lidar_dropout
            x_lidar = jnp.where(drop, 0.0, x_lidar)

        x = jnp.concatenate([x_img, x_lidar], axis=-1)
        x = nn.Conv(self.dim, (3, 3), padding="SAME", dtype=self.dtype, name="fusion_conv")(x)
        x = nn.BatchNorm(momentum=0.9, use_running_average=not train, dtype=self.dtype, name="fusion_bn")(x)
        x = nn.relu(x)

        B, gh, gw, D = x.shape
        tokens = x.reshape(B, gh * gw, D)
        x = ViTBackbone(
            self.img_size, self.patch_size, self.dim, self.depth, self.num_heads,
            dtype=self.dtype, name="vit",
        )(tokens=tokens, deterministic=deterministic)
        x = x[:, 1:]
        if self.out_dim is not None and self.out_dim != self.dim:
            x = adaptive_avg_pool1d(x, self.out_dim)
        return x


class EarlyFusionViTCNNEncoder(nn.Module):
    """Early fusion + dense-map projection for HiSup/FFL decoders.

    Output (B, out_size, out_size, out_dim) NHWC.
    """

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
    lidar_dropout: Optional[float] = None
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, images, points, valid, *, train: bool = False, deterministic: bool = True):
        tokens = EarlyFusionViTEncoder(
            self.img_size, self.patch_size, self.dim, self.depth, self.num_heads,
            out_dim=None,
            width=self.width, height=self.height,
            voxel_x=self.voxel_x, voxel_y=self.voxel_y,
            max_points_per_voxel=self.max_points_per_voxel,
            lidar_dropout=self.lidar_dropout,
            dtype=self.dtype, name="fusion_vit",
        )(images, points, valid, train=train, deterministic=deterministic)
        B, N, C = tokens.shape
        g = int(round(N**0.5))
        x = tokens.reshape(B, g, g, C)
        x = jax.image.resize(x, (B, self.out_size, self.out_size, C), "bilinear")
        x = nn.Conv(self.out_dim, (3, 3), padding="SAME", dtype=self.dtype)(x)
        x = nn.BatchNorm(momentum=0.9, use_running_average=not train, dtype=self.dtype)(x)
        return nn.relu(x)
