"""Vision Transformer encoders (ViT-S family), from scratch in flax.

Capability parity with the reference's timm-backed encoders
(models/vision_transformer/vit.py:12-50 ViT, vit_cnn.py:11-57 ViTCNN):
- `ViTBackbone`: ViT-S (dim 384, 12 blocks, 6 heads) with CLS token and
  learned position embeddings; patch size / image size from config.
- `ViTEncoder`: backbone → drop CLS → optional AdaptiveAvgPool1d channel
  bottleneck (384→out_feature_dim) → (B, N, D) tokens.
- `ViTCNNEncoder`: backbone → drop CLS → reshape to map → bilinear upsample
  to out_feature_size → 3x3 conv + BN + ReLU → (B, H', W', D) dense map.

TPU notes: patch embedding is a conv that XLA maps to the MXU; attention is
plain batched matmul at 785 tokens — no flash kernel needed at this length.
The `patch_embed_override` hook lets the PointPillars/fusion encoders swap in
their own token source while reusing the transformer trunk (the reference
does this by monkey-patching timm's patch_embed, pointpillars_vit.py:64).
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from .layers import MlpBlock, MultiHeadAttention, adaptive_avg_pool1d

Dtype = Any


class ViTBlock(nn.Module):
    dim: int
    num_heads: int
    mlp_ratio: float = 4.0
    layer_scale: bool = False  # DINOv2-style LayerScale (ls1/ls2 gammas)
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
        h = nn.LayerNorm(dtype=self.dtype)(x)
        h = MultiHeadAttention(self.dim, self.num_heads, dtype=self.dtype)(h, h)
        if self.layer_scale:
            h = h * self.param("ls1", nn.initializers.constant(1e-5), (self.dim,)).astype(h.dtype)
        x = x + h
        h = nn.LayerNorm(dtype=self.dtype)(x)
        h = MlpBlock(int(self.dim * self.mlp_ratio), self.dim, dtype=self.dtype)(
            h, deterministic=deterministic
        )
        if self.layer_scale:
            h = h * self.param("ls2", nn.initializers.constant(1e-5), (self.dim,)).astype(h.dtype)
        return x + h


class ViTBackbone(nn.Module):
    """ViT trunk producing (B, 1 + N, dim) tokens (CLS first)."""

    img_size: int = 224
    patch_size: int = 8
    dim: int = 384
    depth: int = 12
    num_heads: int = 6
    layer_scale: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        images: Optional[jnp.ndarray] = None,
        *,
        tokens: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
    ):
        """images: (B, H, W, 3) NHWC — or pass precomputed `tokens`
        (B, N, dim) from an alternative patch embed (lidar pillars, fusion)."""
        if tokens is None:
            x = nn.Conv(
                self.dim,
                (self.patch_size, self.patch_size),
                strides=(self.patch_size, self.patch_size),
                padding="VALID",
                dtype=self.dtype,
                name="patch_embed",
            )(images)
            B, gh, gw, _ = x.shape
            x = x.reshape(B, gh * gw, self.dim)
        else:
            x = tokens
        B, N, _ = x.shape

        cls = self.param("cls_token", nn.initializers.normal(0.02), (1, 1, self.dim))
        pos = self.param(
            "pos_embed", nn.initializers.normal(0.02), (1, N + 1, self.dim)
        )
        x = jnp.concatenate([jnp.tile(cls.astype(self.dtype), (B, 1, 1)), x], axis=1)
        x = x + pos.astype(self.dtype)

        for i in range(self.depth):
            x = ViTBlock(
                self.dim, self.num_heads, layer_scale=self.layer_scale,
                dtype=self.dtype, name=f"block{i}",
            )(
                x, deterministic=deterministic
            )
        return nn.LayerNorm(dtype=self.dtype, name="norm")(x)


class ViTEncoder(nn.Module):
    """Token encoder: drop CLS, optional channel bottleneck. Output (B, N, D)."""

    img_size: int = 224
    patch_size: int = 8
    dim: int = 384
    depth: int = 12
    num_heads: int = 6
    out_dim: Optional[int] = 256  # None = no bottleneck
    layer_scale: bool = False  # DINOv2 trunk
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, images, *, deterministic: bool = True):
        x = ViTBackbone(
            self.img_size, self.patch_size, self.dim, self.depth, self.num_heads,
            layer_scale=self.layer_scale, dtype=self.dtype, name="vit",
        )(images, deterministic=deterministic)
        x = x[:, 1:]
        if self.out_dim is not None and self.out_dim != self.dim:
            x = adaptive_avg_pool1d(x, self.out_dim)
        return x


class ViTCNNEncoder(nn.Module):
    """Dense-map encoder for HiSup/FFL heads. Output (B, S, S, out_dim) NHWC."""

    img_size: int = 224
    patch_size: int = 8
    dim: int = 384
    depth: int = 12
    num_heads: int = 6
    out_size: int = 224
    out_dim: int = 256
    layer_scale: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, images, *, train: bool = False, deterministic: bool = True):
        x = ViTBackbone(
            self.img_size, self.patch_size, self.dim, self.depth, self.num_heads,
            layer_scale=self.layer_scale, dtype=self.dtype, name="vit",
        )(images, deterministic=deterministic)
        x = x[:, 1:]
        B, N, C = x.shape
        g = int(round(N ** 0.5))
        x = x.reshape(B, g, g, C)
        x = jax.image.resize(x, (B, self.out_size, self.out_size, C), "bilinear")
        x = nn.Conv(self.out_dim, (3, 3), padding="SAME", dtype=self.dtype)(x)
        x = nn.BatchNorm(momentum=0.9, use_running_average=not train, dtype=self.dtype)(x)
        return nn.relu(x)
