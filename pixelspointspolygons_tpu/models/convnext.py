"""ConvNeXt-V2-style dense encoder (FFL's convnext_v2 option,
reference models/ffl/model_ffl.py:114-152 via transformers ConvNextV2Model).

Compact flax implementation: patchify stem (4×4/4), stages of depthwise-7x7
+ pointwise-MLP blocks with GRN (the V2 ingredient), downsampling between
stages, and an FPN-style head back to in_size/4 for the FFL decoder.
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

Dtype = Any


class GRN(nn.Module):
    """Global response normalization (ConvNeXt-V2)."""

    dim: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        gamma = self.param("gamma", nn.initializers.zeros, (1, 1, 1, self.dim))
        beta = self.param("beta", nn.initializers.zeros, (1, 1, 1, self.dim))
        gx = jnp.sqrt(jnp.sum(x**2, axis=(1, 2), keepdims=True) + 1e-12)
        nx = gx / (gx.mean(axis=-1, keepdims=True) + 1e-6)
        return gamma * (x * nx) + beta + x


class ConvNeXtBlock(nn.Module):
    dim: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = nn.Conv(
            self.dim, (7, 7), padding="SAME", feature_group_count=self.dim, dtype=self.dtype
        )(x)
        h = nn.LayerNorm(dtype=self.dtype)(h)
        h = nn.Dense(4 * self.dim, dtype=self.dtype)(h)
        h = nn.gelu(h)
        h = GRN(4 * self.dim, dtype=self.dtype)(h)
        h = nn.Dense(self.dim, dtype=self.dtype)(h)
        return x + h


class ConvNeXtEncoder(nn.Module):
    """Output (B, in_size/4, in_size/4, out_dim)."""

    in_size: int = 224
    depths: Sequence[int] = (3, 3, 9, 3)
    dims: Sequence[int] = (96, 192, 384, 768)
    out_dim: int = 256
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, images, *, train: bool = False):
        x = nn.Conv(self.dims[0], (4, 4), (4, 4), dtype=self.dtype)(images)
        x = nn.LayerNorm(dtype=self.dtype)(x)
        feats = []
        for si, (depth, dim) in enumerate(zip(self.depths, self.dims)):
            if si > 0:
                x = nn.LayerNorm(dtype=self.dtype)(x)
                x = nn.Conv(dim, (2, 2), (2, 2), dtype=self.dtype)(x)
            for _ in range(depth):
                x = ConvNeXtBlock(dim, dtype=self.dtype)(x)
            feats.append(x)
        tgt = feats[0].shape[1:3]
        ups = [feats[0]] + [
            jax.image.resize(f, (f.shape[0], *tgt, f.shape[-1]), "bilinear")
            for f in feats[1:]
        ]
        x = jnp.concatenate(ups, axis=-1)
        x = nn.Conv(self.out_dim, (1, 1), dtype=self.dtype)(x)
        x = nn.BatchNorm(momentum=0.9, use_running_average=not train, dtype=self.dtype)(x)
        return nn.relu(x)
