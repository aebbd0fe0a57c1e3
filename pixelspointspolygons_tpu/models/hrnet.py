"""HRNetV2-W48-style high-resolution encoder, from scratch in flax.

Capability parity with the reference's vendored HRNet48v2
(models/hrnet/hrnet48v2.py:263-563): a stem downsampling to 1/4 resolution,
parallel multi-resolution branches (widths 48/96/192/384) with repeated
cross-resolution fusion, and an HRNetV2 head that upsamples and concatenates
all branches at 1/4 resolution. The reference feeds the concat through a
1x1 conv to the decoder dim (out = in_size/4, config/encoder/hrnet.yaml).

Re-designed compactly: same topology (4 stages, basic residual blocks,
bilinear up / strided-conv down fusion), parameterized depth so tests can run
a tiny variant. NHWC throughout.
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

Dtype = Any


class BasicBlock(nn.Module):
    ch: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        h = nn.Conv(self.ch, (3, 3), padding="SAME", use_bias=False, dtype=self.dtype)(x)
        h = nn.BatchNorm(use_running_average=not train, dtype=self.dtype)(h)
        h = nn.relu(h)
        h = nn.Conv(self.ch, (3, 3), padding="SAME", use_bias=False, dtype=self.dtype)(h)
        h = nn.BatchNorm(use_running_average=not train, dtype=self.dtype)(h)
        if x.shape[-1] != self.ch:
            x = nn.Conv(self.ch, (1, 1), use_bias=False, dtype=self.dtype)(x)
            x = nn.BatchNorm(use_running_average=not train, dtype=self.dtype)(x)
        return nn.relu(x + h)


class Fuse(nn.Module):
    """Cross-resolution fusion: every branch receives every other branch,
    bilinear-upsampled or strided-conv-downsampled to its resolution."""

    widths: Sequence[int]
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, xs, *, train: bool = False):
        outs = []
        for i, wi in enumerate(self.widths):
            acc = None
            for j, xj in enumerate(xs):
                h = xj
                if j < i:  # downsample by stride-2 convs
                    for s in range(i - j):
                        last = s == i - j - 1
                        h = nn.Conv(
                            wi if last else h.shape[-1],
                            (3, 3),
                            (2, 2),
                            padding="SAME",
                            use_bias=False,
                            dtype=self.dtype,
                        )(h)
                        h = nn.BatchNorm(use_running_average=not train, dtype=self.dtype)(h)
                        if not last:
                            h = nn.relu(h)
                elif j > i:  # 1x1 conv + bilinear upsample
                    h = nn.Conv(wi, (1, 1), use_bias=False, dtype=self.dtype)(h)
                    h = nn.BatchNorm(use_running_average=not train, dtype=self.dtype)(h)
                    tgt = xs[i].shape[1:3]
                    h = jax.image.resize(h, (h.shape[0], *tgt, wi), "bilinear")
                acc = h if acc is None else acc + h
            outs.append(nn.relu(acc))
        return outs


class HRNetEncoder(nn.Module):
    """Output: (B, in_size/4, in_size/4, out_dim)."""

    in_size: int = 224
    width: int = 48
    out_dim: int = 256
    blocks_per_stage: int = 2
    num_stages: int = 4
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, images, *, train: bool = False):
        x = images
        # stem: two stride-2 convs → 1/4 resolution
        for _ in range(2):
            x = nn.Conv(64, (3, 3), (2, 2), padding="SAME", use_bias=False, dtype=self.dtype)(x)
            x = nn.BatchNorm(use_running_average=not train, dtype=self.dtype)(x)
            x = nn.relu(x)

        widths = [self.width * (2**i) for i in range(self.num_stages)]
        xs = [BasicBlock(widths[0], dtype=self.dtype)(x, train=train)]
        for stage in range(1, self.num_stages):
            # add a new lower-resolution branch from the last one
            new = nn.Conv(
                widths[stage], (3, 3), (2, 2), padding="SAME", use_bias=False, dtype=self.dtype
            )(xs[-1])
            new = nn.BatchNorm(use_running_average=not train, dtype=self.dtype)(new)
            xs = xs + [nn.relu(new)]
            for _ in range(self.blocks_per_stage):
                xs = [BasicBlock(w, dtype=self.dtype)(h, train=train) for h, w in zip(xs, widths[: len(xs)])]
            xs = Fuse(widths[: len(xs)], dtype=self.dtype)(xs, train=train)

        # HRNetV2 head: upsample all to 1/4 res, concat, project
        tgt = xs[0].shape[1:3]
        ups = [xs[0]] + [
            jax.image.resize(h, (h.shape[0], *tgt, h.shape[-1]), "bilinear") for h in xs[1:]
        ]
        x = jnp.concatenate(ups, axis=-1)
        x = nn.Conv(self.out_dim, (1, 1), dtype=self.dtype)(x)
        x = nn.BatchNorm(use_running_average=not train, dtype=self.dtype)(x)
        return nn.relu(x)


class FusionHRNetEncoder(nn.Module):
    """HRNet image features ⊕ pillar-ViT lidar features → conv fusion
    (reference models/fusion_layers/fusion_hrnet.py:13-77)."""

    in_size: int = 224
    width: int = 48
    out_dim: int = 256
    blocks_per_stage: int = 2
    vit_dim: int = 384
    vit_depth: int = 12
    voxel_x: float = 8.0
    voxel_y: float = 8.0
    max_points_per_voxel: int = 64
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, images, points, valid, *, train: bool = False):
        img_f = HRNetEncoder(
            self.in_size, self.width, self.out_dim, self.blocks_per_stage,
            dtype=self.dtype, name="hrnet",
        )(images, train=train)  # (B, S/4, S/4, D)
        from .pointpillars import PointPillarsViTEncoder

        lidar_tokens = PointPillarsViTEncoder(
            img_size=self.in_size,
            dim=self.vit_dim,
            depth=self.vit_depth,
            out_dim=None,
            width=float(self.in_size),
            height=float(self.in_size),
            voxel_x=self.voxel_x,
            voxel_y=self.voxel_y,
            max_points_per_voxel=self.max_points_per_voxel,
            dtype=self.dtype,
            name="pp_vit",
        )(points, valid, train=train)  # (B, N, vit_dim)
        B, N, C = lidar_tokens.shape
        g = int(round(N**0.5))
        lid_f = lidar_tokens.reshape(B, g, g, C)
        tgt = img_f.shape[1:3]
        lid_f = jax.image.resize(lid_f, (B, *tgt, C), "bilinear")
        x = jnp.concatenate([img_f, lid_f], axis=-1)
        x = nn.Conv(self.out_dim, (3, 3), padding="SAME", dtype=self.dtype)(x)
        x = nn.BatchNorm(use_running_average=not train, dtype=self.dtype)(x)
        return nn.relu(x)
