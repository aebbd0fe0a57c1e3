"""UNet-over-ResNet encoder (FFL's 512px image option).

Capability parity with reference models/unetresnet/unet_resnet.py (UNet
decoder over a torchvision ResNet101 trunk): ResNet bottleneck stages with a
UNet-style decoder that upsamples back to input resolution with skip
connections. Depth is parameterized (ResNet101's [3,4,23,3] by default,
tiny in tests).
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

Dtype = Any


class Bottleneck(nn.Module):
    ch: int
    stride: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        h = nn.Conv(self.ch, (1, 1), use_bias=False, dtype=self.dtype)(x)
        h = nn.BatchNorm(momentum=0.9, use_running_average=not train, dtype=self.dtype)(h)
        h = nn.relu(h)
        h = nn.Conv(self.ch, (3, 3), (self.stride, self.stride), padding="SAME", use_bias=False, dtype=self.dtype)(h)
        h = nn.BatchNorm(momentum=0.9, use_running_average=not train, dtype=self.dtype)(h)
        h = nn.relu(h)
        h = nn.Conv(self.ch * 4, (1, 1), use_bias=False, dtype=self.dtype)(h)
        h = nn.BatchNorm(momentum=0.9, use_running_average=not train, dtype=self.dtype)(h)
        if x.shape[-1] != self.ch * 4 or self.stride != 1:
            x = nn.Conv(self.ch * 4, (1, 1), (self.stride, self.stride), use_bias=False, dtype=self.dtype)(x)
            x = nn.BatchNorm(momentum=0.9, use_running_average=not train, dtype=self.dtype)(x)
        return nn.relu(x + h)


class UNetResNetEncoder(nn.Module):
    """Output (B, in_size, in_size, out_dim)."""

    in_size: int = 512
    out_dim: int = 32
    base_width: int = 64
    stage_blocks: Sequence[int] = (3, 4, 23, 3)
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, images, *, train: bool = False):
        x = nn.Conv(self.base_width, (7, 7), (2, 2), padding="SAME", use_bias=False, dtype=self.dtype)(images)
        x = nn.BatchNorm(momentum=0.9, use_running_average=not train, dtype=self.dtype)(x)
        stem = nn.relu(x)  # 1/2
        x = nn.max_pool(stem, (3, 3), (2, 2), padding="SAME")  # 1/4

        skips = [images, stem]
        widths = [self.base_width, self.base_width * 2, self.base_width * 4, self.base_width * 8]
        for si, (n, wch) in enumerate(zip(self.stage_blocks, widths)):
            for bi in range(n):
                stride = 2 if (bi == 0 and si > 0) else 1
                x = Bottleneck(wch, stride, dtype=self.dtype)(x, train=train)
            skips.append(x)
        # skips: [input(1), stem(1/2), s1(1/4), s2(1/8), s3(1/16), s4(1/32)]
        x = skips[-1]
        for skip in reversed(skips[:-1]):
            tgt = skip.shape[1:3]
            x = jax.image.resize(x, (x.shape[0], *tgt, x.shape[-1]), "bilinear")
            x = jnp.concatenate([x, skip], axis=-1)
            ch = max(self.out_dim, skip.shape[-1])
            x = nn.Conv(ch, (3, 3), padding="SAME", use_bias=False, dtype=self.dtype)(x)
            x = nn.BatchNorm(momentum=0.9, use_running_average=not train, dtype=self.dtype)(x)
            x = nn.relu(x)
        x = nn.Conv(self.out_dim, (3, 3), padding="SAME", dtype=self.dtype)(x)
        x = nn.BatchNorm(momentum=0.9, use_running_average=not train, dtype=self.dtype)(x)
        return nn.relu(x)
