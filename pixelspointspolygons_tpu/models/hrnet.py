"""HRNetV2-W48 high-resolution encoder, from scratch in flax — checkpoint-
compatible with the reference's vendored HRNet48v2.

Topology parity with reference models/hrnet/hrnet48v2.py:263-563:
- stem: two stride-2 3x3 convs (3→64→64), BN+ReLU each          (:277-283)
- layer1: 4 Bottleneck blocks at planes=64 (out 256)            (:286-298)
- transition1: 256→48 conv / 256→96 stride-2 conv               (:313)
- stage2: 1 module × 2 branches × 4 BasicBlocks  [48, 96]       (:301-316)
- stage3: 4 modules × 3 branches × 4 BasicBlocks [48, 96, 192]  (:319-334)
- stage4: 3 modules × 4 branches × 4 BasicBlocks [...384]       (:337-352)
- each module ends in full cross-resolution fusion (1x1 conv+BN+bilinear up
  with align_corners=True for finer targets, chained stride-2 3x3 convs for
  coarser targets, sum + ReLU)                                   (:181-254)
- HRNetV2 head: upsample all branches to 1/4 res (align_corners=True),
  concat (720 ch), 1x1 conv(720)+BN+ReLU, 1x1 conv→256           (:355-372,521-529)

The parameter tree is laid out so `utils.torch_port.port_hrnet` can map the
ImageNet `hrnetv2_w48_imagenet_pretrained.pth` state_dict key-for-key
(forward parity covered by tests/test_torch_port.py). All 3x3 convs use
explicit ((1,1),(1,1)) padding to reproduce torch's pad-1 sampling grid at
stride 2 (XLA "SAME" would pad asymmetrically and shift the grid).

TPU notes: NHWC throughout; the align_corners=True bilinear resizes are
expressed as two small dense interpolation matmuls (MXU-friendly, exact)
instead of gather-based `jax.image.resize` (which is half-pixel /
align_corners=False and would break checkpoint parity).
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp

Dtype = Any


def _interp_matrix(n_out: int, n_in: int, dtype=jnp.float32) -> jnp.ndarray:
    """(n_out, n_in) linear-interpolation matrix with align_corners=True
    semantics: output i samples input at i*(n_in-1)/(n_out-1)."""
    if n_in == 1:
        return jnp.ones((n_out, 1), dtype)
    if n_out == 1:
        return jnp.zeros((1, n_in), dtype).at[0, 0].set(1)
    pos = jnp.arange(n_out, dtype=jnp.float32) * (n_in - 1) / (n_out - 1)
    lo = jnp.clip(jnp.floor(pos).astype(jnp.int32), 0, n_in - 1)
    hi = jnp.minimum(lo + 1, n_in - 1)
    w = (pos - lo.astype(jnp.float32)).astype(dtype)
    rows = jnp.arange(n_out)
    m = jnp.zeros((n_out, n_in), dtype)
    m = m.at[rows, lo].add(1 - w)
    m = m.at[rows, hi].add(w)
    return m


def resize_align_corners(x: jnp.ndarray, out_hw: Sequence[int]) -> jnp.ndarray:
    """Bilinear NHWC resize with align_corners=True (torch F.interpolate
    parity), as two interpolation matmuls."""
    H2, W2 = int(out_hw[0]), int(out_hw[1])
    B, H, W, C = x.shape
    if (H, W) == (H2, W2):
        return x
    mh = _interp_matrix(H2, H, x.dtype)
    mw = _interp_matrix(W2, W, x.dtype)
    return jnp.einsum("oh,pw,bhwc->bopc", mh, mw, x)


def _conv(ch, k, s=1, bias=False, name=None, dtype=jnp.float32):
    pad = ((k // 2, k // 2),) * 2 if k > 1 else "VALID"
    return nn.Conv(ch, (k, k), (s, s), padding=pad, use_bias=bias, dtype=dtype, name=name)


class BasicBlock(nn.Module):
    """Two 3x3 convs + residual (reference hrnet48v2.py:37-66)."""

    ch: int
    stride: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        bn = lambda name: nn.BatchNorm(momentum=0.9, use_running_average=not train, dtype=self.dtype, name=name)
        h = _conv(self.ch, 3, self.stride, dtype=self.dtype, name="conv1")(x)
        h = bn("bn1")(h)
        h = nn.relu(h)
        h = _conv(self.ch, 3, dtype=self.dtype, name="conv2")(h)
        h = bn("bn2")(h)
        if self.stride != 1 or x.shape[-1] != self.ch:
            x = _conv(self.ch, 1, self.stride, dtype=self.dtype, name="down_conv")(x)
            x = bn("down_bn")(x)
        return nn.relu(x + h)


class Bottleneck(nn.Module):
    """1x1 → 3x3 → 1x1(×4) + residual (reference hrnet48v2.py:69-107)."""

    planes: int
    stride: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        out_ch = self.planes * 4
        bn = lambda name: nn.BatchNorm(momentum=0.9, use_running_average=not train, dtype=self.dtype, name=name)
        h = _conv(self.planes, 1, dtype=self.dtype, name="conv1")(x)
        h = bn("bn1")(h)
        h = nn.relu(h)
        h = _conv(self.planes, 3, self.stride, dtype=self.dtype, name="conv2")(h)
        h = bn("bn2")(h)
        h = nn.relu(h)
        h = _conv(out_ch, 1, dtype=self.dtype, name="conv3")(h)
        h = bn("bn3")(h)
        if self.stride != 1 or x.shape[-1] != out_ch:
            x = _conv(out_ch, 1, self.stride, dtype=self.dtype, name="down_conv")(x)
            x = bn("down_bn")(x)
        return nn.relu(x + h)


class HRModule(nn.Module):
    """One HighResolutionModule: per-branch residual blocks then full
    cross-resolution fusion (reference hrnet48v2.py:110-254)."""

    widths: Sequence[int]
    num_blocks: int = 4
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, xs, *, train: bool = False):
        n = len(self.widths)
        assert len(xs) == n
        xs = list(xs)
        for i, w in enumerate(self.widths):
            for k in range(self.num_blocks):
                xs[i] = BasicBlock(w, dtype=self.dtype, name=f"branch{i}_b{k}")(
                    xs[i], train=train
                )
        if n == 1:
            return xs
        bn = lambda name: nn.BatchNorm(momentum=0.9, use_running_average=not train, dtype=self.dtype, name=name)
        outs = []
        for i in range(n):
            acc = None
            for j in range(n):
                if j == i:
                    t = xs[j]
                elif j > i:  # coarser→finer: 1x1 conv + BN + bilinear up
                    t = _conv(self.widths[i], 1, dtype=self.dtype, name=f"fuse{i}_{j}_conv")(xs[j])
                    t = bn(f"fuse{i}_{j}_bn")(t)
                    t = resize_align_corners(t, xs[i].shape[1:3])
                else:  # finer→coarser: chain of stride-2 3x3 convs
                    t = xs[j]
                    for k in range(i - j):
                        last = k == i - j - 1
                        ch = self.widths[i] if last else self.widths[j]
                        t = _conv(ch, 3, 2, dtype=self.dtype, name=f"fuse{i}_{j}_{k}_conv")(t)
                        t = bn(f"fuse{i}_{j}_{k}_bn")(t)
                        if not last:
                            t = nn.relu(t)
                acc = t if acc is None else acc + t
            outs.append(nn.relu(acc))
        return outs


class HRNetEncoder(nn.Module):
    """HRNetV2 trunk + head. Output: (B, in_size/4, in_size/4, out_dim).

    Defaults reproduce HRNetV2-W48 exactly; the size knobs exist so tests can
    run a tiny topologically-identical variant on CPU.
    """

    in_size: int = 224
    out_dim: int = 256
    width: int = 48
    stage1_planes: int = 64
    stage1_blocks: int = 4
    num_blocks: int = 4
    num_modules: Sequence[int] = (1, 4, 3)  # stages 2, 3, 4
    stem_ch: int = 64
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, images, *, train: bool = False):
        bn = lambda name: nn.BatchNorm(momentum=0.9, use_running_average=not train, dtype=self.dtype, name=name)
        x = _conv(self.stem_ch, 3, 2, dtype=self.dtype, name="conv1")(images)
        x = nn.relu(bn("bn1")(x))
        x = _conv(self.stem_ch, 3, 2, dtype=self.dtype, name="conv2")(x)
        x = nn.relu(bn("bn2")(x))

        for k in range(self.stage1_blocks):
            x = Bottleneck(self.stage1_planes, dtype=self.dtype, name=f"layer1_b{k}")(
                x, train=train
            )

        widths = [self.width * (2**i) for i in range(1 + len(self.num_modules))]
        xs = [x]
        for stage, nmod in zip(range(2, 2 + len(self.num_modules)), self.num_modules):
            cur = widths[:stage]
            t_idx = stage - 1
            new_xs = []
            for i in range(len(cur)):
                if i < len(xs):
                    if xs[i].shape[-1] != cur[i]:
                        h = _conv(cur[i], 3, dtype=self.dtype, name=f"transition{t_idx}_{i}_conv")(xs[i])
                        h = bn(f"transition{t_idx}_{i}_bn")(h)
                        new_xs.append(nn.relu(h))
                    else:
                        new_xs.append(xs[i])
                else:  # new branch: chained stride-2 convs from the coarsest
                    h = xs[-1]
                    for j in range(i + 1 - len(xs)):
                        ch = cur[i] if j == i - len(xs) else xs[-1].shape[-1]
                        h = _conv(ch, 3, 2, dtype=self.dtype, name=f"transition{t_idx}_{i}_{j}_conv")(h)
                        h = bn(f"transition{t_idx}_{i}_{j}_bn")(h)
                        h = nn.relu(h)
                    new_xs.append(h)
            xs = new_xs
            for m in range(nmod):
                xs = HRModule(cur, self.num_blocks, dtype=self.dtype, name=f"stage{stage}_m{m}")(
                    xs, train=train
                )

        # HRNetV2 head (reference :521-529): concat at 1/4 res, 1x1 convs
        tgt = xs[0].shape[1:3]
        ups = [xs[0]] + [resize_align_corners(h, tgt) for h in xs[1:]]
        x = jnp.concatenate(ups, axis=-1)
        x = nn.Conv(x.shape[-1], (1, 1), dtype=self.dtype, name="last_conv1")(x)
        x = nn.relu(bn("last_bn")(x))
        return nn.Conv(self.out_dim, (1, 1), dtype=self.dtype, name="last_conv2")(x)


class FusionHRNetEncoder(nn.Module):
    """HRNet image features ⊕ pillar-ViT lidar features → conv fusion
    (reference models/fusion_layers/fusion_hrnet.py:13-77)."""

    in_size: int = 224
    out_dim: int = 256
    width: int = 48
    stage1_planes: int = 64
    stage1_blocks: int = 4
    num_blocks: int = 4
    num_modules: Sequence[int] = (1, 4, 3)
    vit_dim: int = 384
    vit_depth: int = 12
    voxel_x: float = 8.0
    voxel_y: float = 8.0
    max_points_per_voxel: int = 64
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, images, points, valid, *, train: bool = False):
        img_f = HRNetEncoder(
            in_size=self.in_size,
            out_dim=self.out_dim,
            width=self.width,
            stage1_planes=self.stage1_planes,
            stage1_blocks=self.stage1_blocks,
            num_blocks=self.num_blocks,
            num_modules=self.num_modules,
            dtype=self.dtype,
            name="hrnet",
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
        lid_f = resize_align_corners(lid_f, img_f.shape[1:3])
        x = jnp.concatenate([img_f, lid_f], axis=-1)
        x = nn.Conv(self.out_dim, (3, 3), padding="SAME", dtype=self.dtype)(x)
        x = nn.BatchNorm(momentum=0.9, use_running_average=not train, dtype=self.dtype)(x)
        return nn.relu(x)
