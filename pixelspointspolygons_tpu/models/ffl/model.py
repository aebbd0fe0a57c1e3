"""FFL (Frame Field Learning) model: segmentation head + cross-field head.

Capability parity with reference models/ffl/model_ffl.py:28-165:
- seg head: conv3x3 + BN + ReLU + conv1x1 + sigmoid over
  [interior(+edge)(+vertex)] channels;
- crossfield head: conv on features ⊕ detached seg → conv1x1 → 2·tanh,
  emitting (c0, c2) as 4 real channels in [-2, 2];
- encoder matrix (:114-152): vit_cnn / early_fusion_vit_cnn / hrnet /
  unetresnet101 / pointpillars / pointpillars_vit_cnn.

Outputs NCHW ("seg" (B, C, H, W), "crossfield" (B, 4, H, W)) to keep loss
and polygonization code aligned with the reference's conventions.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

Dtype = Any


class FFL(nn.Module):
    encoder_cfg: dict | None = None
    dim: int = 256
    seg_channels: int = 1  # interior (+edge) (+vertex)
    compute_seg: bool = True
    compute_crossfield: bool = True
    out_size: int = 224
    dtype: Dtype = jnp.float32

    def setup(self):
        enc_cfg = dict(self.encoder_cfg or {})
        name = enc_cfg.pop("name", "vit_cnn")
        if name == "vit_cnn":
            from ..vit import ViTCNNEncoder

            self.encoder = ViTCNNEncoder(dtype=self.dtype, out_dim=self.dim, **enc_cfg)
        elif name == "early_fusion_vit_cnn":
            from ..fusion import EarlyFusionViTCNNEncoder

            self.encoder = EarlyFusionViTCNNEncoder(dtype=self.dtype, out_dim=self.dim, **enc_cfg)
        elif name == "pointpillars_vit_cnn":
            from ..hisup.encoders import PointPillarsViTCNNEncoder

            self.encoder = PointPillarsViTCNNEncoder(dtype=self.dtype, out_dim=self.dim, **enc_cfg)
        elif name == "pointpillars":
            from ..pointpillars import PointPillarsDenseEncoder

            self.encoder = PointPillarsDenseEncoder(dtype=self.dtype, out_dim=self.dim, **enc_cfg)
        elif name == "hrnet":
            from ..hrnet import HRNetEncoder

            self.encoder = HRNetEncoder(dtype=self.dtype, out_dim=self.dim, **enc_cfg)
        elif name == "unetresnet101":
            from .unetresnet import UNetResNetEncoder

            self.encoder = UNetResNetEncoder(dtype=self.dtype, out_dim=self.dim, **enc_cfg)
        elif name == "convnext":
            from ..convnext import ConvNeXtEncoder

            self.encoder = ConvNeXtEncoder(dtype=self.dtype, out_dim=self.dim, **enc_cfg)
        else:
            raise NotImplementedError(f"encoder {name!r} for ffl")

        self.seg_conv = nn.Conv(self.dim, (3, 3), padding="SAME", dtype=self.dtype)
        self.seg_bn = nn.BatchNorm(momentum=0.9, dtype=self.dtype)
        self.seg_out = nn.Conv(self.seg_channels, (1, 1), dtype=self.dtype)
        self.cf_conv = nn.Conv(self.dim, (3, 3), padding="SAME", dtype=self.dtype)
        self.cf_bn = nn.BatchNorm(momentum=0.9, dtype=self.dtype)
        self.cf_out = nn.Conv(4, (1, 1), dtype=self.dtype)

    def encode(self, batch, *, train: bool = False):
        if "images" in batch and "lidar" in batch:
            return self.encoder(batch["images"], batch["lidar"], batch["lidar_mask"], train=train)
        if "lidar" in batch:
            return self.encoder(batch["lidar"], batch["lidar_mask"], train=train)
        return self.encoder(batch["images"], train=train)

    def __call__(self, batch, *, train: bool = False):
        feats = self.encode(batch, train=train)  # (B, S, S, C)
        if feats.shape[1] != self.out_size:
            feats = jax.image.resize(
                feats,
                (feats.shape[0], self.out_size, self.out_size, feats.shape[-1]),
                "bilinear",
            )
        outputs = {}
        if self.compute_seg:
            s = self.seg_conv(feats)
            s = self.seg_bn(s, use_running_average=not train)
            s = nn.relu(s)
            seg = jax.nn.sigmoid(self.seg_out(s))  # (B, S, S, Cs)
            outputs["seg"] = jnp.transpose(seg, (0, 3, 1, 2))
            feats = jnp.concatenate([feats, jax.lax.stop_gradient(seg)], axis=-1)
        if self.compute_crossfield:
            c = self.cf_conv(feats)
            c = self.cf_bn(c, use_running_average=not train)
            c = nn.relu(c)
            cf = 2.0 * jnp.tanh(self.cf_out(c))
            outputs["crossfield"] = jnp.transpose(cf, (0, 3, 1, 2))
        return outputs


def build_ffl(cfg, dtype=jnp.float32) -> FFL:
    enc = cfg.experiment.encoder
    m = cfg.experiment.model
    name = enc.name
    vit_kw = dict(
        img_size=int(enc.in_size),
        patch_size=int(enc.get("patch_size", 8)),
        dim=int(enc.get("patch_feature_dim", 384)),
        depth=12,
        num_heads=6,
    )
    lidar_kw = (
        dict(
            width=float(enc.in_width),
            height=float(enc.in_height),
            voxel_x=float(enc.in_voxel_size.x),
            voxel_y=float(enc.in_voxel_size.y),
            max_points_per_voxel=int(enc.max_num_points_per_voxel),
        )
        if enc.use_lidar
        else {}
    )
    out_size = int(m.decoder.in_feature_size)
    if name == "vit_cnn":
        enc_cfg = {"name": name, **vit_kw, "out_size": out_size}
    elif name in ("early_fusion_vit_cnn", "pointpillars_vit_cnn"):
        enc_cfg = {"name": name, **vit_kw, **lidar_kw, "out_size": out_size}
    elif name == "pointpillars":
        enc_cfg = {
            "name": name,
            **lidar_kw,
            "out_size": out_size,
            "out_channels": tuple(int(c) for c in m.point_pillars.out_channels),
        }
    elif name == "hrnet":
        enc_cfg = {"name": "hrnet", "in_size": int(enc.in_size)}
    elif name == "unetresnet101":
        enc_cfg = {"name": "unetresnet101", "in_size": int(enc.in_size)}
    elif name == "convnext":
        enc_cfg = {"name": "convnext", "in_size": int(enc.in_size)}
    else:
        raise NotImplementedError(f"encoder {name!r} for ffl")

    seg_channels = (
        int(bool(m.seg.compute_interior))
        + int(bool(m.seg.compute_edge))
        + int(bool(m.seg.compute_vertex))
    )
    return FFL(
        encoder_cfg=enc_cfg,
        dim=int(m.decoder.in_feature_dim),
        seg_channels=seg_channels,
        compute_seg=bool(m.compute_seg),
        compute_crossfield=bool(m.compute_crossfield),
        out_size=out_size,
        dtype=dtype,
    )
