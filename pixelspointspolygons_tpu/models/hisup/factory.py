"""Config → HiSup model (encoder-compatibility matrix of reference
models/hisup/model_hisup.py:318-344)."""

from __future__ import annotations

import jax.numpy as jnp

from .model import HiSup


def encoder_config(cfg) -> dict:
    enc = cfg.experiment.encoder
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
    out_size = int(cfg.experiment.model.decoder.in_feature_size)
    if name == "vit_cnn":
        return {"name": name, **vit_kw, "out_size": out_size}
    if name == "pointpillars_vit_cnn":
        return {"name": name, **vit_kw, **lidar_kw, "out_size": out_size}
    if name == "early_fusion_vit_cnn":
        return {"name": name, **vit_kw, **lidar_kw, "out_size": out_size}
    if name == "pointpillars":
        return {
            "name": name,
            **lidar_kw,
            "out_size": out_size,
            "out_channels": tuple(
                int(c) for c in cfg.experiment.model.point_pillars.out_channels
            ),
        }
    if name == "hrnet":
        return {"name": "hrnet", "in_size": int(enc.in_size)}
    if name == "fusion_hrnet":
        # FusionHRNetEncoder derives the pillar world extent from in_size and
        # uses `width` for the HRNet channel width — pass only voxel params
        pillar_kw = {k: v for k, v in lidar_kw.items() if k not in ("width", "height")}
        return {"name": "fusion_hrnet", "in_size": int(enc.in_size), **pillar_kw}
    raise NotImplementedError(f"encoder {name!r} for hisup")


def build_hisup(cfg, dtype=jnp.float32) -> HiSup:
    enc_cfg = encoder_config(cfg)
    name = enc_cfg["name"]
    if name == "fusion_hrnet":
        # FusionHRNetEncoder takes its own kwargs
        from ..hrnet import FusionHRNetEncoder  # noqa: F401 (resolved in setup)

    return HiSup(
        encoder_cfg=enc_cfg,
        dim=int(cfg.experiment.model.decoder.in_feature_dim),
        pred_size=int(cfg.experiment.model.decoder.in_feature_size),
        dtype=dtype,
    )
