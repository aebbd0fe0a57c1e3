"""Config → Pix2Poly model construction (the encoder-compatibility matrix of
reference models/pix2poly/model_pix2poly.py:284-323)."""

from __future__ import annotations

import jax.numpy as jnp

from .model import Pix2Poly
from .tokenizer import Tokenizer


def _vit_kwargs(enc) -> dict:
    return dict(
        img_size=int(enc.in_size),
        patch_size=int(enc.patch_size),
        dim=int(enc.patch_feature_dim),
        depth=12,
        num_heads=6,
    )


def encoder_config(cfg) -> dict:
    enc = cfg.experiment.encoder
    name = enc.name
    if name == "vit":
        return {"name": "vit", **_vit_kwargs(enc)}
    if name == "vit_dinov2":
        # DINOv2 ViT-S/14 trunk: LayerScale blocks (reference
        # models/vision_transformer/vit_dinov2.py:11-62 loads dinov2_vits14)
        return {"name": "vit", **_vit_kwargs(enc), "layer_scale": True}
    if name == "pointpillars_vit":
        return {
            "name": "pointpillars_vit",
            **_vit_kwargs(enc),
            "voxel_x": float(enc.in_voxel_size.x),
            "voxel_y": float(enc.in_voxel_size.y),
            "width": float(enc.in_width),
            "height": float(enc.in_height),
            "max_points_per_voxel": int(enc.max_num_points_per_voxel),
        }
    if name == "early_fusion_vit":
        return {
            "name": "early_fusion_vit",
            **_vit_kwargs(enc),
            "voxel_x": float(enc.in_voxel_size.x),
            "voxel_y": float(enc.in_voxel_size.y),
            "width": float(enc.in_width),
            "height": float(enc.in_height),
            "max_points_per_voxel": int(enc.max_num_points_per_voxel),
        }
    raise NotImplementedError(f"encoder {name!r} not supported for pix2poly")


def build_pix2poly(cfg, tokenizer: Tokenizer | None = None, dtype=jnp.float32) -> Pix2Poly:
    tokenizer = tokenizer or Tokenizer(cfg)
    m = cfg.experiment.model
    return Pix2Poly(
        vocab_size=tokenizer.vocab_size,
        encoder_len=int(cfg.experiment.encoder.num_patches),
        dim=int(m.decoder.in_feature_dim),
        num_heads=int(m.decoder.get("num_heads", 8)),
        num_layers=int(m.decoder.get("num_layers", 6)),
        max_len=tokenizer.max_len,
        pad_idx=tokenizer.PAD_code,
        max_num_vertices=tokenizer.max_num_vertices,
        sinkhorn_iterations=int(m.sinkhorn_iterations),
        encoder_cfg=encoder_config(cfg),
        dtype=dtype,
    )
