"""Pretrained torch checkpoint porting → flax parameter trees.

The reference loads timm ViT-S (DINO) weights into its encoders
(models/vision_transformer/vit.py:33-41); SURVEY §7.3 flags weight porting
as hard part 6. `port_timm_vit` maps a timm VisionTransformer state_dict
(torch tensors or numpy arrays) onto our ViTBackbone parameter tree, with
forward equivalence covered by tests/test_torch_port.py against a
from-scratch torch reference implementation.

Key mapping (timm → flax ViTBackbone):
  cls_token                     → cls_token
  pos_embed                     → pos_embed
  patch_embed.proj.{weight,bias}→ patch_embed.{kernel (p,p,3,D), bias}
  blocks.i.norm1                → block{i}.LayerNorm_0.{scale,bias}
  blocks.i.attn.qkv             → block{i}.MultiHeadAttention_0.{q,k,v}
  blocks.i.attn.proj            → block{i}.MultiHeadAttention_0.o
  blocks.i.norm2                → block{i}.LayerNorm_1
  blocks.i.mlp.fc{1,2}          → block{i}.MlpBlock_0.Dense_{0,1}
  norm                          → norm.{scale,bias}
"""

from __future__ import annotations

from typing import Any, Mapping

import numpy as np


def _np(t: Any) -> np.ndarray:
    if hasattr(t, "detach"):
        t = t.detach().cpu().numpy()
    return np.asarray(t)


def port_timm_vit(state_dict: Mapping[str, Any], depth: int = 12) -> dict:
    """→ params dict for models.vit.ViTBackbone (use under {'params': {'vit': ...}}
    inside ViTEncoder/ViTCNNEncoder, or directly for a bare backbone)."""
    sd = {k: _np(v) for k, v in state_dict.items()}
    params: dict = {}

    params["cls_token"] = sd["cls_token"].reshape(1, 1, -1)
    params["pos_embed"] = sd["pos_embed"]
    w = sd["patch_embed.proj.weight"]  # (D, C, p, p)
    params["patch_embed"] = {
        "kernel": np.transpose(w, (2, 3, 1, 0)),
        "bias": sd["patch_embed.proj.bias"],
    }
    dim = w.shape[0]
    for i in range(depth):
        p = f"blocks.{i}."
        qkv_w = sd[p + "attn.qkv.weight"]  # (3D, D)
        qkv_b = sd[p + "attn.qkv.bias"]
        qw, kw, vw = np.split(qkv_w, 3, axis=0)
        qb, kb, vb = np.split(qkv_b, 3, axis=0)
        dense = lambda wmat, bvec: {"kernel": wmat.T, "bias": bvec}
        params[f"block{i}"] = {
            "LayerNorm_0": {"scale": sd[p + "norm1.weight"], "bias": sd[p + "norm1.bias"]},
            "MultiHeadAttention_0": {
                "q": dense(qw, qb),
                "k": dense(kw, kb),
                "v": dense(vw, vb),
                "o": dense(sd[p + "attn.proj.weight"], sd[p + "attn.proj.bias"]),
            },
            "LayerNorm_1": {"scale": sd[p + "norm2.weight"], "bias": sd[p + "norm2.bias"]},
            "MlpBlock_0": {
                "Dense_0": dense(sd[p + "mlp.fc1.weight"], sd[p + "mlp.fc1.bias"]),
                "Dense_1": dense(sd[p + "mlp.fc2.weight"], sd[p + "mlp.fc2.bias"]),
            },
        }
    params["norm"] = {"scale": sd["norm.weight"], "bias": sd["norm.bias"]}
    return params


def load_pretrained_vit(checkpoint_file: str, depth: int = 12) -> dict:
    """Load a torch .pth (timm ViT state_dict, possibly nested) and port it."""
    import torch

    payload = torch.load(checkpoint_file, map_location="cpu", weights_only=False)
    if isinstance(payload, dict) and "state_dict" in payload:
        payload = payload["state_dict"]
    if isinstance(payload, dict) and "model" in payload and isinstance(payload["model"], dict):
        payload = payload["model"]
    return port_timm_vit(payload, depth=depth)
