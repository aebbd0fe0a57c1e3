"""Pretrained-encoder loading at model-construction time.

The reference loads encoder checkpoints while building the model: timm ViT
weights (models/vision_transformer/vit.py:33-41), DINOv2 ViT-S/14
(vit_dinov2.py:27-45), and the ImageNet HRNetV2-W48 state_dict with
intersect-and-update semantics (hrnet/hrnet48v2.py:386-394,542-552). Here the
equivalent hook is `apply_pretrained_encoder(cfg, variables)` called by each
trainer right after `model.init`; a later run-checkpoint resume still
overrides everything, matching the reference's ordering.

Works for every encoder family by locating ViT trunks (`ViTBackbone` subtrees,
recognizable by their cls_token/pos_embed leaves) anywhere in the params tree
— this covers vit, vit_cnn, vit_dinov2, pointpillars_vit(_cnn),
early_fusion_vit(_cnn) and fusion_hrnet's lidar branch, where the reference
swaps patch embeds but keeps the timm trunk (pointpillars_vit.py:64).
"""

from __future__ import annotations

from typing import Any, Mapping

import numpy as np

from .torch_port import (
    interpolate_pos_embed,
    jax_tree_to_mutable,
    normalize_state_dict,
    port_dinov2_vit,
    port_hrnet,
    port_timm_vit,
    vit_unconsumed_keys,
)


def _load_torch_sd(path: str) -> dict:
    import torch

    payload = torch.load(path, map_location="cpu", weights_only=False)
    for key in ("state_dict", "model"):
        if isinstance(payload, dict) and key in payload and isinstance(payload[key], dict):
            payload = payload[key]
    return payload


def _cfg_get(node: Any, name: str, default=None):
    try:
        v = getattr(node, name)
    except Exception:
        try:
            v = node[name]  # plain-dict nodes (e.g. injected by --from-pth)
        except Exception:
            return default
    return default if v is None else v


def _find_vit_trunks(params: Mapping[str, Any], path=()) -> list[tuple]:
    """Paths of every ViTBackbone subtree (has cls_token + pos_embed leaves)."""
    hits = []
    if not isinstance(params, Mapping):
        return hits
    if "cls_token" in params and "pos_embed" in params:
        hits.append(path)
        return hits
    for k, v in params.items():
        hits += _find_vit_trunks(v, path + (k,))
    return hits


def _graft(dst: dict, src: Mapping[str, Any], logger=None, path="") -> tuple[int, int]:
    """Intersect-and-update: copy src leaves into dst where path+shape match.
    Returns (n_loaded, n_skipped)."""
    loaded = skipped = 0
    for k, v in src.items():
        if k not in dst:
            skipped += 1
            continue
        if isinstance(v, Mapping) and isinstance(dst[k], dict):
            l2, s2 = _graft(dst[k], v, logger, f"{path}/{k}")
            loaded += l2
            skipped += s2
        else:
            if np.shape(dst[k]) == np.shape(v):
                dst[k] = np.asarray(v)
                loaded += 1
            else:
                if logger:
                    logger.warning(
                        f"pretrained graft: shape mismatch at {path}/{k} "
                        f"({np.shape(v)} → {np.shape(dst[k])}), keeping init"
                    )
                skipped += 1
    return loaded, skipped


def apply_pretrained_encoder(cfg, variables, logger=None):
    """Return a new variables tree with any configured pretrained encoder
    weights grafted in. No-op (returns `variables`) when nothing is configured
    or the checkpoint file is absent."""
    import os

    enc = cfg.experiment.encoder
    name = str(_cfg_get(enc, "name", ""))
    new = None

    def ensure_mutable():
        nonlocal new
        if new is None:
            new = jax_tree_to_mutable(variables)
        return new

    # --- HRNetV2-W48 trunk (hrnet / fusion_hrnet) ---------------------------
    hr = _cfg_get(enc, "hrnet")
    hr_file = _cfg_get(hr, "checkpoint_file") if hr is not None else None
    if (
        name in ("hrnet", "fusion_hrnet")
        and hr is not None
        and bool(_cfg_get(hr, "pretrained", False))
        and hr_file
    ):
        if not os.path.isfile(str(hr_file)):
            raise FileNotFoundError(f"HRNet checkpoint not found: {hr_file}")
        sd = _load_torch_sd(str(hr_file))
        v = ensure_mutable()
        sub_path = ["encoder", "hrnet"] if name == "fusion_hrnet" else ["encoder"]
        sub = {}
        for col in ("params", "batch_stats"):
            node = v.get(col)
            for p in sub_path:
                node = node[p] if node is not None else None
            sub[col] = node
        ported, loaded, skipped = port_hrnet(sd, sub)
        for col in ("params", "batch_stats"):
            node = v[col]
            for p in sub_path[:-1]:
                node = node[p]
            node[sub_path[-1]] = ported[col]
        if logger:
            logger.info(
                f"loaded HRNetV2 pretrained weights from {hr_file}: "
                f"{len(loaded)} modules, {len(skipped)} kept init ({skipped[:4]}...)"
            )

    # --- ViT trunk(s) (timm DINO / DINOv2) ----------------------------------
    vit = _cfg_get(enc, "vit")
    vit_file = _cfg_get(vit, "checkpoint_file") if vit is not None else None
    if vit is not None and bool(_cfg_get(vit, "pretrained", False)) and vit_file:
        if not os.path.isfile(str(vit_file)):
            raise FileNotFoundError(f"ViT checkpoint not found: {vit_file}")
        sd = _load_torch_sd(str(vit_file))
        depth = 12
        norm_sd, prefix = normalize_state_dict(sd)
        extras = vit_unconsumed_keys(norm_sd)
        if logger and (prefix or extras):
            logger.info(
                f"real-checkpoint normalization: stripped prefix {prefix!r}, "
                f"skipping {len(extras)} extra keys (e.g. {extras[:4]})"
            )
        is_dinov2 = name == "vit_dinov2" or "blocks.0.ls1.gamma" in norm_sd
        ported = port_dinov2_vit(norm_sd, depth=depth) if is_dinov2 else port_timm_vit(norm_sd, depth=depth)
        v = ensure_mutable()
        trunks = _find_vit_trunks(v["params"])
        if not trunks and logger:
            logger.warning("vit.pretrained set but no ViT trunk found in params")
        for tpath in trunks:
            node = v["params"]
            for p in tpath:
                node = node[p]
            # checkpoints are 224px grids; resample pos_embed for other in_sizes
            if np.shape(node.get("pos_embed")) != np.shape(ported["pos_embed"]):
                ported = dict(
                    ported,
                    pos_embed=interpolate_pos_embed(
                        ported["pos_embed"], np.shape(node["pos_embed"])[1]
                    ),
                )
                if logger:
                    logger.info(
                        f"interpolated pos_embed to {np.shape(ported['pos_embed'])} "
                        f"for {'/'.join(tpath)}"
                    )
            loaded, skipped = _graft(node, ported, logger, "/".join(tpath))
            if logger:
                logger.info(
                    f"loaded ViT pretrained weights into {'/'.join(tpath)}: "
                    f"{loaded} tensors ({skipped} kept init)"
                )

    return variables if new is None else new
