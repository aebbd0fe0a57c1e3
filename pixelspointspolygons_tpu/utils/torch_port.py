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


# Anchor keys that identify where the trunk lives inside a real checkpoint
# (real files wrap the trunk in `module.` (DDP), `backbone.`, `encoder.`, ...;
# the reference absorbs these with suffix matching, misc/shared_utils.py:67-118).
_VIT_ANCHOR = "cls_token"
_HRNET_ANCHOR = "conv1.weight"


def normalize_state_dict(sd: Mapping[str, Any], anchor: str = _VIT_ANCHOR) -> tuple[dict, str]:
    """Strip the wrapper prefix of a real checkpoint's state_dict.

    Finds the shortest prefix P such that `P + anchor` is a key, and returns
    ({k-without-P: v for keys under P}, P). Keys outside P (classification
    heads, EMA copies, ...) are dropped — callers report them via
    `unconsumed_keys`. No-op when the anchor is already a bare key."""
    keys = list(sd.keys())
    if anchor in keys:
        return dict(sd), ""
    # only accept boundary matches: the key IS the anchor (handled above) or
    # ends with '.'+anchor, and the stripped prefix must itself end at a '.'
    # boundary — otherwise 'my_cls_token' or 'layer1.0.conv1.weight' would
    # donate a bogus prefix and graft wrong tensors
    candidates = sorted(
        (
            k[: -len(anchor)]
            for k in keys
            if k.endswith("." + anchor) and k[: -len(anchor)].endswith(".")
        ),
        key=len,
    )
    for prefix in candidates:
        sub = {k[len(prefix):]: v for k, v in sd.items() if k.startswith(prefix)}
        if anchor in sub:
            return sub, prefix
    return dict(sd), ""


def _fuse_qkv(sd: dict, p: str) -> tuple[np.ndarray, np.ndarray]:
    """attn qkv weight/bias for block prefix `p` ('blocks.i.'), tolerating both
    the fused timm layout (attn.qkv.*) and separate q/k/v projections
    (attn.{q,k,v}.* or attn.{q,k,v}_proj.*, as some released ViTs store)."""
    if p + "attn.qkv.weight" in sd:
        return sd[p + "attn.qkv.weight"], sd[p + "attn.qkv.bias"]
    for stem in ("attn.{}.{}", "attn.{}_proj.{}"):
        wk = p + stem.format("q", "weight")
        if wk in sd:
            w = np.concatenate([sd[p + stem.format(x, "weight")] for x in "qkv"], axis=0)
            b = np.concatenate([sd[p + stem.format(x, "bias")] for x in "qkv"], axis=0)
            return w, b
    raise KeyError(p + "attn.qkv.weight")


# key stems a ViT port consumes; anything else in the (normalized) state_dict
# is an extra to skip-and-log (heads, mask_token, dist_token, ...)
_VIT_CONSUMED_STEMS = ("cls_token", "pos_embed", "patch_embed.", "blocks.", "norm.")


def vit_unconsumed_keys(sd: Mapping[str, Any]) -> list[str]:
    return [k for k in sd if not k.startswith(_VIT_CONSUMED_STEMS)]


def port_timm_vit(state_dict: Mapping[str, Any], depth: int = 12) -> dict:
    """→ params dict for models.vit.ViTBackbone (use under {'params': {'vit': ...}}
    inside ViTEncoder/ViTCNNEncoder, or directly for a bare backbone)."""
    sd, _prefix = normalize_state_dict({k: _np(v) for k, v in state_dict.items()})
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
        qkv_w, qkv_b = _fuse_qkv(sd, p)  # (3D, D), (3D,)
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


def port_dinov2_vit(state_dict: Mapping[str, Any], depth: int = 12) -> dict:
    """DINOv2 ViT-S/14 state_dict → params for ViTBackbone(layer_scale=True).

    DINOv2 (facebookresearch/dinov2 `dinov2_vits14`; the reference loads it at
    models/vision_transformer/vit_dinov2.py:27) differs from timm ViT only by
    the per-block LayerScale gammas (`blocks.i.ls1.gamma` / `ls2.gamma`) and an
    unused `mask_token`. Reuses the timm mapping for everything else.
    """
    params = port_timm_vit(state_dict, depth=depth)
    sd, _prefix = normalize_state_dict({k: _np(v) for k, v in state_dict.items()})
    for i in range(depth):
        params[f"block{i}"]["ls1"] = sd[f"blocks.{i}.ls1.gamma"]
        params[f"block{i}"]["ls2"] = sd[f"blocks.{i}.ls2.gamma"]
    return params


def _hrnet_entries(
    *,
    width: int = 48,
    stage1_planes: int = 64,
    stage1_blocks: int = 4,
    num_blocks: int = 4,
    num_modules=(1, 4, 3),
    stem_ch: int = 64,
):
    """Yield (torch_prefix, flax_name, kind) for every conv/bn of HRNetV2,
    mirroring models.hrnet.HRNetEncoder's construction (and the torch module
    layout of reference models/hrnet/hrnet48v2.py:263-480)."""
    out = [
        ("conv1", "conv1", "conv"),
        ("bn1", "bn1", "bn"),
        ("conv2", "conv2", "conv"),
        ("bn2", "bn2", "bn"),
    ]
    for k in range(stage1_blocks):
        t, f = f"layer1.{k}", f"layer1_b{k}"
        for c in ("1", "2", "3"):
            out += [(f"{t}.conv{c}", f"{f}/conv{c}", "conv"), (f"{t}.bn{c}", f"{f}/bn{c}", "bn")]
        if k == 0 and stem_ch != stage1_planes * 4:
            out += [(f"{t}.downsample.0", f"{f}/down_conv", "conv"),
                    (f"{t}.downsample.1", f"{f}/down_bn", "bn")]
    widths = [width * (2**i) for i in range(1 + len(num_modules))]
    pre = [stage1_planes * 4]
    for stage, nmod in zip(range(2, 2 + len(num_modules)), num_modules):
        cur = widths[:stage]
        t_idx = stage - 1
        for i in range(len(cur)):
            if i < len(pre):
                if pre[i] != cur[i]:
                    out += [(f"transition{t_idx}.{i}.0", f"transition{t_idx}_{i}_conv", "conv"),
                            (f"transition{t_idx}.{i}.1", f"transition{t_idx}_{i}_bn", "bn")]
            else:
                for j in range(i + 1 - len(pre)):
                    out += [(f"transition{t_idx}.{i}.{j}.0", f"transition{t_idx}_{i}_{j}_conv", "conv"),
                            (f"transition{t_idx}.{i}.{j}.1", f"transition{t_idx}_{i}_{j}_bn", "bn")]
        n = len(cur)
        for m in range(nmod):
            t, f = f"stage{stage}.{m}", f"stage{stage}_m{m}"
            for i in range(n):
                for k in range(num_blocks):
                    tb, fb = f"{t}.branches.{i}.{k}", f"{f}/branch{i}_b{k}"
                    out += [(f"{tb}.conv1", f"{fb}/conv1", "conv"), (f"{tb}.bn1", f"{fb}/bn1", "bn"),
                            (f"{tb}.conv2", f"{fb}/conv2", "conv"), (f"{tb}.bn2", f"{fb}/bn2", "bn")]
            for i in range(n):
                for j in range(n):
                    if j > i:
                        out += [(f"{t}.fuse_layers.{i}.{j}.0", f"{f}/fuse{i}_{j}_conv", "conv"),
                                (f"{t}.fuse_layers.{i}.{j}.1", f"{f}/fuse{i}_{j}_bn", "bn")]
                    elif j < i:
                        for k in range(i - j):
                            out += [(f"{t}.fuse_layers.{i}.{j}.{k}.0", f"{f}/fuse{i}_{j}_{k}_conv", "conv"),
                                    (f"{t}.fuse_layers.{i}.{j}.{k}.1", f"{f}/fuse{i}_{j}_{k}_bn", "bn")]
        pre = cur
    out += [("last_layer.0", "last_conv1", "conv"),
            ("last_layer.1", "last_bn", "bn"),
            ("last_layer.3", "last_conv2", "conv")]
    return out


def port_hrnet(state_dict: Mapping[str, Any], variables: Mapping[str, Any], **topo) -> dict:
    """Load an HRNetV2 torch state_dict into an HRNetEncoder variables tree.

    `variables` is a freshly-initialized `{'params': ..., 'batch_stats': ...}`
    tree for models.hrnet.HRNetEncoder (or a subtree rooted at it). Keys
    present in the state_dict override the init; missing keys (e.g. the
    ImageNet checkpoint has no `last_layer.*`) keep their init values — the
    same intersect-and-update the reference does (hrnet48v2.py:542-552).
    Returns (new_variables, loaded_keys, skipped_prefixes). `topo` kwargs
    must match the HRNetEncoder attributes (width, num_modules, ...).
    """
    sd, _prefix = normalize_state_dict(
        {k: _np(v) for k, v in state_dict.items()}, anchor=_HRNET_ANCHOR
    )
    new = jax_tree_to_mutable(variables)

    def set_path(col, path, leaf_name, value):
        node = new.get(col)
        for p in path.split("/"):
            if not isinstance(node, dict) or p not in node:
                raise KeyError(f"{col}:{path} not in variables (topology mismatch?)")
            node = node[p]
        if leaf_name not in node:
            raise KeyError(f"{col}:{path}/{leaf_name} not in variables")
        if np.shape(node[leaf_name]) != np.shape(value):
            raise ValueError(
                f"{col}:{path}/{leaf_name} shape {np.shape(node[leaf_name])} != "
                f"checkpoint {np.shape(value)}"
            )
        node[leaf_name] = value

    loaded, skipped = [], []
    for torch_prefix, flax_name, kind in _hrnet_entries(**topo):
        if kind == "conv":
            wk = f"{torch_prefix}.weight"
            if wk not in sd:
                skipped.append(torch_prefix)
                continue
            set_path("params", flax_name, "kernel", np.transpose(sd[wk], (2, 3, 1, 0)))
            bk = f"{torch_prefix}.bias"
            if bk in sd:
                set_path("params", flax_name, "bias", sd[bk])
            loaded.append(torch_prefix)
        else:  # bn
            wk = f"{torch_prefix}.weight"
            if wk not in sd:
                skipped.append(torch_prefix)
                continue
            set_path("params", flax_name, "scale", sd[wk])
            set_path("params", flax_name, "bias", sd[f"{torch_prefix}.bias"])
            set_path("batch_stats", flax_name, "mean", sd[f"{torch_prefix}.running_mean"])
            set_path("batch_stats", flax_name, "var", sd[f"{torch_prefix}.running_var"])
            loaded.append(torch_prefix)
    return new, loaded, skipped


def interpolate_pos_embed(pos: np.ndarray, n_tokens: int) -> np.ndarray:
    """Resize a (1, 1+G², D) ViT positional embedding to `n_tokens` = 1+G'²
    grid tokens by bilinear interpolation of the grid part (cls row kept).

    Real checkpoints are 224px grids (G=28 for p8, G=16 for p14); our encoders
    run at cfg in_size which may differ — the reference sidesteps this by
    always constructing timm models at 224 (vit.py:20), so this is the
    mechanism that makes real weights usable at other input sizes."""
    n_src = pos.shape[1] - 1
    if n_src + 1 == n_tokens:
        return pos
    g_src = int(round(np.sqrt(n_src)))
    g_dst = int(round(np.sqrt(n_tokens - 1)))
    assert g_src * g_src == n_src and g_dst * g_dst == n_tokens - 1, (
        f"non-square pos_embed grids: {n_src} → {n_tokens - 1}"
    )
    grid = pos[0, 1:].reshape(g_src, g_src, -1).astype(np.float64)
    # align_corners=False bilinear (cv2/torch convention), pure numpy because
    # cv2.resize caps channel count well below an embedding dim
    coords = (np.arange(g_dst) + 0.5) * (g_src / g_dst) - 0.5
    lo = np.clip(np.floor(coords).astype(int), 0, g_src - 1)
    hi = np.clip(lo + 1, 0, g_src - 1)
    frac = np.clip(coords - lo, 0.0, 1.0)
    rows = grid[lo] * (1 - frac)[:, None, None] + grid[hi] * frac[:, None, None]
    resized = (
        rows[:, lo] * (1 - frac)[None, :, None] + rows[:, hi] * frac[None, :, None]
    )
    out = np.concatenate([pos[0, :1], resized.reshape(g_dst * g_dst, -1)], axis=0)
    return out[None].astype(pos.dtype)


def jax_tree_to_mutable(tree):
    """FrozenDict/dict tree → plain nested dicts (deep)."""
    if hasattr(tree, "items"):
        return {k: jax_tree_to_mutable(v) for k, v in tree.items()}
    return tree
