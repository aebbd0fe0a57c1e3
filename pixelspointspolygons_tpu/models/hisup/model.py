"""HiSup: attraction-field + junction + mask heads with ECA cross-attention.

Capability parity with reference models/hisup/model_hisup.py (heads/ECA
:122-224, AnnotationEncoder :66-120, losses :240-306), TPU-first design:

- GT targets (jloc/joff/afm/mask) are built ON DEVICE inside the jitted step
  from fixed-shape junction/edge arrays — the reference instead loops images
  in Python and launches a CUDA AFM kernel per image per step
  (model_hisup.py:84-120); here the AFM op (ops/afm.py) runs batched.
- All feature maps are NHWC; BatchNorm stats sync across the data mesh
  under jit (SyncBatchNorm equivalent).
- The val-time junction extraction (NMS + topk + offset add,
  models/hisup/polygon.py:8-40) is jitted too; only contour tracing +
  junction snapping stay on host (predict/hisup_polygon.py).
"""

from __future__ import annotations

import math
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...ops.afm import afm_auto as afm_op

Dtype = Any


class ConvStack3(nn.Module):
    """3x (conv3x3 + BN + ReLU) — the reference's _make_conv (:152-165)."""

    dim_hid: int
    dim_out: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        for ch in (self.dim_hid, self.dim_hid, self.dim_out):
            x = nn.Conv(ch, (3, 3), padding="SAME", dtype=self.dtype)(x)
            x = nn.BatchNorm(momentum=0.9, use_running_average=not train, dtype=self.dtype)(x)
            x = nn.relu(x)
        return x


class Predictor2(nn.Module):
    """conv3x3 → ReLU → conv1x1 (the reference's _make_predictor :167-174)."""

    dim_out: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        m = x.shape[-1] // 4
        x = nn.Conv(m, (3, 3), padding="SAME", dtype=self.dtype)(x)
        x = nn.relu(x)
        return nn.Conv(self.dim_out, (1, 1), dtype=self.dtype)(x)


class ECA(nn.Module):
    """Efficient channel attention with adaptive kernel (reference :39-64)."""

    channels: int
    gamma: int = 2
    b: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x1, x2, *, train: bool = False):
        t = int(abs((math.log2(self.channels) + self.b) / self.gamma))
        k = t if t % 2 else t + 1
        y = (x1 + x2).mean(axis=(1, 2))  # (B, C) global avg pool
        # 1-D conv over the channel axis
        y = nn.Conv(1, (k,), padding="SAME", use_bias=False, dtype=self.dtype)(
            y[..., None]
        )[..., 0]
        y = jax.nn.sigmoid(y)[:, None, None, :]
        out = x2 * y
        out = nn.Conv(self.channels, (1, 1), use_bias=False, dtype=self.dtype)(out)
        out = nn.BatchNorm(momentum=0.9, use_running_average=not train, dtype=self.dtype)(out)
        return nn.relu(out)


def encode_targets(batch: dict, size: int) -> dict:
    """On-device GT targets from fixed-shape arrays (AnnotationEncoder :84-120).

    batch: junctions (B,J,2) xy, junc_tags (B,J), junc_valid (B,J),
    edges (B,E,4), edges_valid (B,E), mask (B,S,S).
    """
    juncs = batch["junctions"]
    tags = batch["junc_tags"]
    valid = batch["junc_valid"]
    B, J, _ = juncs.shape

    xi = jnp.clip(juncs[..., 0].astype(jnp.int32), 0, size - 1)
    yi = jnp.clip(juncs[..., 1].astype(jnp.int32), 0, size - 1)
    offx = juncs[..., 0] - xi - 0.5
    offy = juncs[..., 1] - yi - 0.5

    def per_image(xi, yi, tags, valid, offx, offy):
        jmap = jnp.zeros((size, size), jnp.int32)
        # .max keeps a real junction if an invalid (zeroed) one collides at (0,0)
        jmap = jmap.at[yi, xi].max(jnp.where(valid, tags, 0))
        joff = jnp.zeros((2, size, size), jnp.float32)
        joff = joff.at[0, yi, xi].set(jnp.where(valid, offx, 0.0))
        joff = joff.at[1, yi, xi].set(jnp.where(valid, offy, 0.0))
        return jmap, joff

    jloc, joff = jax.vmap(per_image)(xi, yi, tags, valid, offx, offy)
    afmap, _ = afm_op(batch["edges"], batch["edges_valid"], size, size)
    return {"jloc": jloc, "joff": joff, "afmap": afmap, "mask": batch["mask"]}


class HiSup(nn.Module):
    """Encoder + multi-head decoder. Returns raw head outputs (NCHW for the
    2-channel maps to ease loss/polygonization parity)."""

    encoder_cfg: dict | None = None
    dim: int = 256
    pred_size: int = 224  # decoder/target resolution; encoder maps are
    # bilinearly upsampled here when they come out coarser (e.g. HRNet at 1/4)
    dtype: Dtype = jnp.float32

    def setup(self):
        enc_cfg = dict(self.encoder_cfg or {})
        name = enc_cfg.pop("name", "vit_cnn")
        if name == "vit_cnn":
            from ..vit import ViTCNNEncoder

            self.encoder = ViTCNNEncoder(dtype=self.dtype, out_dim=self.dim, **enc_cfg)
        elif name == "pointpillars_vit_cnn":
            from .encoders import PointPillarsViTCNNEncoder

            self.encoder = PointPillarsViTCNNEncoder(dtype=self.dtype, out_dim=self.dim, **enc_cfg)
        elif name == "early_fusion_vit_cnn":
            from ..fusion import EarlyFusionViTCNNEncoder

            self.encoder = EarlyFusionViTCNNEncoder(dtype=self.dtype, out_dim=self.dim, **enc_cfg)
        elif name == "pointpillars":
            from ..pointpillars import PointPillarsDenseEncoder

            self.encoder = PointPillarsDenseEncoder(dtype=self.dtype, out_dim=self.dim, **enc_cfg)
        elif name == "hrnet":
            from ..hrnet import HRNetEncoder

            self.encoder = HRNetEncoder(dtype=self.dtype, out_dim=self.dim, **enc_cfg)
        elif name == "fusion_hrnet":
            from ..hrnet import FusionHRNetEncoder

            self.encoder = FusionHRNetEncoder(dtype=self.dtype, out_dim=self.dim, **enc_cfg)
        else:
            raise NotImplementedError(f"encoder {name!r} for hisup")

        self.mask_head = ConvStack3(self.dim, self.dim, dtype=self.dtype)
        self.jloc_head = ConvStack3(self.dim, self.dim, dtype=self.dtype)
        self.afm_head = ConvStack3(self.dim, self.dim, dtype=self.dtype)
        self.joff_head = Predictor2(2, dtype=self.dtype)
        self.a2m_att = ECA(self.dim, dtype=self.dtype)
        self.a2j_att = ECA(self.dim, dtype=self.dtype)
        self.mask_predictor = Predictor2(2, dtype=self.dtype)
        self.jloc_predictor = Predictor2(3, dtype=self.dtype)
        self.afm_predictor = Predictor2(2, dtype=self.dtype)
        self.refuse_conv = ConvStack3(self.dim // 2, self.dim, dtype=self.dtype)
        self.final_conv = ConvStack3(self.dim, 2, dtype=self.dtype)

    def encode(self, batch, *, train: bool = False):
        if "images" in batch and "lidar" in batch:
            return self.encoder(batch["images"], batch["lidar"], batch["lidar_mask"], train=train)
        if "lidar" in batch:
            return self.encoder(batch["lidar"], batch["lidar_mask"], train=train)
        return self.encoder(batch["images"], train=train)

    def __call__(self, batch, *, train: bool = False):
        """Returns dict of NCHW head outputs:
        joff (B,2,S,S), jloc (B,3,S,S), mask (B,2,S,S), afm (B,2,S,S),
        remask (B,2,S,S)."""
        feats = self.encode(batch, train=train)  # (B, S, S, C)
        if feats.shape[1] != self.pred_size:
            feats = jax.image.resize(
                feats,
                (feats.shape[0], self.pred_size, self.pred_size, feats.shape[-1]),
                "bilinear",
            )

        joff = self.joff_head(feats)
        mask_f = self.mask_head(feats, train=train)
        jloc_f = self.jloc_head(feats, train=train)
        afm_f = self.afm_head(feats, train=train)

        mask_att = self.a2m_att(afm_f, mask_f, train=train)
        jloc_att = self.a2j_att(afm_f, jloc_f, train=train)

        mask_pred = self.mask_predictor(mask_f + mask_att)
        jloc_pred = self.jloc_predictor(jloc_f + jloc_att)
        afm_pred = self.afm_predictor(afm_f)

        afm_conv = self.refuse_conv(afm_pred, train=train)
        remask_pred = self.final_conv(
            jnp.concatenate([feats, afm_conv], axis=-1), train=train
        )

        to_nchw = lambda x: jnp.transpose(x, (0, 3, 1, 2))
        return {
            "joff": to_nchw(joff),
            "jloc": to_nchw(jloc_pred),
            "mask": to_nchw(mask_pred),
            "afm": to_nchw(afm_pred),
            "remask": to_nchw(remask_pred),
        }


# --- losses (reference :20-37, :300-306) -----------------------------------


def ce_loss_2d(logits_nchw, labels, weight=None):
    logp = jax.nn.log_softmax(logits_nchw.astype(jnp.float32), axis=1)
    onehot = jax.nn.one_hot(labels, logits_nchw.shape[1], axis=1)
    loss = -(onehot * logp).sum(axis=1)
    return loss.mean()


def sigmoid_l1_loss(logits, targets, offset=0.0, mask=None):
    """|sigmoid(x) + offset − t|, weighted by junction-pixel density per image
    (reference sigmoid_l1_loss :27-37; mask = jloc labels)."""
    pred = jax.nn.sigmoid(logits.astype(jnp.float32)) + offset
    loss = jnp.abs(pred - targets)
    if mask is not None:
        t = ((mask == 1) | (mask == 2)).astype(jnp.float32)[:, None]
        w = t.mean(axis=(2, 3), keepdims=True)
        w = jnp.where(w == 0, 1.0, w)
        loss = loss * (t / w)
    return loss.mean()


def hisup_losses(outputs: dict, targets: dict) -> dict:
    return {
        "loss_jloc": ce_loss_2d(outputs["jloc"], targets["jloc"]),
        "loss_joff": sigmoid_l1_loss(
            outputs["joff"], targets["joff"], -0.5, targets["jloc"]
        ),
        "loss_mask": ce_loss_2d(outputs["mask"], targets["mask"].astype(jnp.int32)),
        "loss_afm": jnp.abs(
            outputs["afm"].astype(jnp.float32) - targets["afmap"]
        ).mean(),
        "loss_remask": ce_loss_2d(outputs["remask"], targets["mask"].astype(jnp.int32)),
    }


# --- jitted junction extraction (polygon.py:8-40) --------------------------


def nms_2d(x: jnp.ndarray) -> jnp.ndarray:
    """3x3 max-pool NMS on (B, H, W)."""
    mp = jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 3, 3), (1, 1, 1), "SAME"
    )
    return jnp.where(x == mp, x, 0.0)


def extract_junctions(jloc_softmax: jnp.ndarray, joff: jnp.ndarray, topk: int = 300, th: float = 0.008):
    """jloc_softmax: (B, 3, S, S); joff: (B, 2, S, S) already sigmoid−0.5.

    Returns (points (B, 2*topk, 2) xy, scores (B, 2*topk)) — concave then
    convex candidates; entries below threshold have score 0 and must be
    filtered by the host.
    """
    B, _, H, W = jloc_softmax.shape
    topk = min(topk, H * W)  # tiny decoder maps (CPU smoke configs) have < topk pixels

    def one_class(prob):
        p = nms_2d(prob)
        flat = p.reshape(B, -1)
        scores, idx = jax.lax.top_k(flat, topk)
        y = (idx // W).astype(jnp.float32)
        x = (idx % W).astype(jnp.float32)
        offx = jnp.take_along_axis(joff[:, 0].reshape(B, -1), idx, axis=1)
        offy = jnp.take_along_axis(joff[:, 1].reshape(B, -1), idx, axis=1)
        pts = jnp.stack([x + offx + 0.5, y + offy + 0.5], axis=-1)
        keep = scores > th
        return pts, jnp.where(keep, scores, 0.0)

    p_cc, s_cc = one_class(jloc_softmax[:, 1])
    p_cv, s_cv = one_class(jloc_softmax[:, 2])
    return (
        jnp.concatenate([p_cc, p_cv], axis=1),
        jnp.concatenate([s_cc, s_cv], axis=1),
    )
