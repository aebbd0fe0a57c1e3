"""FFL loss stack: MultiLoss with epoch-interpolated weights.

Behavioral spec from reference models/ffl/losses.py:
- SegLoss (:313-363): BCE (bool-thresholded GT at 0.98 when loss.seg.type ==
  'bool') with optional freq/dist/size pixel weights (:147-209) + dice;
- CrossfieldAlignLoss (:366-382): |f(z_gt)|² on GT edge pixels;
- CrossfieldAlign90Loss (:385-402): same on 90°-rotated field, edge−vertex;
- CrossfieldSmoothLoss (:406-417): Laplacian penalty off edges;
- SegCrossfieldLoss (:420-440): align seg gradients (Scharr, detached norm);
- SegEdgeInteriorLoss (:443-461): edge channel ≈ interior grad norm outside;
- MultiLoss (:72-143): per-term weights, some epoch-interpolated over
  epoch_thresholds (config model/ffl.yaml loss.multi).

All terms are pure jittable functions of (outputs, batch, epoch_weights);
the reference's running norm-normalization machinery is trained with
normalize=False (trainer_ffl.py:140,165 — SURVEY §7.4), so weights apply to
raw means here as well.
"""

from __future__ import annotations

import math
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from ...ops.crossfield import (
    crossfield_to_c0c2,
    framefield_align_error,
    laplacian_penalty,
)
from ...ops.spatial_grad import spatial_gradient


def dice_loss(pred: jnp.ndarray, gt: jnp.ndarray, eps: float = 1e-6) -> jnp.ndarray:
    """Per-sample dice over all channels (reference measures.py:14-26)."""
    axes = tuple(range(1, pred.ndim))
    inter = (pred * gt).sum(axes)
    denom = pred.sum(axes) + gt.sum(axes)
    return 1.0 - (2.0 * inter + eps) / (denom + eps)


def seg_loss(outputs, batch, *, bce_coef, dice_coef, seg_type, gt_channels, use_weights):
    pred = outputs["seg"].astype(jnp.float32)  # (B, Cs, H, W)
    gt = batch["gt_polygons_image"][:, gt_channels]
    w = batch.get("seg_loss_weights")
    d = dice_loss(pred, gt).mean()
    if seg_type == "bool":
        gt = (gt > 0.98).astype(jnp.float32)
    p = jnp.clip(pred, 1e-7, 1 - 1e-7)
    bce = -(gt * jnp.log(p) + (1 - gt) * jnp.log(1 - p))
    if use_weights and w is not None:
        bce = bce * w[:, gt_channels]
    return bce_coef * bce.mean() + dice_coef * d


def gt_field(batch) -> jnp.ndarray:
    """Unit complex tangent field from the GT angle mask."""
    ang = batch["gt_crossfield_angle"][:, 0].astype(jnp.float32)  # (B, H, W)
    return jax.lax.complex(jnp.cos(ang), jnp.sin(ang))


def crossfield_align_loss(outputs, batch):
    c0, c2 = crossfield_to_c0c2(outputs["crossfield"].astype(jnp.float32))
    z = gt_field(batch)
    gt_edges = batch["gt_polygons_image"][:, 1]
    return (framefield_align_error(c0, c2, z) * gt_edges).mean()


def crossfield_align90_loss(outputs, batch):
    c0, c2 = crossfield_to_c0c2(outputs["crossfield"].astype(jnp.float32))
    z = gt_field(batch)
    z90 = z * 1j
    img = batch["gt_polygons_image"]
    mask = jnp.clip(img[:, 1] - img[:, 2], 0.0, 1.0)
    return (framefield_align_error(c0, c2, z90) * mask).mean()


def crossfield_smooth_loss(outputs, batch):
    cf = outputs["crossfield"].astype(jnp.float32)
    gt_edges_inv = 1.0 - batch["gt_polygons_image"][:, 1]
    return (laplacian_penalty(cf) * gt_edges_inv[:, None]).mean()


def compute_seg_grads(outputs) -> dict:
    """2× normalized Scharr gradients of seg (ComputeSegGrads :221-233)."""
    seg = outputs["seg"].astype(jnp.float32)
    grads = 2.0 * spatial_gradient(seg)  # (B, C, 2, H, W)
    # safe norm: d|g|/dg is NaN at exactly-zero gradients (flat seg regions)
    norm = jnp.sqrt(jnp.sum(grads * grads, axis=2) + 1e-12)
    normed = grads / (norm[:, :, None] + 1e-6)
    return {"seg_grads": grads, "seg_grad_norm": norm, "seg_grads_normed": normed}


def seg_crossfield_loss(outputs, grads, channel: int):
    c0, c2 = crossfield_to_c0c2(outputs["crossfield"].astype(jnp.float32))
    gn = grads["seg_grads_normed"][:, channel]  # (B, 2, H, W) [di, dj]
    z = jax.lax.complex(gn[:, 0], gn[:, 1])
    norm = jax.lax.stop_gradient(grads["seg_grad_norm"][:, channel])
    return (framefield_align_error(c0, c2, z) * norm).mean()


def seg_edge_interior_loss(outputs, grads):
    seg_int = outputs["seg"][:, 0].astype(jnp.float32)
    seg_edge = outputs["seg"][:, 1].astype(jnp.float32)
    gnorm = grads["seg_grad_norm"][:, 0]
    raw = jnp.abs(seg_edge - gnorm)
    outside = (jnp.cos(jnp.pi * seg_int) + 1) / 2
    boundary = (1 - jnp.cos(jnp.pi * gnorm)) / 2
    return (raw * jnp.maximum(outside, boundary)).mean()


def compute_seg_loss_weights(batch, cfg) -> jnp.ndarray | None:
    """Optional freq/dist/size pixel weights (losses.py:147-209)."""
    ls = cfg.experiment.model.loss.seg
    if not (ls.use_freq or ls.use_dist or ls.use_size):
        return None
    img = batch["gt_polygons_image"]
    H = int(cfg.experiment.encoder.in_height)
    W = int(cfg.experiment.encoder.in_width)
    weights = jnp.ones_like(img)
    if ls.use_freq:
        mask = (img > 0).astype(jnp.float32)
        cf = batch["class_freq"]  # (B, 2): [background?, interior] stored as fractions
        fg = cf[:, 1][:, None, None, None]
        bg = 1.0 - fg
        pix = mask * fg + (1 - mask) * bg
        weights = 1.0 / jnp.maximum(pix, 1e-4)
    if ls.use_dist:
        d = batch["distances"] * (H + W)
        weights = weights + float(ls.w0) * jnp.exp(-(d**2) / float(ls.sigma) ** 2)
    if ls.use_size:
        im_radius = math.sqrt(H * W) / 2
        weights = weights * (1.0 + 1.0 / jnp.maximum(im_radius * batch["sizes"], 1e-4))
    return weights


def epoch_weight(spec: Any, epoch: int, thresholds: list[int]) -> float:
    """Scalar weights pass through; list weights interpolate between
    thresholds (reference MultiLoss :95-118)."""
    if not isinstance(spec, (list, tuple)):
        return float(spec)
    t = list(thresholds)
    vals = list(spec)
    if epoch <= t[0]:
        return float(vals[0])
    for i in range(len(t) - 1):
        if t[i] <= epoch <= t[i + 1]:
            frac = (epoch - t[i]) / max(t[i + 1] - t[i], 1)
            return float(vals[i] + frac * (vals[i + 1] - vals[i]))
    return float(vals[-1])


def make_ffl_loss(cfg):
    """Returns (loss_fn, weights_for_epoch).

    loss_fn(outputs, batch, weights) → (total, dict) is epoch-independent
    (jit once); weights_for_epoch(epoch) → dict of python floats computed on
    host per epoch and passed in as traced scalars, so the epoch-interpolated
    MultiLoss schedule never triggers recompilation."""
    m = cfg.experiment.model
    w = m.loss.multi.weights
    thresholds = [int(t) for t in m.loss.multi.epoch_thresholds]
    compute_seg = bool(m.compute_seg)
    compute_cf = bool(m.compute_crossfield)
    has_interior = bool(m.seg.compute_interior)
    has_edge = bool(m.seg.compute_edge)
    gt_channels = [i for i, on in enumerate([has_interior, has_edge, bool(m.seg.compute_vertex)]) if on]
    ls = m.loss.seg
    use_weights = bool(ls.use_freq or ls.use_dist or ls.use_size)

    active = []
    if compute_seg:
        active.append(("seg", w.seg))
    if compute_cf:
        active.append(("crossfield_align", w.crossfield_align))
        active.append(("crossfield_align90", w.crossfield_align90))
        active.append(("crossfield_smooth", w.crossfield_smooth))
    if compute_seg:
        if has_interior and compute_cf:
            active.append(("seg_interior_crossfield", w.seg_interior_crossfield))
        if has_edge and compute_cf:
            active.append(("seg_edge_crossfield", w.seg_edge_crossfield))
        if has_interior and has_edge:
            active.append(("seg_edge_interior", w.seg_edge_interior))

    def weights_for_epoch(epoch: int) -> dict:
        return {k: epoch_weight(spec, epoch, thresholds) for k, spec in active}

    def loss_fn(outputs, batch, weights):
        losses = {}
        if use_weights:
            batch = dict(batch)
            batch["seg_loss_weights"] = compute_seg_loss_weights(batch, cfg)
        if compute_seg:
            losses["seg"] = seg_loss(
                outputs,
                batch,
                bce_coef=float(ls.bce_coef),
                dice_coef=float(ls.dice_coef),
                seg_type=str(ls.type),
                gt_channels=gt_channels,
                use_weights=use_weights,
            )
        if compute_cf:
            losses["crossfield_align"] = crossfield_align_loss(outputs, batch)
            losses["crossfield_align90"] = crossfield_align90_loss(outputs, batch)
            losses["crossfield_smooth"] = crossfield_smooth_loss(outputs, batch)
        if compute_seg and (compute_cf or has_edge):
            grads = compute_seg_grads(outputs)
            ch = -1
            if has_interior and compute_cf:
                ch += 1
                losses["seg_interior_crossfield"] = seg_crossfield_loss(outputs, grads, ch)
            if has_edge and compute_cf:
                ch += 1
                losses["seg_edge_crossfield"] = seg_crossfield_loss(outputs, grads, ch)
            if has_interior and has_edge:
                losses["seg_edge_interior"] = seg_edge_interior_loss(outputs, grads)
        total = sum(weights[k] * v for k, v in losses.items())
        return total, losses

    normalize = bool(_cfg_get(m.loss.multi, "normalize", False))
    if normalize:
        # cfg-gated port of the reference's norm-normalization (reference
        # models/ffl/losses.py:21-69: each term divided by a running mean of
        # its own raw value; DDP sync()s the norms). The reference trains
        # with normalize=False (trainer_ffl.py:140,165 — SURVEY §7.4), so
        # this is off by default. Our variant updates the running norms once
        # per epoch from the epoch-mean raw losses (the per-step host sync
        # the reference does is a tunnel round trip here), and the norms are
        # already global because epoch means come from the sharded step.
        raw_loss_fn = loss_fn

        def loss_fn(outputs, batch, weights, norms=None):
            total_raw, losses = raw_loss_fn(outputs, batch, weights)
            if norms is None:
                return total_raw, losses
            normed = {k: v / jnp.maximum(norms.get(k, 1.0), 1e-9) for k, v in losses.items()}
            total = sum(weights[k] * v for k, v in normed.items())
            # report RAW losses (comparable across epochs); optimize normed
            return total, losses

    return loss_fn, weights_for_epoch


def _cfg_get(node, name, default):
    try:
        v = node.get(name) if hasattr(node, "get") else getattr(node, name)
    except Exception:
        return default
    return default if v is None else v


class LossNormTracker:
    """Running per-term norm means (reference Loss.norm_meter with init_val=1,
    lydorn_utils/math_utils.py AverageMeter): update(epoch_mean_losses) after
    each epoch; norms() feeds the jitted loss."""

    def __init__(self, term_keys=()):
        # seed every active term up front so norms() has a stable pytree
        # structure from epoch 0 — an empty→populated dict would retrace the
        # jitted train step (a 1-5 min recompile through the remote tunnel)
        self.sums: dict = {k: 1.0 for k in term_keys}  # init_val=1 seed
        self.counts: dict = {k: 1 for k in term_keys}

    def update(self, losses: dict) -> None:
        for k, v in losses.items():
            if self.counts and k not in self.counts:
                continue  # non-term metrics in the epoch summary
            self.sums[k] = self.sums.get(k, 1.0) + float(v)
            self.counts[k] = self.counts.get(k, 1) + 1

    def norms(self) -> dict:
        import jax.numpy as jnp  # local: host may import losses without jax configured

        return {k: jnp.float32(self.sums[k] / self.counts[k]) for k in self.sums}
