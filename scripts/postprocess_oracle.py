"""Polygonization-quality oracle: run each model's FULL post-processing
pipeline on PERFECT (GT-derived) network outputs and score it against GT.

This isolates the polygonization stage from training noise: the numbers are
the ceiling any trained checkpoint can reach through that pipeline, and the
direct regression harness for NR / C-IoU work (VERDICT round-1 weak item 3).

- ffl: GT interior (blurred) as seg + analytic crossfield from the GT angle
  field → Polygonizer (acm/asm/simple per config) → IoU/C-IoU/NR.
- hisup: GT mask as remask + GT polygon vertices as predicted junctions →
  polygons_from_masks → IoU/C-IoU/NR.

Usage:
    JAX_PLATFORMS=cpu python scripts/postprocess_oracle.py [model=ffl|hisup|all]
        [n=12] [overrides...]
"""

from __future__ import annotations

import json
import sys

from _common import compose_from_argv  # noqa: F401 (sys.path side effect)

import cv2
import numpy as np


def _subset_index(gt, img_ids):
    from pixelspointspolygons_tpu.utils.coco import CocoIndex

    return CocoIndex(
        {
            "images": [gt.imgs[i] for i in img_ids],
            "annotations": [a for i in img_ids for a in gt.imgToAnns[i]],
            "categories": list(gt.cats.values()),
        }
    )


def _score(gt_sub, preds):
    from pixelspointspolygons_tpu.eval.metrics import compute_iou_ciou

    return {k: round(v, 4) for k, v in compute_iou_ciou(gt_sub, gt_sub.load_res(preds)).items()}


def oracle_ffl(cfg, gt, img_ids, n_ch: int = 1) -> dict:
    import pixelspointspolygons_tpu.predict.ffl_polygonize as fp
    from pixelspointspolygons_tpu.data.ffl_gt import compute_ffl_gt
    from pixelspointspolygons_tpu.utils.coco import generate_coco_ann

    S = int(cfg.experiment.encoder.in_size)
    B = len(img_ids)
    # n_ch=1 matches the production config (model.seg.compute_edge: false);
    # pass channels=2 to exercise ASM's edge-channel path
    seg = np.zeros((B, n_ch, S, S), np.float32)
    cf = np.zeros((B, 4, S, S), np.float32)
    for i, img_id in enumerate(img_ids):
        polys = [
            np.asarray(a["segmentation"][0], np.float64).reshape(-1, 2)
            for a in gt.imgToAnns[img_id]
        ]
        g = compute_ffl_gt(polys, S, S)
        interior = g["gt_polygons_image"][..., 0].astype(np.float32) / 255.0
        seg[i, 0] = cv2.GaussianBlur(interior, (5, 5), 1.2)
        if n_ch > 1:
            edge = g["gt_polygons_image"][..., 1].astype(np.float32) / 255.0
            seg[i, 1] = cv2.GaussianBlur(edge, (5, 5), 1.2)
        angle = g["gt_crossfield_angle"].astype(np.float32) * np.pi / 255.0
        u = np.exp(1j * angle)
        v = 1j * u
        cf[i] = np.stack(
            [((u**2) * (v**2)).real, ((u**2) * (v**2)).imag,
             (-(u**2 + v**2)).real, (-(u**2 + v**2)).imag]
        )
    polyg = fp.Polygonizer(cfg.experiment.polygonization, seg_threshold=0.5)
    res = polyg(seg, cf)
    out = {}
    gt_sub = _subset_index(gt, img_ids)
    for method, tols in res.items():
        for tol, per_sample in tols.items():
            preds = []
            for i, img_id in enumerate(img_ids):
                preds.extend(generate_coco_ann(per_sample[i], img_id))
            out[f"ffl.{method}.{tol}"] = _score(gt_sub, preds)
    return out


def oracle_hisup(cfg, gt, img_ids) -> dict:
    from pixelspointspolygons_tpu.predict.hisup_polygon import polygons_from_masks
    from pixelspointspolygons_tpu.utils.coco import generate_coco_ann, seg_to_mask

    S = int(cfg.experiment.encoder.in_size)
    ev = cfg.experiment.model.get("eval") or {}
    dp_tol = float(ev.get("dp_tolerance", 1.0)) if hasattr(ev, "get") else 1.0
    preds = []
    for img_id in img_ids:
        anns = gt.imgToAnns[img_id]
        mask = np.zeros((S, S), np.float32)
        juncs = []
        for a in anns:
            mask = np.maximum(mask, seg_to_mask(a["segmentation"], S, S).astype(np.float32))
            juncs.extend(np.asarray(a["segmentation"][0], np.float64).reshape(-1, 2))
        juncs = np.asarray(juncs, np.float64).reshape(-1, 2)
        polys, scores = polygons_from_masks(mask, juncs, dp_tol=dp_tol)
        preds.extend(generate_coco_ann(polys, img_id, scores))
    return {"hisup": _score(_subset_index(gt, img_ids), preds)}


def oracle_pix2poly(cfg, gt, img_ids) -> dict:
    """GT tokens + GT permutation matrix through the real assembly path
    (Hungarian + cycle merge, predictor_pix2poly.py) — the ceiling for the
    token→polygon stage. Reference counterpart: the wireframe smoke-test
    (scripts/test_wireframe_loader.py:10-40)."""
    from pixelspointspolygons_tpu.data import P3Dataset
    from pixelspointspolygons_tpu.models.pix2poly import Tokenizer
    from pixelspointspolygons_tpu.predict.predictor_pix2poly import (
        permutations_to_polygons,
        scores_to_permutations,
    )
    from pixelspointspolygons_tpu.config import compose
    from pixelspointspolygons_tpu.utils.coco import generate_coco_ann

    cfg = compose(
        ["experiment=p2p_image", "dataset=synthetic", "run_type=debug",
         f"experiment.encoder.in_size={int(cfg.experiment.encoder.in_size)}"]
    )
    tok = Tokenizer(cfg)
    ds = P3Dataset(cfg, "val", tokenizer=tok, eval_mode=True)
    rng = np.random.RandomState(0)
    by_id = {ds.tile_ids[i]: i for i in range(len(ds))}
    preds = []
    for img_id in img_ids:
        item = ds.get_item(by_id[img_id], rng)
        coords = tok.decode(item["y"])[:, ::-1]  # (y,x) → (x,y), as predict_batch does
        n = len(coords)
        if n == 0:
            continue
        # one-hot GT perm → logits-like scores → Hungarian → cycle merge
        scores = item["y_perm"][None, :n, :n].astype(np.float64)
        perm = scores_to_permutations(scores)
        polys = permutations_to_polygons(perm, coords[None])[0]
        polys = [np.asarray(p, np.float64).reshape(-1, 2) for p in polys]
        preds.extend(generate_coco_ann([p for p in polys if len(p) >= 3], img_id))
    return {"pix2poly": _score(_subset_index(gt, img_ids), preds)}


def main() -> None:
    kv = dict(a.split("=", 1) for a in sys.argv[1:] if "=" in a)
    which = kv.pop("model", "all")
    n = int(kv.pop("n", "12"))
    n_ch = int(kv.pop("channels", "1"))
    sys.argv = [sys.argv[0]] + [f"{k}={v}" for k, v in kv.items()]
    from pixelspointspolygons_tpu.config import compose
    from pixelspointspolygons_tpu.data.synthetic import ensure_synthetic_dataset
    from pixelspointspolygons_tpu.utils.coco import CocoIndex

    cfg = compose(
        ["experiment=ffl_image", "dataset=synthetic", "run_type=debug"]
        + [f"{k}={v}" for k, v in kv.items()]
    )
    ensure_synthetic_dataset(cfg)
    gt = CocoIndex(cfg.experiment.dataset.annotations["val"])
    img_ids = list(gt.imgs)[:n]

    report: dict = {}
    if which in ("ffl", "all"):
        report.update(oracle_ffl(cfg, gt, img_ids, n_ch=n_ch))
    if which in ("hisup", "all"):
        report.update(oracle_hisup(cfg, gt, img_ids))
    if which in ("pix2poly", "all"):
        report.update(oracle_pix2poly(cfg, gt, img_ids))
    print(json.dumps(report, indent=1))


if __name__ == "__main__":
    main()
