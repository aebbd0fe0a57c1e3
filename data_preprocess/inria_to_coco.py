"""Inria Aerial Image Labeling → MS-COCO patches converter.

Capability parity with reference data_preprocess/inria_to_coco.py (itself
adapted from HiSup tools): crop each 5000x5000 Inria tile into overlapping
patches, vectorize the binary ground-truth raster into building polygons
(exterior + interior rings via contour hierarchy, Douglas-Peucker
simplified), and emit a COCO annotation file (category id 100) plus patch
images. Images numbered 1-5 per city form the val split (reference :263-264).

Re-designed from scratch on cv2/numpy (no shapely/skimage):
    python data_preprocess/inria_to_coco.py \
        --images <inria>/train/images --gt <inria>/train/gt \
        --out data/inria_coco_224 --split train [--patch-size 224 --overlap 34]
"""

from __future__ import annotations

import argparse
import json
import os
import re
import sys

import cv2
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CITIES = ("austin", "chicago", "kitsap", "tyrol-w", "vienna")
VAL_NUMBERS = {str(i) for i in range(1, 6)}


def patch_grid(im_h: int, im_w: int, p: int, overlap: int) -> list[tuple[int, int]]:
    """Upper-left corners of an overlapping patch grid covering the tile
    (reference crop2patch :35-47)."""
    xs = list(range(0, im_w - p, p - overlap)) + [im_w - p]
    ys = list(range(0, im_h - p, p - overlap)) + [im_h - p]
    return [(x, y) for y in sorted(set(ys)) for x in sorted(set(xs))]


def _simplify(contour: np.ndarray, tol: float) -> np.ndarray:
    if len(contour) < 4 or tol <= 0:
        return contour
    out = cv2.approxPolyDP(contour.astype(np.float32), tol, True).reshape(-1, 2)
    return out if len(out) >= 3 else contour


def mask_to_polygons(mask: np.ndarray, tol: float = 1.8, min_area: float = 10.0) -> list[list[list[float]]]:
    """Binary (H, W) mask → list of polygons, each a list of rings
    [exterior, hole, ...] as flat [x0, y0, x1, y1, ...] COCO lists.
    Contours are traced on a 1px-padded mask so shapes touching the border
    close (reference bmask_to_poly :49-108), then unpadded and clipped."""
    H, W = mask.shape
    padded = np.pad((mask > 0).astype(np.uint8), 1)
    contours, hierarchy = cv2.findContours(padded, cv2.RETR_CCOMP, cv2.CHAIN_APPROX_SIMPLE)
    if hierarchy is None:
        return []
    hierarchy = hierarchy[0]  # (N, 4): next, prev, first_child, parent

    def clean(c: np.ndarray) -> np.ndarray | None:
        c = c.reshape(-1, 2).astype(np.float64) - 1.0  # unpad
        c[:, 0] = np.clip(c[:, 0], 0, W - 1)
        c[:, 1] = np.clip(c[:, 1], 0, H - 1)
        c = _simplify(c, tol)
        return c if len(c) >= 3 else None

    polygons = []
    for i, (c, h) in enumerate(zip(contours, hierarchy)):
        if h[3] >= 0:  # hole — attached to its parent below
            continue
        ext = clean(c)
        if ext is None or cv2.contourArea(ext.astype(np.float32)) < min_area:
            continue
        rings = [ext.reshape(-1).tolist()]
        child = h[2]
        while child >= 0:
            hole = clean(contours[child])
            if hole is not None and cv2.contourArea(hole.astype(np.float32)) > min_area:
                rings.append(hole.reshape(-1).tolist())
            child = hierarchy[child][0]
        polygons.append(rings)
    return polygons


def poly_bbox_area(rings: list[list[float]]) -> tuple[list[float], float]:
    ext = np.asarray(rings[0], np.float64).reshape(-1, 2)
    x0, y0 = ext.min(0)
    x1, y1 = ext.max(0)
    x = ext[:, 0]
    y = ext[:, 1]
    area = 0.5 * abs(float(np.dot(x, np.roll(y, -1)) - np.dot(y, np.roll(x, -1))))
    return [float(x0), float(y0), float(x1 - x0), float(y1 - y0)], area


def convert(images_dir: str, gt_dir: str, out_dir: str, split: str,
            patch_size: int = 224, overlap: int = 34, tol: float = 1.8) -> str:
    img_out = os.path.join(out_dir, split, "images")
    os.makedirs(img_out, exist_ok=True)
    data = {
        "info": {"district": "Inria", "description": "building footprints"},
        "categories": [{"id": 100, "name": "building"}],
        "images": [],
        "annotations": [],
    }
    im_id = ann_id = 0
    for label in sorted(os.listdir(gt_dir)):
        m = re.match(r"([a-zA-Z\-]+)(\d+)\.tif$", label)
        if not m:
            continue
        city, num = m.group(1), m.group(2)
        is_val = num in VAL_NUMBERS and city in CITIES
        if (split == "val") != is_val or city not in CITIES:
            continue
        gt = cv2.imread(os.path.join(gt_dir, label), cv2.IMREAD_GRAYSCALE)
        img = cv2.imread(os.path.join(images_dir, label))
        if gt is None or img is None:
            print(f"skipping {label}: missing image or gt")
            continue
        for x0, y0 in patch_grid(*gt.shape[:2], patch_size, overlap):
            p_gt = gt[y0 : y0 + patch_size, x0 : x0 + patch_size]
            p_im = img[y0 : y0 + patch_size, x0 : x0 + patch_size]
            file_name = f"{city}{num}_{y0}_{x0}.png"
            cv2.imwrite(os.path.join(img_out, file_name), p_im)
            data["images"].append(
                {"id": im_id, "file_name": file_name,
                 "width": patch_size, "height": patch_size}
            )
            for rings in mask_to_polygons(p_gt, tol=tol):
                bbox, area = poly_bbox_area(rings)
                data["annotations"].append(
                    {"id": ann_id, "image_id": im_id, "category_id": 100,
                     "segmentation": rings, "bbox": bbox, "area": area,
                     "iscrowd": 0}
                )
                ann_id += 1
            im_id += 1
    out_file = os.path.join(out_dir, split, f"annotation.json")
    with open(out_file, "w") as f:
        json.dump(data, f)
    print(f"wrote {im_id} patches / {ann_id} annotations → {out_file}")
    return out_file


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--images", required=True)
    ap.add_argument("--gt", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--split", choices=("train", "val"), default="train")
    ap.add_argument("--patch-size", type=int, default=224)
    ap.add_argument("--overlap", type=int, default=34)
    ap.add_argument("--tolerance", type=float, default=1.8)
    a = ap.parse_args()
    convert(a.images, a.gt, a.out, a.split, a.patch_size, a.overlap, a.tolerance)


if __name__ == "__main__":
    main()
