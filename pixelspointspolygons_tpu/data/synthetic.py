"""Procedural synthetic P3-style tile dataset (self-contained substitute for
the downloadable P3 dataset: this environment has no network egress, so the
end-to-end train/predict/eval loop runs on generated tiles with the SAME
on-disk layout the real-dataset loader consumes: COCO json + image files +
per-tile point clouds).

Tiles contain a handful of axis-rotated rectangular / L-shaped "buildings"
rendered with per-building shading over a textured ground, plus a LiDAR
point cloud whose z values encode roof height inside building footprints —
enough signal for models to overfit quickly in debug runs and for metrics to
be meaningful.
"""

from __future__ import annotations

import json
import os

import cv2
import numpy as np

from ..utils.coco import CATEGORY_ID, poly_area


def _rot(pts: np.ndarray, angle: float, center: np.ndarray) -> np.ndarray:
    c, s = np.cos(angle), np.sin(angle)
    R = np.array([[c, -s], [s, c]])
    return (pts - center) @ R.T + center


def random_building(rng: np.random.RandomState, size: int) -> np.ndarray:
    """One building polygon (V, 2) float (x, y), open ring, CCW-ish."""
    w = rng.uniform(0.08, 0.25) * size
    h = rng.uniform(0.08, 0.25) * size
    cx = rng.uniform(0.15 * size, 0.85 * size)
    cy = rng.uniform(0.15 * size, 0.85 * size)
    base = np.array(
        [
            [cx - w / 2, cy - h / 2],
            [cx + w / 2, cy - h / 2],
            [cx + w / 2, cy + h / 2],
            [cx - w / 2, cy + h / 2],
        ]
    )
    if rng.rand() < 0.4:  # L-shape: cut a corner notch
        nx = rng.uniform(0.3, 0.6) * w
        ny = rng.uniform(0.3, 0.6) * h
        base = np.array(
            [
                [cx - w / 2, cy - h / 2],
                [cx + w / 2, cy - h / 2],
                [cx + w / 2, cy + h / 2 - ny],
                [cx + w / 2 - nx, cy + h / 2 - ny],
                [cx + w / 2 - nx, cy + h / 2],
                [cx - w / 2, cy + h / 2],
            ]
        )
    angle = rng.uniform(0, np.pi / 2) if rng.rand() < 0.5 else 0.0
    poly = _rot(base, angle, np.array([cx, cy]))
    return np.clip(poly, 0, size - 1)


def _poly_overlaps(poly: np.ndarray, others: list[np.ndarray], size: int) -> bool:
    m = np.zeros((size, size), np.uint8)
    cv2.fillPoly(m, [np.round(poly).astype(np.int32)], 1)
    for o in others:
        m2 = np.zeros((size, size), np.uint8)
        cv2.fillPoly(m2, [np.round(o).astype(np.int32)], 1)
        if (m & m2).any():
            return True
    return False


def generate_tile(rng: np.random.RandomState, size: int = 224, max_points: int = 60000):
    """Returns (image uint8 (S,S,3), points (N,3) float32, polygons list)."""
    polygons: list[np.ndarray] = []
    heights: list[float] = []
    n_buildings = rng.randint(1, 8)
    for _ in range(n_buildings * 3):
        if len(polygons) >= n_buildings:
            break
        poly = random_building(rng, size)
        if abs(poly_area(poly)) < 40:
            continue
        if not _poly_overlaps(poly, polygons, size):
            polygons.append(poly)
            heights.append(rng.uniform(4.0, 15.0))

    # ground texture
    img = rng.normal(110, 18, (size, size, 3)).astype(np.float32)
    img += rng.normal(0, 10, (size // 8, size // 8, 3)).repeat(8, 0).repeat(8, 1)
    # buildings: flat roofs with shading by height + edge highlight
    hmap = np.zeros((size, size), np.float32)
    for poly, hgt in zip(polygons, heights):
        pts = np.round(poly).astype(np.int32)
        roof = np.array([120 + hgt * 6, 90 + hgt * 4, 80 + hgt * 3], np.float32)
        roof += rng.normal(0, 8, 3)
        cv2.fillPoly(hmap, [pts], float(hgt))
        mask = np.zeros((size, size), np.uint8)
        cv2.fillPoly(mask, [pts], 1)
        img[mask > 0] = roof + rng.normal(0, 4, (int(mask.sum()), 3))
        cv2.polylines(img, [pts], True, (200, 200, 200), 1)
    image = np.clip(img, 0, 255).astype(np.uint8)

    # lidar: uniform ground sampling, z = ground noise or roof height
    n_pts = int(rng.uniform(0.5, 1.0) * max_points)
    xy = rng.uniform(0, size - 1e-3, (n_pts, 2)).astype(np.float32)
    gi = np.clip(xy[:, 1].astype(int), 0, size - 1)
    gj = np.clip(xy[:, 0].astype(int), 0, size - 1)
    z = hmap[gi, gj] + rng.normal(0, 0.15, n_pts).astype(np.float32)
    z += rng.uniform(0.0, 1.5)  # ground offset
    points = np.concatenate([xy, z[:, None]], axis=1).astype(np.float32)
    return image, points, polygons


def write_synthetic_dataset(cfg, splits=("train", "val", "test"), seed: int = 42) -> None:
    """Generate the dataset tree under cfg.experiment.dataset.in_path."""
    ds = cfg.experiment.dataset
    size = int(ds.size)
    root = ds.in_path
    counts = {
        "train": int(ds.get("num_train", 256)),
        "val": int(ds.get("num_val", 32)),
        "test": int(ds.get("num_test", 32)),
    }
    os.makedirs(root, exist_ok=True)
    next_img_id = 1
    next_ann_id = 1
    class_freq_acc = []
    for si, split in enumerate(splits):
        rng = np.random.RandomState(seed + 1000 * si)
        images, annotations = [], []
        img_dir = os.path.join(root, "images", split)
        lidar_dir = os.path.join(root, "lidar", split)
        os.makedirs(img_dir, exist_ok=True)
        os.makedirs(lidar_dir, exist_ok=True)
        for k in range(counts[split]):
            image, points, polygons = generate_tile(rng, size)
            img_name = f"images/{split}/tile_{next_img_id:05d}.png"
            lidar_name = f"lidar/{split}/tile_{next_img_id:05d}.npz"
            cv2.imwrite(os.path.join(root, img_name), image[..., ::-1])
            np.savez_compressed(os.path.join(root, lidar_name), points=points)
            images.append(
                {
                    "id": next_img_id,
                    "width": size,
                    "height": size,
                    "file_name": os.path.basename(img_name),
                    "image_path": img_name,
                    "lidar_path": lidar_name,
                    # world == pixel coords for synthetic tiles
                    "top_left": [0.0, float(size)],
                    "res_x": 1.0,
                }
            )
            mask_area = 0.0
            for poly in polygons:
                ring = np.concatenate([poly, poly[:1]], axis=0)
                annotations.append(
                    {
                        "id": next_ann_id,
                        "image_id": next_img_id,
                        "category_id": CATEGORY_ID,
                        "segmentation": [ring.reshape(-1).tolist()],
                        "area": abs(poly_area(poly)),
                        "bbox": [
                            float(poly[:, 0].min()),
                            float(poly[:, 1].min()),
                            float(np.ptp(poly[:, 0])),
                            float(np.ptp(poly[:, 1])),
                        ],
                        "iscrowd": 0,
                    }
                )
                next_ann_id += 1
                mask_area += abs(poly_area(poly))
            class_freq_acc.append(mask_area / (size * size))
            next_img_id += 1
        coco = {
            "images": images,
            "annotations": annotations,
            "categories": [{"id": CATEGORY_ID, "name": "building"}],
        }
        ann_path = ds.annotations[split]
        os.makedirs(os.path.dirname(ann_path), exist_ok=True)
        with open(ann_path, "w") as f:
            json.dump(coco, f)
        # ffl stats (class frequency of [background, interior] pixels)
        stats_path = ds.ffl_stats[split]
        os.makedirs(os.path.dirname(stats_path), exist_ok=True)
        freq = float(np.mean(class_freq_acc)) if class_freq_acc else 0.1
        np.savez(stats_path, class_freq=np.array([1.0 - freq, freq], np.float32))


def ensure_synthetic_dataset(cfg) -> None:
    """Generate the synthetic dataset once if missing (idempotent)."""
    ds = cfg.experiment.dataset
    if ds.name != "Synthetic":
        return
    if all(os.path.isfile(ds.annotations[s]) for s in ("train", "val", "test")):
        return
    write_synthetic_dataset(cfg)
