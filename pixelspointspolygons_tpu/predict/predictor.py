"""Base predictor: checkpoint restore, single-file input loading, plotting.

Capability parity with reference predict/predictor.py:22-182 (ckpt load via
smart key matching → here exact orbax trees; rasterio/laspy file loading →
cv2/PIL + npz/las; matplotlib prediction plot)."""

from __future__ import annotations

import os
from typing import Optional

import numpy as np

from ..config.engine import Config
from ..data.dataset import load_image_file, load_lidar_file
from ..utils.checkpoint import CheckpointManager
from ..utils.logger import make_logger


class Predictor:
    def __init__(self, cfg: Config):
        self.cfg = cfg
        self.logger = make_logger(self.__class__.__name__)
        self.manager = CheckpointManager(cfg.output_dir)

    def load_checkpoint(self) -> dict:
        name = self.cfg.get("checkpoint") or "latest"
        payload = self.manager.restore(name)
        self.manager.check_modality_compat(payload.get("cfg"), self.cfg)
        self.logger.info(f"restored checkpoint {name!r} (epoch {payload.get('epoch')})")
        return payload

    # --- single-file inputs (predict_demo path) ---------------------------

    def load_image_from_file(self, path: str) -> np.ndarray:
        """(1, H, W, 3) float32, normalized with the encoder's stats."""
        enc = self.cfg.experiment.encoder
        img = load_image_file(path).astype(np.float32)
        mean = np.asarray(enc.get("image_mean", [0, 0, 0]), np.float32)
        std = np.asarray(enc.get("image_std", [1, 1, 1]), np.float32)
        maxv = float(enc.get("image_max_pixel_value", 255.0))
        return ((img / maxv - mean) / std)[None]

    def load_lidar_from_file(
        self, path: str, img_res: float = 0.25, img_dim: Optional[int] = None
    ) -> tuple[np.ndarray, np.ndarray]:
        """(1, N, 3) float32 pixel-coord points + (1, N) validity mask.

        Mirrors predictor.py:116-137 (world→pixel shift/scale, z→[0,z_range]).
        """
        enc = self.cfg.experiment.encoder
        img_dim = img_dim or int(enc.in_size)
        pts = load_lidar_file(path)
        pts = pts.copy()
        pts[:, 0] = (pts[:, 0] - pts[:, 0].min()) / img_res
        pts[:, 1] = (pts[:, 1] - pts[:, 1].min()) / img_res
        pts[:, 1] = img_dim - np.clip(pts[:, 1], 0, img_dim)
        pts[:, 0] = np.clip(pts[:, 0], 0, img_dim)
        z = pts[:, 2]
        zr = float(enc.in_voxel_size.z) if "in_voxel_size" in enc else 100.0
        pts[:, 2] = (z - z.min()) / max(z.max() - z.min(), 1e-6) * zr
        max_points = int(enc.get("max_num_points", 200000))
        out = np.zeros((max_points, 3), np.float32)
        mask = np.zeros((max_points,), bool)
        n = min(len(pts), max_points)
        out[:n] = pts[:n]
        mask[:n] = True
        return out[None], mask[None]

    def plot_prediction(self, image: Optional[np.ndarray], polygons: list, out_file: str) -> None:
        """Save an overlay png of predicted polygons (predictor.py:140-182)."""
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        fig, ax = plt.subplots(figsize=(6, 6))
        if image is not None:
            img = image[0] if image.ndim == 4 else image
            img = img - img.min()
            img = img / max(img.max(), 1e-6)
            ax.imshow(img)
        for poly in polygons:
            p = np.asarray(poly)
            if len(p) < 2:
                continue
            ring = np.concatenate([p, p[:1]])
            ax.plot(ring[:, 0], ring[:, 1], "-o", lw=1.5, ms=2.5)
        ax.set_aspect("equal")
        ax.invert_yaxis() if image is None else None
        os.makedirs(os.path.dirname(os.path.abspath(out_file)), exist_ok=True)
        fig.savefig(out_file, dpi=150, bbox_inches="tight")
        plt.close(fig)
        self.logger.info(f"wrote {out_file}")
