"""Debug visualizations (reference misc/debug_visualisations.py:9-359):
point clouds, polygons over images, masks, cross-field quiver plots."""

from __future__ import annotations

import os
from typing import Optional

import numpy as np


def _ax(figsize=(6, 6)):
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=figsize)
    return fig, ax, plt


def denormalize_image(image: np.ndarray, mean, std, max_pixel_value: float = 255.0) -> np.ndarray:
    """Invert the Normalize transform for display (shared_utils.py:50)."""
    img = np.asarray(image, np.float32)
    img = (img * np.asarray(std) + np.asarray(mean)) * max_pixel_value
    if max_pixel_value > 1.5:
        img = img / 255.0
    return np.clip(img, 0, 1)


def plot_image(image: np.ndarray, out_file: str) -> None:
    fig, ax, plt = _ax()
    ax.imshow(np.clip(image, 0, 1) if image.dtype != np.uint8 else image)
    ax.axis("off")
    _save(fig, plt, out_file)


def plot_point_cloud(points: np.ndarray, out_file: str, size: float = 0.3) -> None:
    """Top-down scatter colored by z (debug_visualisations plot_point_cloud)."""
    fig, ax, plt = _ax()
    sc = ax.scatter(points[:, 0], points[:, 1], c=points[:, 2], s=size, cmap="viridis")
    fig.colorbar(sc, ax=ax, label="z")
    ax.set_aspect("equal")
    ax.invert_yaxis()
    _save(fig, plt, out_file)


def plot_polygons(
    polygons: list, out_file: str, image: Optional[np.ndarray] = None, gt: Optional[list] = None
) -> None:
    fig, ax, plt = _ax()
    if image is not None:
        ax.imshow(np.clip(image, 0, 1))
    for poly in polygons:
        p = np.asarray(poly)
        ring = np.concatenate([p, p[:1]])
        ax.plot(ring[:, 0], ring[:, 1], "-o", lw=1.5, ms=2, color="tab:orange")
    for poly in gt or []:
        p = np.asarray(poly)
        ring = np.concatenate([p, p[:1]])
        ax.plot(ring[:, 0], ring[:, 1], "--", lw=1.0, color="tab:green")
    ax.set_aspect("equal")
    if image is None:
        ax.invert_yaxis()
    _save(fig, plt, out_file)


def plot_mask(mask: np.ndarray, out_file: str) -> None:
    fig, ax, plt = _ax()
    ax.imshow(mask, cmap="gray")
    ax.axis("off")
    _save(fig, plt, out_file)


def plot_crossfield(
    crossfield: np.ndarray, out_file: str, stride: int = 8, image: Optional[np.ndarray] = None
) -> None:
    """Quiver of the u/v directions of a (4, H, W) crossfield
    (debug_visualisations.py:206 plot_crossfield)."""
    from ..predict.ffl_polygonize import c0c2_to_uv_numpy

    u, v = c0c2_to_uv_numpy(np.asarray(crossfield))
    H, W = u.shape
    ys, xs = np.mgrid[0:H:stride, 0:W:stride]
    fig, ax, plt = _ax()
    if image is not None:
        ax.imshow(np.clip(image, 0, 1))
    for field, color in ((u, "tab:red"), (v, "tab:blue")):
        d = field[ys, xs]
        # field components are (di, dj) — quiver wants (dx, dy)=(dj, di)
        ax.quiver(xs, ys, d.imag, d.real, color=color, scale=40, width=0.002)
    ax.set_aspect("equal")
    if image is None:
        ax.invert_yaxis()
    _save(fig, plt, out_file)


def _save(fig, plt, out_file: str) -> None:
    os.makedirs(os.path.dirname(os.path.abspath(out_file)), exist_ok=True)
    fig.savefig(out_file, dpi=130, bbox_inches="tight")
    plt.close(fig)
