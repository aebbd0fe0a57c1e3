"""P3 dataset: COCO-indexed tiles with per-model GT builders, fixed shapes.

Capability parity with the reference's P3Dataset (datasets/p3_coco.py:28-701)
re-designed for XLA: every item has static shapes (padded lidar + masks,
fixed-size token/permutation/junction arrays), so batches jit cleanly.

Per-model items:
- pix2poly (:340-436): corner list → token sequence + GT permutation matrix
  (cyclic successor per polygon, identity diag padding, open-contour fix);
- hisup (:548-688): junctions with concave/convex tags (convex-hull test),
  positive edges, instance mask (jloc/joff/afm targets are derived on-device
  in the train step — the reference runs a CUDA AFM op per step instead);
- ffl (:221-299): rasterized interior/edge/vertex + distances/sizes +
  tangent-angle field (computed on the fly via data/ffl_gt.py and cached on
  disk, replacing the reference's offline .pt preprocessing).

Image loading: PNG/JPEG/TIFF via cv2/PIL (rasterio is not available).
LiDAR loading: .npz (points array), uncompressed .las, and COPC/LASzip .laz
via the native codec (native/laszip.cpp), matching the reference's
laspy[lazrs] path (p3_coco.py:74-101).
"""

from __future__ import annotations

import os
from typing import Optional

import cv2
import numpy as np

from ..utils.coco import CocoIndex, seg_to_mask
from ..utils.logger import make_logger
from . import augment
from .ffl_gt import compute_ffl_gt

MAX_JUNCTIONS = 256
MAX_EDGES = 256


def build_perm_targets(polys: list[np.ndarray], nmax: int) -> tuple[np.ndarray, np.ndarray]:
    """Pix2Poly GT: concatenated corners (≤ nmax, 2) + (nmax, nmax) cyclic
    successor permutation with identity-diag padding and the open-contour fix
    (reference datasets/p3_coco.py:340-436, 409-414). Shared by the host
    loader and the device-cache builder so the two paths cannot drift."""
    corners: list = []
    perm = np.zeros((nmax, nmax), np.float32)
    v_count = 0
    for p in polys:
        corners.extend(p.tolist())
        n = len(p)
        for i in range(n):
            j = (i + 1) % n
            if v_count + i > nmax - 1 or v_count + j > nmax - 1:
                break
            perm[v_count + i, v_count + j] = 1.0
        v_count += n
    for i in range(min(v_count, nmax), nmax):
        perm[i, i] = 1.0
    # open-contour fix (p3_coco.py:409-414)
    for i in range(nmax):
        if perm[i].sum() == 0 or perm[:, i].sum() == 0:
            perm[i, i] = 1.0
    return np.asarray(corners, np.float64).reshape(-1, 2)[:nmax], perm


def load_image_file(path: str) -> np.ndarray:
    """(H, W, 3) uint8 RGB."""
    img = cv2.imread(path, cv2.IMREAD_UNCHANGED)
    if img is None:
        from PIL import Image

        return np.asarray(Image.open(path).convert("RGB"))
    if img.ndim == 2:
        img = np.stack([img] * 3, axis=-1)
    return img[..., :3][..., ::-1].copy()  # BGR → RGB


def load_las_points(path: str) -> np.ndarray:
    """Minimal uncompressed .las point reader (x, y, z only)."""
    with open(path, "rb") as f:
        header = f.read(375)
        if header[:4] != b"LASF":
            raise ValueError(f"not a LAS file: {path}")
        point_offset = int.from_bytes(header[96:100], "little")
        fmt = header[104]
        if fmt > 10:
            # LAZ-compressed payload inside a .las extension
            from ..native.laz import read_laz

            return read_laz(path)
        rec_len = int.from_bytes(header[105:107], "little")
        n_legacy = int.from_bytes(header[107:111], "little")
        sx, sy, sz = np.frombuffer(header[131:155], "<f8")
        ox, oy, oz = np.frombuffer(header[155:179], "<f8")
        n = n_legacy
        if n == 0 and len(header) >= 255:
            n = int.from_bytes(header[247:255], "little")
        f.seek(point_offset)
        raw = np.frombuffer(f.read(n * rec_len), np.uint8).reshape(n, rec_len)
        xyz_i = raw[:, :12].copy().view("<i4").reshape(n, 3).astype(np.float64)
        return (xyz_i * [sx, sy, sz] + [ox, oy, oz]).astype(np.float64)


def load_lidar_file(path: str) -> np.ndarray:
    if path.endswith(".npz"):
        return np.load(path)["points"].astype(np.float64)
    if path.endswith(".npy"):
        return np.load(path).astype(np.float64)
    if path.endswith(".las"):
        return load_las_points(path)
    if path.endswith(".laz"):
        # COPC / LASzip decode via the native codec (reference: laspy[lazrs]
        # at datasets/p3_coco.py:78)
        from ..native.laz import read_laz

        return read_laz(path)
    raise ValueError(f"unsupported lidar format: {path}")


class P3Dataset:
    def __init__(self, cfg, split: str, tokenizer=None, eval_mode: bool = False):
        """eval_mode forces inference transforms (Normalize only, no point
        shuffle) regardless of split — the reference predicts every split
        through its test loader (build_datasets.py get_test_loader)."""
        self.cfg = cfg
        self.split = split
        self.eval_mode = eval_mode
        self.logger = make_logger(f"{split}Dataset")
        self.tokenizer = tokenizer

        ds = cfg.experiment.dataset
        self.dataset_dir = ds.in_path
        ann_file = ds.annotations[split]
        if not os.path.isfile(ann_file):
            raise FileNotFoundError(ann_file)
        self.coco = CocoIndex(ann_file)
        self.tile_ids = self.coco.get_img_ids()
        subset = ds.get(f"{split}_subset")
        if subset:
            self.tile_ids = self.tile_ids[: int(subset)]

        enc = cfg.experiment.encoder
        self.use_images = bool(enc.use_images)
        self.use_lidar = bool(enc.use_lidar)
        self.model_type = cfg.experiment.model.name
        self.max_points = int(enc.get("max_num_points", 200000)) if self.use_lidar else 0
        self.z_range = float(enc.in_voxel_size.z) if self.use_lidar else 100.0
        is_train = split == "train" and not eval_mode
        self.augmentations = list(enc.augmentations or []) if is_train else (
            ["Normalize"] if "Normalize" in (enc.augmentations or []) else []
        )
        self.image_mean = list(enc.get("image_mean", [0.0, 0.0, 0.0]))
        self.image_std = list(enc.get("image_std", [1.0, 1.0, 1.0]))
        self.max_pixel_value = float(enc.get("image_max_pixel_value", 255.0))

        stats_file = ds.ffl_stats[split] if self.model_type == "ffl" else None
        self.class_freq = None
        if stats_file and os.path.isfile(stats_file):
            self.class_freq = np.load(stats_file)["class_freq"].astype(np.float32)
        self._ffl_cache_dir = os.path.join(self.dataset_dir, "ffl_cache", split)

    def __len__(self) -> int:
        return len(self.tile_ids)

    # --- raw loading ------------------------------------------------------

    def _image(self, info) -> np.ndarray:
        if not self.use_images:
            return np.zeros((info["height"], info["width"], 1), np.uint8)
        # P3 layout stores a repo-relative 'image_path'; legacy Inria-style
        # COCO files (reference datasets/inria_coco.py) only have 'file_name'
        rel = info.get("image_path") or os.path.join("images", self.split, info["file_name"])
        return load_image_file(os.path.join(self.dataset_dir, rel))

    def _lidar(self, info) -> Optional[np.ndarray]:
        if not self.use_lidar:
            return None
        pts = load_lidar_file(os.path.join(self.dataset_dir, info["lidar_path"]))
        # world → pixel coords (reference p3_coco.py:84-99)
        top_left = info.get("top_left")
        res = info.get("res_x", 0.25)
        if top_left is not None:
            pts = pts.copy()
            pts[:, 0] = (pts[:, 0] - top_left[0]) / res
            pts[:, 1] = (pts[:, 1] - top_left[1]) / res
            pts[:, 1] = info["height"] - pts[:, 1]
        zmin, zmax = pts[:, 2].min(), pts[:, 2].max()
        pts[:, 2] = (pts[:, 2] - zmin) / max(zmax - zmin, 1e-6) * self.z_range
        pts[:, 0] = np.clip(pts[:, 0], 0, info["width"])
        pts[:, 1] = np.clip(pts[:, 1], 0, info["height"])
        return pts.astype(np.float32)

    def _pad_lidar(self, pts: Optional[np.ndarray], rng) -> tuple[np.ndarray, np.ndarray]:
        out = np.zeros((self.max_points, 3), np.float32)
        mask = np.zeros((self.max_points,), bool)
        if pts is not None:
            if self.split == "train" and not self.eval_mode:  # PointShuffle (o3d parity)
                rng.shuffle(pts)
            n = min(len(pts), self.max_points)
            out[:n] = pts[:n]
            mask[:n] = True
        return out, mask

    def _polygons(self, info) -> list[np.ndarray]:
        """Open-ring (V, 2) (x, y) polygons, clipped to the tile."""
        polys = []
        for ann in self.coco.imgToAnns.get(info["id"], []):
            for seg in ann["segmentation"]:
                p = np.asarray(seg, np.float64).reshape(-1, 2)
                p[:, 0] = np.clip(p[:, 0], 0, info["width"] - 1)
                p[:, 1] = np.clip(p[:, 1], 0, info["height"] - 1)
                if np.allclose(p[0], p[-1]):
                    p = p[:-1]
                if len(p) >= 3:
                    polys.append(p)
        return polys

    # --- per-model items --------------------------------------------------

    def __getitem__(self, idx: int):
        return self.get_item(idx, np.random.RandomState((hash(self.split) + idx) % (2**31)))

    def get_item(self, idx: int, rng: np.random.RandomState) -> dict:
        if self.model_type == "pix2poly":
            return self._item_pix2poly(idx, rng)
        if self.model_type == "hisup":
            return self._item_hisup(idx, rng)
        if self.model_type == "ffl":
            return self._item_ffl(idx, rng)
        raise NotImplementedError(self.model_type)

    def _common(self, info, rng, params) -> dict:
        item: dict = {"image_id": np.int32(info["id"])}
        if self.use_images:
            img = self._image(info)
            item["images"] = augment.apply_image(
                img, params, self.image_mean, self.image_std, self.max_pixel_value, rng
            ).astype(np.float32)
        if self.use_lidar:
            pts = self._lidar(info)
            if pts is not None and params["d4"] != "e":
                pts = augment.apply_d4_lidar(pts, params["d4"], info["height"], info["width"])
            lidar, mask = self._pad_lidar(pts, rng)
            item["lidar"] = lidar
            item["lidar_mask"] = mask
        return item

    def _item_pix2poly(self, idx: int, rng) -> dict:
        assert self.tokenizer is not None, "pix2poly dataset needs a tokenizer"
        info = self.coco.imgs[self.tile_ids[idx]]
        params = augment.sample_params(rng, self.augmentations)
        item = self._common(info, rng, params)

        polys = self._polygons(info)
        nmax = self.tokenizer.max_num_vertices
        corners, perm = build_perm_targets(polys, nmax)
        if len(corners) and params["d4"] != "e":
            corners = augment.apply_d4_keypoints(corners, params["d4"], info["height"], info["width"])
        # tokenizer consumes (y, x)
        yx = corners[:, ::-1].copy() if len(corners) else corners
        tokens, _ = self.tokenizer(yx, shuffle=self.cfg.experiment.model.tokenizer.shuffle_tokens, rng=rng)
        item["y"] = self.tokenizer.pad(tokens)
        item["y_perm"] = perm
        return item

    def _item_hisup(self, idx: int, rng) -> dict:
        info = self.coco.imgs[self.tile_ids[idx]]
        params = augment.sample_params(rng, self.augmentations)
        item = self._common(info, rng, params)
        H, W = info["height"], info["width"]

        mask = np.zeros((H, W), np.float32)
        for ann in self.coco.imgToAnns.get(info["id"], []):
            mask += seg_to_mask(ann["segmentation"], H, W)
        mask = np.clip(mask, 0, 1)
        if params["d4"] != "e":
            mask = np.ascontiguousarray(augment.apply_d4_image(mask, params["d4"]))

        model_cfg = self.cfg.experiment.model
        max_j = int(model_cfg.get("max_junctions") or MAX_JUNCTIONS)
        max_e = int(model_cfg.get("max_edges") or MAX_EDGES)
        juncs = np.zeros((max_j, 2), np.float32)
        tags = np.zeros((max_j,), np.int32)
        jvalid = np.zeros((max_j,), bool)
        edges = np.zeros((max_e, 4), np.float32)
        evalid = np.zeros((max_e,), bool)
        jp = ep = 0
        for p in self._polygons(info):
            pts = p.copy()
            if params["d4"] != "e":
                pts = augment.apply_d4_keypoints(pts, params["d4"], H, W)
            n = len(pts)
            if jp + n > max_j or ep + n > max_e:
                self.logger.warning(
                    f"tile {info['id']}: HiSup GT truncated at "
                    f"{jp} junctions / {ep} edges (caps "
                    f"model.max_junctions={max_j}, model.max_edges={max_e}) — "
                    "remaining polygons dropped from training targets"
                )
                break
            # convex-hull membership → tag 2 (convex), else 1 (p3_coco.py:648-657)
            hull = cv2.convexHull(pts.astype(np.float32)).reshape(-1, 2)
            is_convex = np.array(
                [np.any(np.all(np.isclose(hull, q, atol=1e-3), axis=1)) for q in pts]
            )
            juncs[jp : jp + n] = pts
            tags[jp : jp + n] = np.where(is_convex, 2, 1)
            jvalid[jp : jp + n] = True
            for i in range(n):
                a, b = pts[i], pts[(i + 1) % n]
                edges[ep + i] = [a[0], a[1], b[0], b[1]]
            evalid[ep : ep + n] = True
            jp += n
            ep += n

        # decoder-resolution rescale (reference resize_hisup_annotations)
        S = int(self.cfg.experiment.model.decoder.in_feature_size)
        if S != W:
            s = S / W
            juncs = np.clip(juncs * s, 0, S - 1e-4)
            edges = edges * s
            mask_r = cv2.resize(mask.astype(np.uint8), (S, S), interpolation=cv2.INTER_NEAREST)
        else:
            mask_r = mask
        item.update(
            junctions=juncs,
            junc_tags=tags,
            junc_valid=jvalid,
            edges=edges,
            edges_valid=evalid,
            mask=mask_r.astype(np.float32),
            mask_ori=mask.astype(np.float32),
        )
        return item

    def _item_ffl(self, idx: int, rng) -> dict:
        info = self.coco.imgs[self.tile_ids[idx]]
        params = augment.sample_params(rng, self.augmentations)
        item = self._common(info, rng, params)
        H, W = info["height"], info["width"]

        gt = self._ffl_gt(info)
        g = params["d4"]
        poly_img = augment.apply_d4_image(gt["gt_polygons_image"], g).astype(np.float32) / 255.0
        angle = augment.apply_d4_image(gt["gt_crossfield_angle"], g).astype(np.float32) * np.pi / 255.0
        # stored field is normals; rotate to tangents (p3_coco.py:289-290)
        angle = (angle + np.pi / 2) % np.pi
        if self.split == "train" and not self.eval_mode:
            angle = augment.apply_d4_crossfield_angle(angle, g)
        item.update(
            gt_polygons_image=np.ascontiguousarray(np.transpose(poly_img, (2, 0, 1))),
            distances=np.ascontiguousarray(augment.apply_d4_image(gt["distances"], g))[None],
            sizes=np.ascontiguousarray(augment.apply_d4_image(gt["sizes"], g))[None],
            gt_crossfield_angle=np.ascontiguousarray(angle)[None],
            class_freq=self.class_freq
            if self.class_freq is not None
            else np.array([0.9, 0.1], np.float32),
        )
        return item

    def _ffl_gt(self, info) -> dict:
        cache = os.path.join(self._ffl_cache_dir, f"{info['id']}.npz")
        if os.path.isfile(cache):
            with np.load(cache) as z:
                return {k: z[k] for k in z.files}
        gt = compute_ffl_gt(self._polygons(info), info["height"], info["width"])
        os.makedirs(self._ffl_cache_dir, exist_ok=True)
        import threading

        # np.savez appends .npz otherwise; pid+tid keeps loader threads from racing
        tmp = cache + f".tmp{os.getpid()}_{threading.get_ident()}.npz"
        np.savez_compressed(tmp, **gt)
        os.replace(tmp, cache)
        return gt
