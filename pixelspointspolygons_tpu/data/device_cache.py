"""Device-resident dataset cache: zero per-step host→device traffic.

TPU-native input-pipeline design (no reference counterpart — the reference
streams every batch through a torch DataLoader across PCIe,
datasets/build_datasets.py:51-310): on the axon tunnel the host→device link
moves ~5 MB/s under load, so a 16-sample Pix2Poly batch (~6 MB as f16) costs
≈1 s while the device step itself takes <0.15 s.  Instead the WHOLE split is
uploaded once — raw uint8 images plus the small discrete GT (token sequences
for all 8 D4 variants, permutation-matrix factors) — and each step gathers +
augments + normalizes ON DEVICE inside one jitted function.  Steady-state
per-step host traffic is a few hundred bytes of indices/augment params.

Augmentation parity: the per-item numpy RNG stream is the SAME one the host
loader uses (`Loader._make_batch` seeds RandomState(seed·1e6+epoch·1e4+i) and
`augment.sample_params` draws d4/jitter/noise first), so the device path sees
identical d4 elements and photometric factors per (seed, epoch, item); token
sequences per D4 element are precomputed with the exact host tokenizer.  The
only divergence is the Gaussian-noise field itself (drawn from jax RNG
instead of numpy — iid either way).

Covers all three model families across all three modalities: images ride as
uint8, lidar point clouds as f32 trimmed to the split's true max point count
(synthetic tiles carry 30-60k points, not the 200k config pad), both
D4-transformed on device.  HiSup additionally packs junction/edge geometry
(GT targets derive on device in the train step); FFL packs its raw uint8 GT
rasters and replays the D4 + angle-value transforms on device.

Lidar parity note: the host loader's PointShuffle draws from the per-item
numpy stream; the device path permutes with jax RNG instead — a random
permutation either way (order only matters through voxel first-come capacity
truncation), so the paths are distribution-identical but not bit-identical
in point ORDER.  Coordinates themselves replay exactly.  One further caveat:
when a tile carries MORE points than `max_num_points`, the host loader keeps
a fresh random subset each epoch (shuffle-then-truncate) while the cache
holds a fixed first-cap subset permuted on device — identical when the cap
covers the tile (the packer sizes the cap to the split's true max, so this
is the normal case), a fixed-subsample approximation otherwise.
"""

from __future__ import annotations

import os
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..utils.logger import make_logger
from . import augment
from .dataset import P3Dataset, build_perm_targets

logger = make_logger("DeviceCache")


class CacheFitError(ValueError):
    """Raised when the packed split would not safely fit in device memory.

    Trainers treat this as 'use the host loader' even when
    training.device_cache=true — a slow fallback beats dying in
    RESOURCE_EXHAUSTED after a multi-minute upload (the round-4
    HiSup-fusion failure mode)."""


def _device_memory_budget(device) -> int | None:
    """Bytes of device memory, or None when unknown/unbounded (CPU tests)."""
    try:
        stats = device.memory_stats()
        if stats and stats.get("bytes_limit"):
            return int(stats["bytes_limit"])
    except Exception:
        pass
    if getattr(device, "platform", "cpu") != "cpu":
        return 16 * 2**30  # v5e default when the tunnel hides memory_stats
    return None


# --- perm-matrix factorization ----------------------------------------------
# A Pix2Poly GT permutation row has an off-diagonal successor, a diagonal
# padding 1, or (open-contour fix) both.  Store (successor index, extra-diag
# flag) instead of the dense (nmax, nmax) float matrix: 192*192*4 B → 192*3 B
# per tile, rebuilt on device as one_hot(succ) + extra·I.


def perm_factorize(perm: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    nmax = perm.shape[0]
    off = perm * (1.0 - np.eye(nmax, dtype=perm.dtype))
    has_off = off.sum(1) > 0
    succ = np.where(has_off, off.argmax(1), np.arange(nmax)).astype(np.int32)
    extra = (np.diagonal(perm) > 0) & has_off
    # exactness guard: the factorization must reproduce the matrix bit-for-bit
    recon = np.eye(nmax, dtype=np.float32)[succ]
    recon[extra, np.arange(nmax)[extra]] += 1.0
    if not np.array_equal(recon, perm):
        raise ValueError("perm matrix not representable as one_hot(succ)+extra·I")
    return succ.astype(np.int16), extra


def perm_rebuild(succ: jnp.ndarray, extra: jnp.ndarray, nmax: int) -> jnp.ndarray:
    """(B, nmax) int, (B, nmax) bool → (B, nmax, nmax) f32 on device."""
    one = jax.nn.one_hot(succ.astype(jnp.int32), nmax, dtype=jnp.float32)
    return one + extra.astype(jnp.float32)[..., None] * jnp.eye(nmax, dtype=jnp.float32)


# --- on-device photometric ops ----------------------------------------------


def _rgb_to_hsv(rgb):
    r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
    maxc = jnp.max(rgb, axis=-1)
    minc = jnp.min(rgb, axis=-1)
    v = maxc
    rng_ = maxc - minc
    s = jnp.where(maxc > 0, rng_ / jnp.maximum(maxc, 1e-12), 0.0)
    safe = jnp.maximum(rng_, 1e-12)
    rc = (maxc - r) / safe
    gc = (maxc - g) / safe
    bc = (maxc - b) / safe
    h = jnp.where(
        maxc == r, bc - gc, jnp.where(maxc == g, 2.0 + rc - bc, 4.0 + gc - rc)
    )
    h = jnp.where(rng_ > 0, (h / 6.0) % 1.0, 0.0)
    return h, s, v


def _hsv_to_rgb(h, s, v):
    i = jnp.floor(h * 6.0)
    f = h * 6.0 - i
    p = v * (1.0 - s)
    q = v * (1.0 - s * f)
    t = v * (1.0 - s * (1.0 - f))
    i = i.astype(jnp.int32) % 6
    r = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5], [v, q, p, p, t, v])
    g = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5], [t, v, v, q, p, p])
    b = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5], [p, p, t, v, v, q])
    return jnp.stack([r, g, b], axis=-1)


def _apply_jitter(unit, jitter):
    """jitter: (4,) [brightness, contrast, saturation, hue] — mirrors the
    host path augment.apply_image on unit-scale pixels."""
    unit = unit * jitter[0]
    m = unit.mean()
    unit = (unit - m) * jitter[1] + m
    gray = (
        0.299 * unit[..., 0] + 0.587 * unit[..., 1] + 0.114 * unit[..., 2]
    )[..., None]
    unit = gray + jitter[2] * (unit - gray)
    h, s, v = _rgb_to_hsv(jnp.clip(unit, 0.0, 1.0))
    h = (h + jitter[3]) % 1.0
    return _hsv_to_rgb(h, s, v)


def _d4_image(img, g):
    """Square (H, W, C) image under D4 element index g (augment.D4_ELEMENTS
    order: e, r90, r180, r270, v, hvt, h, t)."""
    return jax.lax.switch(
        g,
        [
            lambda x: x,
            lambda x: jnp.rot90(x, 1),
            lambda x: jnp.rot90(x, 2),
            lambda x: jnp.rot90(x, 3),
            lambda x: x[::-1],
            lambda x: jnp.swapaxes(x, 0, 1)[::-1, ::-1],
            lambda x: x[:, ::-1],
            lambda x: jnp.swapaxes(x, 0, 1),
        ],
        img,
    )


def _d4_points(pts, g, height, width):
    """(N, 3) (x, y, z) points under D4 element index g — the jnp re-expression
    of augment.apply_d4_keypoints/apply_d4_lidar (exact same arithmetic)."""
    x, y, z = pts[:, 0], pts[:, 1], pts[:, 2]
    W1, H1 = jnp.float32(width - 1), jnp.float32(height - 1)
    xy = jax.lax.switch(
        g,
        [
            lambda: (x, y),
            lambda: (y, W1 - x),
            lambda: (W1 - x, H1 - y),
            lambda: (H1 - y, x),
            lambda: (x, H1 - y),
            lambda: (H1 - y, W1 - x),
            lambda: (W1 - x, y),
            lambda: (y, x),
        ],
    )
    return jnp.stack([xy[0], xy[1], z], axis=1)


# --- cache build (host, one-time, persisted) ---------------------------------


def _load_pack_if_current(path: str, n_expected: int):
    """Load a persisted pack only if its row count matches the split length.

    The pack filename is keyed by shape-relevant config (sizes, modality) but
    NOT by the tile count, so a run with a different num_train on the same
    dataset version would silently reuse a stale pack (e.g. round 4's full
    16384-row xxl lidar pack when the config asks for an 8192-tile subset) —
    wrong tiles AND a multi-GB upload the box can't afford. Rebuild instead."""
    if not os.path.isfile(path):
        return None
    with np.load(path) as z:
        rows = int(z["image_id"].shape[0])
        if rows == n_expected:
            return {k: z[k] for k in z.files}
    logger.warning(
        f"stale device-cache pack {path}: {rows} rows != split length "
        f"{n_expected} — rebuilding"
    )
    return None


def _atomic_savez(path: str, arrays: dict) -> None:
    """Publish a cache pack atomically (tmp + rename): packs are built
    lazily by whichever process needs them first, and a reader must never
    np.load a half-written file."""
    tmp = f"{path}.tmp.{os.getpid()}.npz"  # savez appends .npz if missing
    np.savez(tmp, **arrays)
    os.replace(tmp, path)


def _cache_path(cfg, split: str) -> str:
    ds = cfg.experiment.dataset
    enc = cfg.experiment.encoder
    nmax = int(cfg.experiment.model.tokenizer.max_num_vertices)
    bins = int(cfg.experiment.model.tokenizer.num_bins)
    mod = ("i" if bool(enc.use_images) else "") + ("l" if bool(enc.use_lidar) else "")
    tag = "" if mod == "i" else f"_{mod}"
    return os.path.join(ds.in_path, f"p2p_cache_{split}_n{nmax}_b{bins}{tag}.npz")


def build_p2p_cache_arrays(cfg, split: str, tokenizer) -> dict:
    """Pack the split for device residence.  Reuses P3Dataset's raw loaders
    (image/polygon parity with the host path) but tokenizes every D4 variant
    once with shuffle disabled."""
    if bool(cfg.experiment.model.tokenizer.shuffle_tokens) or bool(
        cfg.experiment.model.shuffle_polygons
    ):
        raise NotImplementedError(
            "device cache precomputes token sequences; incompatible with "
            "shuffle_tokens/shuffle_polygons — use the host loader"
        )
    from .synthetic import ensure_synthetic_dataset

    ensure_synthetic_dataset(cfg)
    path = _cache_path(cfg, split)
    ds = P3Dataset(cfg, split, tokenizer=tokenizer)
    n = len(ds)
    cached = _load_pack_if_current(path, n)
    if cached is not None:
        return cached
    nmax = tokenizer.max_num_vertices
    L = tokenizer.max_len
    H, W = int(cfg.experiment.encoder.in_height), int(cfg.experiment.encoder.in_width)
    images = np.zeros((n, H, W, 3), np.uint8) if ds.use_images else None
    ys = np.zeros((len(augment.D4_ELEMENTS), n, L), np.int16)
    succ = np.zeros((n, nmax), np.int16)
    extra = np.zeros((n, nmax), bool)
    image_id = np.zeros((n,), np.int32)
    raw_pts: list = [None] * n if ds.use_lidar else []

    import concurrent.futures as cf

    def pack_one(idx: int) -> None:
        info = ds.coco.imgs[ds.tile_ids[idx]]
        if ds.use_images:
            images[idx] = ds._image(info)
        if ds.use_lidar:
            raw_pts[idx] = ds._lidar(info)[: ds.max_points]
        image_id[idx] = info["id"]
        corners, perm = build_perm_targets(ds._polygons(info), nmax)
        succ[idx], extra[idx] = perm_factorize(perm)
        for gi, g in enumerate(augment.D4_ELEMENTS):
            c = (
                augment.apply_d4_keypoints(corners, g, info["height"], info["width"])
                if len(corners) and g != "e"
                else corners
            )
            yx = c[:, ::-1].copy() if len(c) else c
            tokens, _ = tokenizer(yx, shuffle=False)
            ys[gi, idx] = tokenizer.pad(tokens).astype(np.int16)

    with cf.ThreadPoolExecutor(16) as ex:
        list(ex.map(pack_one, range(n)))

    arrays = {
        "ys": ys,
        "succ": succ,
        "extra": extra,
        "image_id": image_id,
    }
    if ds.use_images:
        arrays["images"] = images
    if ds.use_lidar:
        # trim to the split's true max point count (multiple of 1024) instead
        # of the config's 200k pad — device memory and upload time scale with
        # the cap, the model is shape-generic in N
        counts = np.asarray([len(p) for p in raw_pts], np.int32)
        cap = int(min(ds.max_points, ((int(counts.max()) + 1023) // 1024) * 1024))
        lidar = np.zeros((n, cap, 3), np.float32)
        for i, p in enumerate(raw_pts):
            k = min(len(p), cap)
            lidar[i, :k] = p[:k]
        arrays["lidar"] = lidar
        arrays["lidar_n"] = np.minimum(counts, cap)
    _atomic_savez(path, arrays)
    logger.info(f"packed {split} device cache ({n} tiles) → {path}")
    return arrays


# --- the cache object ---------------------------------------------------------


class _DeviceCacheBase:
    """Device-resident split with a jitted gather+augment batcher.

    Single-device-mesh fast path (the production single-chip regime); the
    multi-chip trainers keep the host loader + shard_batch route.  Subclasses
    provide `_build_arrays()` (the host-side packed split) and
    `_build_batch_fn()` (the jitted per-batch gather+augment); epoch order and
    augmentation-parameter replay are shared and host-loader-exact.
    """

    def __init__(self, cfg, split: str, mesh, batch_size: int | None = None):
        if int(np.prod(mesh.devices.shape)) != 1:
            raise ValueError(f"{type(self).__name__} is a single-device fast path")
        self.cfg = cfg
        self.split = split
        self.is_train = split == "train"
        self.batch_size = int(batch_size or cfg.experiment.model.batch_size)
        self.seed = int(cfg.get("seed", 42))
        enc = cfg.experiment.encoder
        self.augmentations = list(enc.augmentations or []) if self.is_train else []
        self.mean = np.asarray(list(enc.get("image_mean", [0, 0, 0])), np.float32)
        self.std = np.asarray(list(enc.get("image_std", [1, 1, 1])), np.float32)
        self.max_pix = float(enc.get("image_max_pixel_value", 255.0))

        self.use_images = bool(enc.use_images)
        self.use_lidar = bool(enc.use_lidar)
        self.in_h, self.in_w = int(enc.in_height), int(enc.in_width)

        arrays = self._build_arrays()
        self.n = len(arrays["image_id"])
        device = mesh.devices.reshape(-1)[0]
        nbytes = sum(a.nbytes for a in arrays.values())
        budget = _device_memory_budget(device)
        # leave at least half the HBM for params/optimizer/activations: a
        # resident cache that crowds them out dies in RESOURCE_EXHAUSTED on
        # the first train step, after the (multi-minute) upload
        if budget is not None and nbytes > 0.5 * budget:
            raise CacheFitError(
                f"{self.split} cache is {nbytes/1e9:.1f} GB — more than half "
                f"the device's {budget/1e9:.1f} GB; falling back to the host "
                "loader (use a smaller split, e.g. dataset.version=v2xl)"
            )
        mb = nbytes / 1e6
        logger.info(
            f"uploading {split} cache to device: {self.n} tiles, {mb:.0f} MB "
            "(one-time; per-step host traffic drops to index/param scalars)"
        )
        self.dev = {
            k: _chunked_device_put(v, device) for k, v in arrays.items()
        }
        self.image_id = arrays["image_id"]
        self._batch_fn = self._build_batch_fn()

    def __len__(self) -> int:
        return self.n // self.batch_size if self.is_train else (
            (self.n + self.batch_size - 1) // self.batch_size
        )

    def epoch_batches(self, epoch: int):
        """Yield device-resident batch dicts for one epoch.  Replays the host
        loader's per-(seed, epoch, item) RNG stream for order + augment
        params (Loader._order / Loader._make_batch / augment.sample_params)."""
        B = self.batch_size
        order = np.arange(self.n)
        if self.is_train:
            np.random.RandomState(self.seed + epoch).shuffle(order)
            order = order[: (self.n // B) * B]
        n_batches = (len(order) + B - 1) // B
        for b in range(n_batches):
            sel = order[b * B : (b + 1) * B]
            valid = np.ones((B,), bool)
            if len(sel) < B:  # eval tail: repeat-pad like the host loader
                valid[len(sel):] = False
                sel = np.concatenate([sel, np.full(B - len(sel), sel[0] if len(sel) else 0)])
            d4 = np.zeros((B,), np.int32)
            jitter = np.tile(np.array([1, 1, 1, 0], np.float32), (B, 1))
            sigma = np.zeros((B,), np.float32)
            if self.is_train:
                for k, i in enumerate(sel):
                    rng = np.random.RandomState(
                        (self.seed * 1_000_003 + epoch * 10_007 + int(i)) % (2**31)
                    )
                    p = augment.sample_params(rng, self.augmentations)
                    d4[k] = augment.D4_ELEMENTS.index(p["d4"])
                    if p.get("jitter"):
                        j = p["jitter"]
                        jitter[k] = [j["brightness"], j["contrast"], j["saturation"], j["hue"]]
                    if p.get("noise_sigma"):
                        sigma[k] = p["noise_sigma"]
            step_rng = jax.random.PRNGKey(
                (self.seed * 7_919 + epoch * 104_729 + b) % (2**31)
            )
            batch = self._batch_fn(
                self.dev,
                jnp.asarray(sel, jnp.int32),
                jnp.asarray(d4),
                jnp.asarray(jitter),
                jnp.asarray(sigma),
                step_rng,
            )
            batch["sample_valid"] = np.asarray(valid)
            batch["image_id"] = self.image_id[sel]
            yield batch

    # subclass hooks -------------------------------------------------------
    def _build_arrays(self) -> dict:
        raise NotImplementedError

    def _build_batch_fn(self):
        raise NotImplementedError

    # shared jitted building blocks ---------------------------------------
    def _augment_images_dev(self, imgs_u8, d4, jitter, sigma, rng):
        """uint8 (B, H, W, 3) → normalized float batch under per-item D4 +
        photometric params (identical arithmetic to augment.apply_image)."""
        use_jitter = "ColorJitter" in self.augmentations
        use_noise = "GaussNoise" in self.augmentations
        imgs = jax.vmap(_d4_image)(imgs_u8, d4)
        unit = imgs.astype(jnp.float32) / 255.0
        if use_jitter:
            unit = jax.vmap(_apply_jitter)(unit, jitter)
        if use_noise:
            noise = jax.random.normal(rng, unit.shape, jnp.float32)
            unit = unit + noise * sigma[:, None, None, None]
        unit = jnp.clip(unit, 0.0, 1.0)
        return (unit * 255.0 / self.max_pix - self.mean) / self.std

    def _lidar_batch_dev(self, dev, idxs, d4, rng):
        """Gather + D4 + (train) PointShuffle for the lidar leaves."""
        pts = jax.vmap(lambda p, g: _d4_points(p, g, self.in_h, self.in_w))(
            dev["lidar"][idxs], d4
        )
        cap = pts.shape[1]
        mask = jnp.arange(cap)[None, :] < dev["lidar_n"][idxs][:, None]
        if self.is_train:
            perm_keys = jax.random.split(jax.random.fold_in(rng, 1), pts.shape[0])
            perms = jax.vmap(lambda k: jax.random.permutation(k, cap))(perm_keys)
            pts = jnp.take_along_axis(pts, perms[:, :, None], axis=1)
            mask = jnp.take_along_axis(mask, perms, axis=1)
        return pts * mask[..., None], mask


class P2PDeviceCache(_DeviceCacheBase):
    """Device-resident Pix2Poly split (all modalities)."""

    def __init__(self, cfg, split: str, tokenizer, mesh, batch_size: int | None = None):
        self.tokenizer = tokenizer
        self.nmax = tokenizer.max_num_vertices
        super().__init__(cfg, split, mesh, batch_size)

    def _build_arrays(self) -> dict:
        return build_p2p_cache_arrays(self.cfg, self.split, self.tokenizer)

    def _build_batch_fn(self):
        nmax = self.nmax
        use_images, use_lidar = self.use_images, self.use_lidar

        @jax.jit
        def fn(dev, idxs, d4, jitter, sigma, rng):
            batch = {
                "y": dev["ys"][d4, idxs].astype(jnp.int32),
                "y_perm": perm_rebuild(dev["succ"][idxs], dev["extra"][idxs], nmax),
            }
            if use_images:
                batch["images"] = self._augment_images_dev(
                    dev["images"][idxs], d4, jitter, sigma, rng
                )
            if use_lidar:
                batch["lidar"], batch["lidar_mask"] = self._lidar_batch_dev(
                    dev, idxs, d4, rng
                )
            return batch

        return fn


# --- HiSup device cache -------------------------------------------------------


def _d4_xy(pts, g, height, width):
    """(N, 2) (x, y) keypoints under D4 element index g — the jnp
    re-expression of augment.apply_d4_keypoints (exact same arithmetic)."""
    x, y = pts[:, 0], pts[:, 1]
    W1, H1 = jnp.float32(width - 1), jnp.float32(height - 1)
    xy = jax.lax.switch(
        g,
        [
            lambda: (x, y),
            lambda: (y, W1 - x),
            lambda: (W1 - x, H1 - y),
            lambda: (H1 - y, x),
            lambda: (x, H1 - y),
            lambda: (H1 - y, W1 - x),
            lambda: (W1 - x, y),
            lambda: (y, x),
        ],
    )
    return jnp.stack([xy[0], xy[1]], axis=1)


def _hisup_cache_path(cfg, split: str) -> str:
    ds = cfg.experiment.dataset
    enc = cfg.experiment.encoder
    m = cfg.experiment.model
    S = int(m.decoder.in_feature_size)
    max_j = int(m.get("max_junctions") or 256)
    max_e = int(m.get("max_edges") or 256)
    mod = ("i" if bool(enc.use_images) else "") + ("l" if bool(enc.use_lidar) else "")
    return os.path.join(
        ds.in_path, f"hisup_cache_{split}_s{S}_j{max_j}_e{max_e}_{mod}.npz"
    )


def build_hisup_cache_arrays(cfg, split: str) -> dict:
    """Pack a HiSup split for device residence: uint8 images, f32 lidar,
    UNtransformed junction coords + polygon-edge junction INDICES (edge coords
    are re-derived on device from the D4-transformed junctions, so geometry
    needs no per-D4 storage), convex/concave tags (D4-invariant — isometries
    preserve hull membership), and base masks at both decoder and image
    resolution (D4 commutes with square nearest-neighbor resize)."""
    from .synthetic import ensure_synthetic_dataset

    ensure_synthetic_dataset(cfg)
    path = _hisup_cache_path(cfg, split)
    ds = P3Dataset(cfg, split)
    n = len(ds)
    cached = _load_pack_if_current(path, n)
    if cached is not None:
        return cached

    import cv2

    from ..utils.coco import seg_to_mask
    from .dataset import MAX_EDGES, MAX_JUNCTIONS
    m = cfg.experiment.model
    max_j = int(m.get("max_junctions") or MAX_JUNCTIONS)
    max_e = int(m.get("max_edges") or MAX_EDGES)
    S = int(m.decoder.in_feature_size)
    H, W = int(cfg.experiment.encoder.in_height), int(cfg.experiment.encoder.in_width)

    images = np.zeros((n, H, W, 3), np.uint8) if ds.use_images else None
    juncs = np.zeros((n, max_j, 2), np.float32)
    tags = np.zeros((n, max_j), np.int32)
    jvalid = np.zeros((n, max_j), bool)
    eidx = np.zeros((n, max_e, 2), np.int32)
    evalid = np.zeros((n, max_e), bool)
    mask_h = np.zeros((n, H, W), np.uint8)
    mask_s = mask_h if S == W else np.zeros((n, S, S), np.uint8)
    image_id = np.zeros((n,), np.int32)
    raw_pts: list = [None] * n if ds.use_lidar else []

    import concurrent.futures as cf

    def pack_one(idx: int) -> None:
        info = ds.coco.imgs[ds.tile_ids[idx]]
        if ds.use_images:
            images[idx] = ds._image(info)
        if ds.use_lidar:
            raw_pts[idx] = ds._lidar(info)[: ds.max_points]
        image_id[idx] = info["id"]
        mask = np.zeros((info["height"], info["width"]), np.float32)
        for ann in ds.coco.imgToAnns.get(info["id"], []):
            mask += seg_to_mask(ann["segmentation"], info["height"], info["width"])
        mask_h[idx] = np.clip(mask, 0, 1).astype(np.uint8)
        if S != W:
            mask_s[idx] = cv2.resize(mask_h[idx], (S, S), interpolation=cv2.INTER_NEAREST)
        jp = ep = 0
        for p in ds._polygons(info):
            pts = np.asarray(p, np.float32)
            nn = len(pts)
            if jp + nn > max_j or ep + nn > max_e:
                break  # same truncation as the host loader (dataset.py:293-300)
            hull = cv2.convexHull(pts).reshape(-1, 2)
            is_convex = np.array(
                [np.any(np.all(np.isclose(hull, q, atol=1e-3), axis=1)) for q in pts]
            )
            juncs[idx, jp : jp + nn] = pts
            tags[idx, jp : jp + nn] = np.where(is_convex, 2, 1)
            jvalid[idx, jp : jp + nn] = True
            src = jp + np.arange(nn)
            eidx[idx, ep : ep + nn, 0] = src
            eidx[idx, ep : ep + nn, 1] = jp + (np.arange(nn) + 1) % nn
            evalid[idx, ep : ep + nn] = True
            jp += nn
            ep += nn

    with cf.ThreadPoolExecutor(16) as ex:
        list(ex.map(pack_one, range(n)))

    arrays = {
        "junctions": juncs,
        "junc_tags": tags,
        "junc_valid": jvalid,
        "eidx": eidx,
        "edges_valid": evalid,
        "mask_h": mask_h,
        "image_id": image_id,
    }
    if S != W:
        arrays["mask_s"] = mask_s
    if ds.use_images:
        arrays["images"] = images
    if ds.use_lidar:
        counts = np.asarray([len(p) for p in raw_pts], np.int32)
        cap = int(min(ds.max_points, ((int(counts.max()) + 1023) // 1024) * 1024))
        lidar = np.zeros((n, cap, 3), np.float32)
        for i, p in enumerate(raw_pts):
            k = min(len(p), cap)
            lidar[i, :k] = p[:k]
        arrays["lidar"] = lidar
        arrays["lidar_n"] = np.minimum(counts, cap)
    _atomic_savez(path, arrays)
    logger.info(f"packed {split} hisup device cache ({n} tiles) → {path}")
    return arrays


class HiSupDeviceCache(_DeviceCacheBase):
    """Device-resident HiSup split: D4 of images/masks/junctions and the
    edge-coordinate rebuild all happen inside one jitted batcher; the
    AnnotationEncoder GT targets are already computed on device inside the
    train step (models/hisup/model.py encode_targets), so the whole GT path
    becomes host-free."""

    def __init__(self, cfg, split: str, mesh, batch_size: int | None = None):
        m = cfg.experiment.model
        self.S = int(m.decoder.in_feature_size)
        super().__init__(cfg, split, mesh, batch_size)

    def _build_arrays(self) -> dict:
        return build_hisup_cache_arrays(self.cfg, self.split)

    def _build_batch_fn(self):
        use_images, use_lidar = self.use_images, self.use_lidar
        in_h, in_w, S = self.in_h, self.in_w, self.S
        scale = S / in_w

        @jax.jit
        def fn(dev, idxs, d4, jitter, sigma, rng):
            batch = {}
            if use_images:
                batch["images"] = self._augment_images_dev(
                    dev["images"][idxs], d4, jitter, sigma, rng
                )
            if use_lidar:
                batch["lidar"], batch["lidar_mask"] = self._lidar_batch_dev(
                    dev, idxs, d4, rng
                )
            jv = dev["junc_valid"][idxs]
            ev = dev["edges_valid"][idxs]
            t = jax.vmap(lambda p, g: _d4_xy(p, g, in_h, in_w))(
                dev["junctions"][idxs], d4
            )
            t = jnp.where(jv[..., None], t, 0.0)
            if S != in_w:
                t = t * scale
                # host: junctions clipped, edge coords scaled unclipped
                # (dataset.py:317-321)
                j_out = jnp.clip(t, 0.0, S - 1e-4)
            else:
                j_out = t
            ei = dev["eidx"][idxs]  # (B, E, 2)
            ea = jnp.take_along_axis(t, ei[..., 0:1].repeat(2, -1), axis=1)
            eb = jnp.take_along_axis(t, ei[..., 1:2].repeat(2, -1), axis=1)
            edges = jnp.where(ev[..., None], jnp.concatenate([ea, eb], -1), 0.0)
            mask_key = "mask_s" if "mask_s" in dev else "mask_h"
            batch.update(
                junctions=j_out,
                junc_tags=dev["junc_tags"][idxs] * jv,
                junc_valid=jv,
                edges=edges,
                edges_valid=ev,
                mask=jax.vmap(_d4_image)(dev[mask_key][idxs], d4).astype(jnp.float32),
                mask_ori=jax.vmap(_d4_image)(dev["mask_h"][idxs], d4).astype(jnp.float32),
            )
            return batch

        return fn


# --- FFL device cache ---------------------------------------------------------


def _d4_angle_value(angle, g):
    """Tangent-angle VALUE transform (radians mod π) under D4 element index g
    — the jnp re-expression of augment.apply_d4_crossfield_angle (applied
    after the dense field itself was moved spatially). D4_ELEMENTS order:
    e, r90, r180, r270, v, hvt, h, t."""
    pi = jnp.float32(np.pi)
    return jax.lax.switch(
        g,
        [
            lambda a: a,
            lambda a: (a + pi / 2) % pi,
            lambda a: (a + pi) % pi,
            lambda a: (a + 3 * pi / 2) % pi,
            lambda a: (pi - a) % pi,
            lambda a: (3 * pi / 2 - a) % pi,
            lambda a: (-a) % pi,
            lambda a: (pi / 2 - a) % pi,
        ],
        angle,
    )


def _ffl_cache_path(cfg, split: str) -> str:
    ds = cfg.experiment.dataset
    enc = cfg.experiment.encoder
    seg = cfg.experiment.model.loss.seg
    mod = ("i" if bool(enc.use_images) else "") + ("l" if bool(enc.use_lidar) else "")
    wtag = "w" if (bool(seg.get("use_dist")) or bool(seg.get("use_size"))) else ""
    return os.path.join(ds.in_path, f"ffl_devcache_{split}_{mod}{wtag}.npz")


def build_ffl_cache_arrays(cfg, split: str) -> tuple[dict, np.ndarray]:
    """Pack an FFL split for device residence: uint8 images, the raw uint8 GT
    rasters exactly as the per-tile ffl_cache stores them (gt_polygons_image
    interior/edge/vertex, gt_crossfield_angle normal-angle field — both
    D4-moved and converted on device), f16 distance/size weight maps only
    when the cfg-gated seg-loss weighting needs them, f32 lidar. Returns
    (arrays, class_freq)."""
    from .synthetic import ensure_synthetic_dataset

    ensure_synthetic_dataset(cfg)
    path = _ffl_cache_path(cfg, split)
    ds = P3Dataset(cfg, split)
    class_freq = (
        ds.class_freq if ds.class_freq is not None else np.array([0.9, 0.1], np.float32)
    )
    n = len(ds)
    cached = _load_pack_if_current(path, n)
    if cached is not None:
        return cached, class_freq
    seg = cfg.experiment.model.loss.seg
    need_w = bool(seg.get("use_dist")) or bool(seg.get("use_size"))
    H, W = int(cfg.experiment.encoder.in_height), int(cfg.experiment.encoder.in_width)

    images = np.zeros((n, H, W, 3), np.uint8) if ds.use_images else None
    poly = np.zeros((n, H, W, 3), np.uint8)
    angle = np.zeros((n, H, W), np.uint8)
    dist = np.zeros((n, H, W), np.float16) if need_w else None
    sizes = np.zeros((n, H, W), np.float16) if need_w else None
    image_id = np.zeros((n,), np.int32)
    raw_pts: list = [None] * n if ds.use_lidar else []

    import concurrent.futures as cf

    def pack_one(idx: int) -> None:
        info = ds.coco.imgs[ds.tile_ids[idx]]
        if ds.use_images:
            images[idx] = ds._image(info)
        if ds.use_lidar:
            raw_pts[idx] = ds._lidar(info)[: ds.max_points]
        image_id[idx] = info["id"]
        gt = ds._ffl_gt(info)
        poly[idx] = gt["gt_polygons_image"]
        angle[idx] = gt["gt_crossfield_angle"]
        if need_w:
            dist[idx] = gt["distances"].astype(np.float16)
            sizes[idx] = gt["sizes"].astype(np.float16)

    with cf.ThreadPoolExecutor(16) as ex:
        list(ex.map(pack_one, range(n)))

    arrays = {"poly": poly, "angle": angle, "image_id": image_id}
    if need_w:
        arrays["dist"] = dist
        arrays["sizes"] = sizes
    if ds.use_images:
        arrays["images"] = images
    if ds.use_lidar:
        counts = np.asarray([len(p) for p in raw_pts], np.int32)
        cap = int(min(ds.max_points, ((int(counts.max()) + 1023) // 1024) * 1024))
        lidar = np.zeros((n, cap, 3), np.float32)
        for i, p in enumerate(raw_pts):
            k = min(len(p), cap)
            lidar[i, :k] = p[:k]
        arrays["lidar"] = lidar
        arrays["lidar_n"] = np.minimum(counts, cap)
    _atomic_savez(path, arrays)
    logger.info(f"packed {split} ffl device cache ({n} tiles) → {path}")
    return arrays, class_freq


class FFLDeviceCache(_DeviceCacheBase):
    """Device-resident FFL split: the host loader's ~1 s/step tunnel tax was
    the round-4 blocker for the FFL lidar/fusion grid cells (463 s/epoch on
    xl; VERDICT r4 weak #4). Dense GT rides as raw uint8 rasters; D4 moves +
    angle-value rotation + unit conversion happen inside the jitted batcher
    with arithmetic identical to P3Dataset._item_ffl."""

    def _build_arrays(self) -> dict:
        arrays, self.class_freq = build_ffl_cache_arrays(self.cfg, self.split)
        return arrays

    def _build_batch_fn(self):
        use_images, use_lidar = self.use_images, self.use_lidar
        is_train = self.is_train
        cf = jnp.asarray(self.class_freq, jnp.float32)

        @jax.jit
        def fn(dev, idxs, d4, jitter, sigma, rng):
            batch = {}
            if use_images:
                batch["images"] = self._augment_images_dev(
                    dev["images"][idxs], d4, jitter, sigma, rng
                )
            if use_lidar:
                batch["lidar"], batch["lidar_mask"] = self._lidar_batch_dev(
                    dev, idxs, d4, rng
                )
            B = idxs.shape[0]
            poly = jax.vmap(_d4_image)(dev["poly"][idxs], d4).astype(jnp.float32) / 255.0
            batch["gt_polygons_image"] = jnp.transpose(poly, (0, 3, 1, 2))
            ang = jax.vmap(_d4_image)(dev["angle"][idxs], d4).astype(jnp.float32)
            ang = ang * jnp.float32(np.pi) / 255.0
            # stored field is normals; rotate to tangents (dataset.py _item_ffl)
            ang = (ang + jnp.float32(np.pi) / 2) % jnp.float32(np.pi)
            if is_train:
                ang = jax.vmap(_d4_angle_value)(ang, d4)
            batch["gt_crossfield_angle"] = ang[:, None]
            if "dist" in dev:
                batch["distances"] = jax.vmap(_d4_image)(
                    dev["dist"][idxs], d4
                ).astype(jnp.float32)[:, None]
            if "sizes" in dev:
                batch["sizes"] = jax.vmap(_d4_image)(
                    dev["sizes"][idxs], d4
                ).astype(jnp.float32)[:, None]
            batch["class_freq"] = jnp.broadcast_to(cf, (B, cf.shape[0]))
            return batch

        return fn


def _chunked_device_put(arr: np.ndarray, device, chunk_mb: int = 256):
    """Upload a large array in bounded chunks (the tunnel stalls on multi-GB
    single transfers), assembling on device via donated dynamic updates so
    peak device memory stays ~1× the array.  Chunk size picked from measured
    tunnel behavior: ~7 s fixed latency per transfer + ~8 MB/s, so 256 MB
    chunks run ~6 MB/s vs ~3 MB/s at 64 MB."""
    if arr.nbytes <= chunk_mb * 1e6 or arr.ndim == 0:
        return jax.device_put(arr, device)
    rows_per = max(1, int(chunk_mb * 1e6 // max(arr[0].nbytes, 1)))

    @partial(jax.jit, donate_argnums=(0,))
    def update(buf, chunk, start):
        return jax.lax.dynamic_update_slice_in_dim(buf, chunk, start, axis=0)

    buf = jax.device_put(jnp.zeros(arr.shape, arr.dtype), device)
    for s in range(0, arr.shape[0], rows_per):
        chunk = jax.device_put(np.ascontiguousarray(arr[s : s + rows_per]), device)
        buf = update(buf, chunk, s)
    return buf
