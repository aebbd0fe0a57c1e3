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
