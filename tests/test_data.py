"""Data pipeline tests: D4 equivariance across image/keypoints/lidar/angle
(the replay property, SURVEY.md §7.2 stage-2 test plan), perm-matrix validity
(the reference's check_y_perm invariants, trainer_pix2poly.py:472-492),
synthetic dataset round-trip through all three model item builders, loader
padding/sharding, COCO RLE round-trip."""

import json
import os

import numpy as np
import pytest

from pixelspointspolygons_tpu.config import compose
from pixelspointspolygons_tpu.data import augment
from pixelspointspolygons_tpu.utils import coco as coco_utils


class TestD4:
    @pytest.mark.parametrize("g", augment.D4_ELEMENTS)
    def test_image_keypoint_equivariance(self, g, rng):
        """Moving the image then reading at transformed keypoints must equal
        reading the original image at the original keypoints."""
        H = W = 16
        img = rng.rand(H, W).astype(np.float32)
        pts = np.array([[3.0, 5.0], [10.0, 2.0], [0.0, 0.0], [15.0, 15.0]])  # (x, y)
        img_t = augment.apply_d4_image(img, g)
        pts_t = augment.apply_d4_keypoints(pts, g, H, W)
        for (x, y), (xt, yt) in zip(pts, pts_t):
            assert img[int(y), int(x)] == img_t[int(yt), int(xt)], g

    @pytest.mark.parametrize("g", augment.D4_ELEMENTS)
    def test_lidar_matches_keypoints(self, g, rng):
        H = W = 32
        pts = rng.uniform(0, 31, (20, 3))
        out = augment.apply_d4_lidar(pts, g, H, W)
        kp = augment.apply_d4_keypoints(pts[:, :2], g, H, W)
        np.testing.assert_allclose(out[:, :2], kp)
        np.testing.assert_allclose(out[:, 2], pts[:, 2])

    @pytest.mark.parametrize("g", augment.D4_ELEMENTS)
    def test_angle_field_equivariance(self, g):
        """Transforming an edge's endpoints and recomputing its tangent angle
        must match the angle-transform table."""
        H = W = 64
        a = np.array([[10.0, 20.0]])
        b = np.array([[40.0, 50.0]])
        # tangent angle in ij coords: angle(dy + i dx) mod π (ffl_gt spec)
        def ij_angle(p, q):
            d = (q - p)[0]
            ang = np.angle(d[1] + 1j * d[0])
            return ang + np.pi if ang < 0 else ang

        ang0 = ij_angle(a, b)
        at = augment.apply_d4_keypoints(a, g, H, W)
        bt = augment.apply_d4_keypoints(b, g, H, W)
        want = ij_angle(at, bt) % np.pi
        got = augment.apply_d4_crossfield_angle(np.array(ang0), g) % np.pi
        # compare as angles mod π
        diff = abs(want - got) % np.pi
        assert min(diff, np.pi - diff) < 1e-6, (g, want, got)


class TestCocoUtils:
    def test_rle_roundtrip(self, rng):
        mask = (rng.rand(13, 17) > 0.5).astype(np.uint8)
        rle = coco_utils.rle_encode(mask)
        np.testing.assert_array_equal(coco_utils.rle_decode(rle), mask)

    def test_seg_to_mask_square(self):
        seg = [[2, 2, 8, 2, 8, 8, 2, 8]]
        m = coco_utils.seg_to_mask(seg, 10, 10)
        assert m[5, 5] == 1 and m[0, 0] == 0
        assert m.sum() == 49  # inclusive fill of a 7x7 lattice square

    def test_generate_coco_ann(self):
        polys = [np.array([[0.0, 0.0], [4.0, 0.0], [4.0, 3.0]])]
        anns = coco_utils.generate_coco_ann(polys, image_id=7)
        assert anns[0]["category_id"] == 100
        assert anns[0]["score"] == 1.0
        assert anns[0]["area"] == pytest.approx(6.0)


@pytest.fixture(scope="module")
def synth_cfg(tmp_path_factory):
    root = tmp_path_factory.mktemp("synthds")
    import os

    os.environ["P3_DATASET_ROOT"] = str(root)
    os.environ["P3_MODEL_ROOT"] = str(root / "out")
    cfg = compose(
        [
            "experiment=debug",
            "run_type=debug",
            "experiment.dataset.num_train=6",
            "experiment.dataset.num_val=3",
            "experiment.dataset.num_test=3",
            "run_type.train_subset=null",
            "run_type.val_subset=null",
            "run_type.test_subset=null",
            "experiment.encoder.max_num_points=4000",
        ]
    )
    from pixelspointspolygons_tpu.data import ensure_synthetic_dataset

    ensure_synthetic_dataset(cfg)
    return cfg


class TestSyntheticDataset:
    def test_pix2poly_items(self, synth_cfg):
        from pixelspointspolygons_tpu.data import P3Dataset
        from pixelspointspolygons_tpu.models.pix2poly import Tokenizer

        tok = Tokenizer(synth_cfg)
        ds = P3Dataset(synth_cfg, "train", tokenizer=tok)
        assert len(ds) == 6
        item = ds.get_item(0, np.random.RandomState(0))
        assert item["images"].shape == (224, 224, 3)
        assert item["y"].shape == (tok.max_len,)
        perm = item["y_perm"]
        # perm is a valid permutation matrix: every row/col sums to 1
        np.testing.assert_allclose(perm.sum(0), 1.0)
        np.testing.assert_allclose(perm.sum(1), 1.0)
        assert item["y"][0] == tok.BOS_code

    def test_pix2poly_token_perm_consistency(self, synth_cfg):
        """Decoding GT tokens and following the permutation must reproduce
        closed polygons (the wireframe smoke-test, scripts/test_wireframe_loader.py)."""
        from pixelspointspolygons_tpu.data import P3Dataset
        from pixelspointspolygons_tpu.models.pix2poly import Tokenizer

        tok = Tokenizer(synth_cfg)
        ds = P3Dataset(synth_cfg, "val", tokenizer=tok)
        item = ds.get_item(1, np.random.RandomState(0))
        coords = tok.decode(item["y"])
        n = len(coords)
        if n == 0:
            pytest.skip("empty tile")
        perm = item["y_perm"][:n, :n]
        succ = perm.argmax(1)
        # every real vertex participates in a cycle that returns to it
        seen = set()
        for start in range(n):
            cur, steps = start, 0
            while steps <= n:
                cur = int(succ[cur])
                steps += 1
                if cur == start:
                    break
            assert cur == start, "vertex not on a closed cycle"
            seen.add(start)

    def test_hisup_items(self, synth_cfg):
        from pixelspointspolygons_tpu.config import compose as compose2
        from pixelspointspolygons_tpu.data import P3Dataset

        cfg = compose2(
            [
                "experiment=debug",
                "model=hisup",
                "run_type=debug",
                "run_type.train_subset=null",
                "experiment.encoder.max_num_points=4000",
            ]
        )
        ds = P3Dataset(cfg, "train")
        item = ds.get_item(0, np.random.RandomState(0))
        assert item["mask"].shape == (224, 224)
        jv = item["junc_valid"]
        assert jv.sum() > 0
        assert set(np.unique(item["junc_tags"][jv])) <= {1, 2}
        ev = item["edges_valid"]
        assert ev.sum() == jv.sum()  # one edge per vertex in closed rings

    def test_hisup_capacity_cap_warns(self, synth_cfg, caplog):
        """Dense tiles exceeding model.max_junctions must warn loudly instead
        of silently corrupting training targets (VERDICT r2 weak #10; the caps
        are plumbed from config/model/hisup.yaml)."""
        import logging

        from pixelspointspolygons_tpu.config import compose as compose2
        from pixelspointspolygons_tpu.data import P3Dataset

        cfg = compose2(
            [
                "experiment=debug",
                "model=hisup",
                "run_type=debug",
                "run_type.train_subset=null",
                "experiment.encoder.max_num_points=4000",
                "experiment.model.max_junctions=6",
                "experiment.model.max_edges=6",
            ]
        )
        ds = P3Dataset(cfg, "train")
        ds.logger.propagate = True  # make_logger detaches from root; let caplog see it
        with caplog.at_level(logging.WARNING):
            item = ds.get_item(0, np.random.RandomState(0))
        assert item["junc_valid"].sum() <= 6
        assert any("truncated" in r.message for r in caplog.records)

    def test_ffl_items(self, synth_cfg):
        from pixelspointspolygons_tpu.config import compose as compose2
        from pixelspointspolygons_tpu.data import P3Dataset

        cfg = compose2(
            [
                "experiment=debug",
                "model=ffl",
                "run_type=debug",
                "run_type.train_subset=null",
                "experiment.encoder.max_num_points=4000",
            ]
        )
        ds = P3Dataset(cfg, "train")
        item = ds.get_item(0, np.random.RandomState(0))
        assert item["gt_polygons_image"].shape == (3, 224, 224)
        assert 0.0 <= item["gt_polygons_image"].min() and item["gt_polygons_image"].max() <= 1.0
        ang = item["gt_crossfield_angle"]
        assert ang.shape == (1, 224, 224)
        assert 0 <= ang.min() and ang.max() <= np.pi + 1e-6
        assert item["class_freq"].shape == (2,)

    def test_loader_padding(self, synth_cfg):
        from pixelspointspolygons_tpu.data import Loader, P3Dataset
        from pixelspointspolygons_tpu.models.pix2poly import Tokenizer

        tok = Tokenizer(synth_cfg)
        ds = P3Dataset(synth_cfg, "val", tokenizer=tok)  # 3 items
        loader = Loader(ds, batch_size=2, shuffle=False)
        batches = list(loader)
        assert len(batches) == 2
        assert batches[0]["sample_valid"].all()
        assert batches[1]["images"].shape[0] == 2  # padded
        assert batches[1]["sample_valid"].tolist() == [True, False]

    def test_loader_epoch_shuffle_deterministic(self, synth_cfg):
        from pixelspointspolygons_tpu.data import Loader, P3Dataset
        from pixelspointspolygons_tpu.models.pix2poly import Tokenizer

        tok = Tokenizer(synth_cfg)
        ds = P3Dataset(synth_cfg, "train", tokenizer=tok)
        lo = Loader(ds, batch_size=3, shuffle=True, seed=7)
        lo.set_epoch(1)
        a = [b["image_id"].tolist() for b in lo]
        lo2 = Loader(ds, batch_size=3, shuffle=True, seed=7)
        lo2.set_epoch(1)
        b = [bb["image_id"].tolist() for bb in lo2]
        assert a == b
        lo2.set_epoch(2)
        c = [bb["image_id"].tolist() for bb in lo2]
        assert a != c

    def test_loader_with_workers(self, synth_cfg):
        from pixelspointspolygons_tpu.data import Loader, P3Dataset
        from pixelspointspolygons_tpu.models.pix2poly import Tokenizer

        tok = Tokenizer(synth_cfg)
        ds = P3Dataset(synth_cfg, "train", tokenizer=tok)
        seq = [b["image_id"].tolist() for b in Loader(ds, batch_size=3, shuffle=True, seed=3)]
        par = [b["image_id"].tolist() for b in Loader(ds, batch_size=3, shuffle=True, seed=3, num_workers=3)]
        assert seq == par  # threading must not change order or content


class TestRunLogger:
    def test_jsonl_backend(self, synth_cfg, tmp_path):
        import json

        from pixelspointspolygons_tpu.utils.experiment_log import RunLogger

        synth_cfg.output_dir = str(tmp_path)
        logger = RunLogger(synth_cfg, enabled=True)
        logger.log({"loss": 1.5, "iou": 0.3}, step=2)
        logger.finish()
        path = tmp_path / "runs" / f"{synth_cfg.experiment.name}.jsonl"
        lines = [json.loads(l) for l in open(path)]
        assert lines[0]["_type"] == "config"
        assert lines[1]["loss"] == 1.5 and lines[1]["step"] == 2


class TestColorJitterHSV:
    def test_saturation_zero_is_grayscale(self):
        import pixelspointspolygons_tpu.data.augment as aug

        rng = np.random.RandomState(0)
        img = rng.rand(8, 8, 3).astype(np.float32)
        params = {"d4": "e", "jitter": {"brightness": 1.0, "contrast": 1.0,
                                        "saturation": 0.0, "hue": 0.0}}
        out = aug.apply_image(img, params, [0, 0, 0], [1, 1, 1], 1.0)
        assert np.allclose(out[..., 0], out[..., 1], atol=1e-5)
        assert np.allclose(out[..., 1], out[..., 2], atol=1e-5)

    def test_hue_full_circle_identity(self):
        import pixelspointspolygons_tpu.data.augment as aug

        rng = np.random.RandomState(1)
        img = (rng.rand(8, 8, 3) * 0.8 + 0.1).astype(np.float32)
        base = {"d4": "e", "jitter": {"brightness": 1.0, "contrast": 1.0,
                                      "saturation": 1.0, "hue": 0.0}}
        full = {"d4": "e", "jitter": {"brightness": 1.0, "contrast": 1.0,
                                      "saturation": 1.0, "hue": 1.0}}
        a = aug.apply_image(img, base, [0, 0, 0], [1, 1, 1], 1.0)
        b = aug.apply_image(img, full, [0, 0, 0], [1, 1, 1], 1.0)
        np.testing.assert_allclose(a, b, atol=1e-3)

    def test_hue_shift_changes_channels(self):
        import pixelspointspolygons_tpu.data.augment as aug

        img = np.zeros((4, 4, 3), np.float32)
        img[..., 0] = 0.8  # pure red
        params = {"d4": "e", "jitter": {"brightness": 1.0, "contrast": 1.0,
                                        "saturation": 1.0, "hue": 1 / 3}}
        out = aug.apply_image(img, params, [0, 0, 0], [1, 1, 1], 1.0)
        # red shifted by 120° → green
        assert out[..., 1].mean() > 0.7 and out[..., 0].mean() < 0.1


class TestConverters:
    def test_mask_to_polygons_with_hole(self):
        import importlib.util as ilu

        spec = ilu.spec_from_file_location(
            "inria_to_coco", "data_preprocess/inria_to_coco.py"
        )
        mod = ilu.module_from_spec(spec)
        spec.loader.exec_module(mod)
        mask = np.zeros((64, 64), np.uint8)
        mask[10:50, 10:50] = 1
        mask[25:35, 25:35] = 0  # hole
        mask[5:20, 55:64] = 1  # building touching the border
        polys = mod.mask_to_polygons(mask, tol=1.0)
        assert len(polys) == 2
        n_rings = sorted(len(p) for p in polys)
        assert n_rings == [1, 2]  # one simple, one with a hole
        bboxes = [mod.poly_bbox_area(p)[0] for p in polys]
        assert any(b[0] + b[2] > 62 for b in bboxes)  # border building kept

    def test_merge_coco_annotations(self, tmp_path):
        import importlib.util as ilu

        spec = ilu.spec_from_file_location(
            "merge_coco", "data_preprocess/merge_coco_annotations.py"
        )
        mod = ilu.module_from_spec(spec)
        spec.loader.exec_module(mod)
        base = {
            "categories": [{"id": 100, "name": "building"}],
            "images": [{"id": 0, "file_name": "a.png", "width": 8, "height": 8}],
            "annotations": [
                {"id": 0, "image_id": 0, "category_id": 100, "segmentation": [[0, 0, 1, 0, 1, 1]]}
            ],
        }
        f1 = tmp_path / "a.json"
        f2 = tmp_path / "b.json"
        f1.write_text(json.dumps(base))
        f2.write_text(json.dumps(base))
        merged = mod.merge_coco_annotations([str(f1), str(f2)])
        assert len(merged["images"]) == 2
        assert len({i["id"] for i in merged["images"]}) == 2
        assert len({a["id"] for a in merged["annotations"]}) == 2
        assert merged["annotations"][1]["image_id"] == merged["images"][1]["id"]


class TestLoaderProcessSharding:
    def _dataset(self, n=10):
        class FakeDS:
            def __len__(self):
                return n

            def get_item(self, i, rng):
                return {"x": np.float32(i), "image_id": np.int64(i)}

        return FakeDS()

    def test_disjoint_cover(self):
        from pixelspointspolygons_tpu.data.loader import Loader

        seen = []
        for rank in range(3):
            loader = Loader(
                self._dataset(10), batch_size=2, shuffle=True, seed=7,
                process_index=rank, process_count=3,
            )
            loader.set_epoch(1)
            ids = [int(v) for b in loader for v in b["image_id"][b["sample_valid"]]]
            seen.append(ids)
        lens = [len(s) for s in seen]
        assert len(set(lens)) == 1  # equal per-process counts (wrap-padded)
        flat = [i for s in seen for i in s]
        assert set(flat) == set(range(10))  # full cover
        # disjoint except the wrap-pad duplicates (12 slots for 10 items)
        assert len(flat) == 12

    def test_single_process_unchanged(self):
        from pixelspointspolygons_tpu.data.loader import Loader

        loader = Loader(self._dataset(5), batch_size=2, process_index=0, process_count=1)
        ids = [int(v) for b in loader for v in b["image_id"][b["sample_valid"]]]
        assert ids == [0, 1, 2, 3, 4]


class TestSyntheticLidarGeoreference:
    """Regression: the synthetic generator once stamped pixel-coord lidar npz
    with top_left=[0, size]; the loader's reference world->pixel conversion
    (dataset.py _lidar, p3_coco.py:82-84) then collapsed every point to
    row==height — lidar carried zero y-signal.  Pin that points flowing
    through P3Dataset land on the GT footprints (z-thresholded points must
    overlap the building masks)."""

    def test_lidar_points_align_with_gt(self, tmp_path_factory):
        import scipy.ndimage as ndi

        from pixelspointspolygons_tpu.config import compose
        from pixelspointspolygons_tpu.data.dataset import P3Dataset
        from pixelspointspolygons_tpu.data.synthetic import ensure_synthetic_dataset
        from pixelspointspolygons_tpu.models.pix2poly import Tokenizer
        from pixelspointspolygons_tpu.utils.coco import seg_to_mask

        root = tmp_path_factory.mktemp("lidar_geo")
        os.environ["P3_DATASET_ROOT"] = str(root / "data")
        os.environ["P3_MODEL_ROOT"] = str(root / "out")
        try:
            cfg = compose(
                [
                    "experiment=p2p_lidar",
                    "dataset=synthetic",
                    "run_type=debug",
                    "experiment.dataset.num_train=2",
                    "experiment.dataset.num_val=3",
                    "experiment.dataset.num_test=2",
                ]
            )
            ensure_synthetic_dataset(cfg)
            ds = P3Dataset(cfg, "val", tokenizer=Tokenizer(cfg))
            for idx in range(len(ds)):
                item = ds[idx]
                pts = np.asarray(item["lidar"])
                msk = np.asarray(item["lidar_mask"]).astype(bool)
                v = pts[msk]
                info = ds.coco.imgs[ds.tile_ids[idx]]
                H, W = info["height"], info["width"]
                gt = np.zeros((H, W), bool)
                for a in ds.coco.imgToAnns[info["id"]]:
                    gt |= seg_to_mask(a["segmentation"], H, W).astype(bool)
                if not gt.any():
                    continue
                # x and y must both spread over the tile, not collapse
                assert np.ptp(v[:, 0]) > W / 2 and np.ptp(v[:, 1]) > H / 2
                xi = np.clip(v[:, 0].astype(int), 0, W - 1)
                yi = np.clip(v[:, 1].astype(int), 0, H - 1)
                pd = np.zeros((H, W), bool)
                pd[yi[v[:, 2] > 25.0], xi[v[:, 2] > 25.0]] = True  # z in [0,100]
                pd = ndi.binary_closing(pd, np.ones((5, 5)))
                inter = (gt & pd).sum()
                union = (gt | pd).sum()
                assert inter / union > 0.8, (
                    f"tile {idx}: z-thresholded lidar IoU vs GT {inter/union:.3f}"
                )
        finally:
            os.environ.pop("P3_DATASET_ROOT", None)
            os.environ.pop("P3_MODEL_ROOT", None)

    def test_world_to_pixel_conversion_reference_parity(self, tmp_path):
        """The loader formula itself (col=(x-tlx)/res, row=H-(y-tly)/res) on a
        hand-built world-coord npz: a point at the tile's top-left corner maps
        to row 0, bottom-left to row H."""
        from pixelspointspolygons_tpu.data import dataset as dmod

        pts = np.array(
            [[500.0, 1000.0, 3.0],  # top-left corner (y_world max)
             [500.0, 944.0, 9.0]],  # bottom-left corner (y_world min)
            np.float32,
        )
        np.savez(tmp_path / "t.npz", points=pts)
        info = {
            "lidar_path": "t.npz",
            "top_left": [500.0, 944.0],
            "res_x": 0.25,
            "height": 224,
            "width": 224,
        }

        class Stub:
            dataset_dir = str(tmp_path)
            use_lidar = True
            z_range = 100.0

        out = dmod.P3Dataset._lidar(Stub(), info)
        np.testing.assert_allclose(out[0, :2], [0.0, 0.0], atol=1e-4)
        np.testing.assert_allclose(out[1, :2], [0.0, 224.0], atol=1e-4)
