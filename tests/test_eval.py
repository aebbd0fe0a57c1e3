"""Evaluation battery tests: COCOEval on constructed cases with known AP,
IoU/C-IoU conventions (empty-empty = 1), POLIS/Chamfer/Hausdorff on exact
geometric fixtures, MTA on aligned vs rotated polygons."""

import json

import numpy as np
import pytest

from pixelspointspolygons_tpu.eval import (
    COCOEval,
    calc_iou,
    compute_iou_ciou,
    compute_mta,
    compute_point_metrics,
)
from pixelspointspolygons_tpu.utils.coco import CocoIndex, generate_coco_ann


def make_gt(polys_per_img: dict[int, list], size: int = 64) -> CocoIndex:
    images = [
        {"id": i, "width": size, "height": size, "file_name": f"{i}.png"}
        for i in polys_per_img
    ]
    anns = []
    aid = 1
    for img_id, polys in polys_per_img.items():
        for a in generate_coco_ann(polys, img_id):
            a["id"] = aid
            a["iscrowd"] = 0
            aid += 1
            anns.append(a)
    return CocoIndex(
        {"images": images, "annotations": anns, "categories": [{"id": 100, "name": "b"}]}
    )


SQ1 = np.array([[8.0, 8.0], [24.0, 8.0], [24.0, 24.0], [8.0, 24.0]])
SQ2 = np.array([[40.0, 40.0], [56.0, 40.0], [56.0, 56.0], [40.0, 56.0]])


class TestCocoEval:
    def test_perfect_predictions(self):
        gt = make_gt({1: [SQ1, SQ2], 2: [SQ1]})
        dt = gt.load_res(generate_coco_ann([SQ1, SQ2], 1) + generate_coco_ann([SQ1], 2))
        stats = COCOEval(gt, dt).run()
        assert stats["AP"] == pytest.approx(1.0)
        assert stats["AP50"] == pytest.approx(1.0)
        assert stats["AR100"] == pytest.approx(1.0)

    def test_half_recall(self):
        gt = make_gt({1: [SQ1, SQ2]})
        dt = gt.load_res(generate_coco_ann([SQ1], 1))
        stats = COCOEval(gt, dt).run()
        # one of two GTs found at precision 1 → AP ≈ 0.5 (101-pt grid)
        assert stats["AP"] == pytest.approx(0.505, abs=0.01)
        assert stats["AR100"] == pytest.approx(0.5)

    def test_no_predictions(self):
        gt = make_gt({1: [SQ1]})
        dt = gt.load_res([])
        stats = COCOEval(gt, dt).run()
        assert stats["AP"] == pytest.approx(0.0)

    def test_small_area_bucket(self):
        tiny = np.array([[2.0, 2.0], [10.0, 2.0], [10.0, 10.0], [2.0, 10.0]])  # area 64 < 32²
        gt = make_gt({1: [tiny]})
        dt = gt.load_res(generate_coco_ann([tiny], 1))
        stats = COCOEval(gt, dt).run()
        assert stats["AP_small"] == pytest.approx(1.0)
        assert stats["AP_medium"] == -1.0  # no medium GT → undefined


class TestIoU:
    def test_both_empty_is_one(self):
        assert calc_iou(np.zeros((4, 4), bool), np.zeros((4, 4), bool)) == 1.0

    def test_perfect(self):
        gt = make_gt({1: [SQ1]})
        dt = gt.load_res(generate_coco_ann([SQ1], 1))
        r = compute_iou_ciou(gt, dt)
        assert r["IoU"] == pytest.approx(1.0, abs=1e-6)
        assert r["C-IoU"] == pytest.approx(1.0, abs=1e-6)
        assert r["NR"] == pytest.approx(1.0, abs=1e-6)

    def test_vertex_count_penalty(self):
        gt = make_gt({1: [SQ1]})
        # same shape but 8 vertices (split edges) → same IoU, lower NR
        dense = np.array(
            [[8, 8], [16, 8], [24, 8], [24, 16], [24, 24], [16, 24], [8, 24], [8, 16]],
            float,
        )
        dt = gt.load_res(generate_coco_ann([dense], 1))
        r = compute_iou_ciou(gt, dt)
        assert r["IoU"] == pytest.approx(1.0, abs=1e-6)
        assert r["NR"] == pytest.approx(1 - 4 / 12, abs=1e-6)
        assert r["C-IoU"] < r["IoU"]


class TestPointMetrics:
    def test_identical_polygons(self):
        gt = make_gt({1: [SQ1]})
        dt = gt.load_res(generate_coco_ann([SQ1], 1))
        r = compute_point_metrics(gt, dt)
        assert r["polis"] == pytest.approx(0.0, abs=1e-9)
        assert r["hausdorff"] == pytest.approx(0.0, abs=1e-9)
        assert r["num_matched_images"] == 1

    def test_shifted_square(self):
        gt = make_gt({1: [SQ1]})
        shifted = SQ1 + np.array([2.0, 0.0])
        dt = gt.load_res(generate_coco_ann([shifted], 1))
        r = compute_point_metrics(gt, dt)
        # 2px right shift of the 16px square SQ1 (x∈[8,24],y∈[8,24] → dt
        # x∈[10,26]): two vertices on each side sit 2px from the other ring,
        # two lie exactly on it. Reference normalization: per side
        # Σdist/(2·(4+1)) = 4/10 = 0.4; POLIS = 0.4 + 0.4.
        assert r["polis"] == pytest.approx(0.8, abs=1e-6)
        # chamfer/hausdorff are PIXEL units in the reference's
        # PointBasedMetrics (no resolution scaling)
        assert r["hausdorff"] == pytest.approx(2.0, abs=1e-6)

    def test_no_exclusion_and_per_image_averaging(self):
        # Reference protocol: each gt matches its argmax dt WITHOUT exclusion
        # (polis_chamfer_hausdorff.py:168-177) — one dt can serve two gts —
        # and images with zero matches are skipped, not averaged as zero.
        sq_far = SQ1 + np.array([100.0, 0.0])
        gt = make_gt({1: [SQ1, SQ1 + np.array([1.0, 0.0])], 2: [sq_far]})
        # img 1: single dt overlapping both gts; img 2: dt far from gt (no match)
        dt_anns = generate_coco_ann([SQ1], 1) + generate_coco_ann([sq_far + 50.0], 2)
        dt = gt.load_res(dt_anns)
        r = compute_point_metrics(gt, dt)
        assert r["num_matched_images"] == 1  # img 2 skipped entirely
        # img 1: gt #1 exact (polis 0), gt #2 shifted by 1px (polis 0.4 by the
        # shifted-square arithmetic above); per-image mean = 0.2
        assert r["polis"] == pytest.approx(0.2, abs=1e-6)


class TestBoundaryCoco:
    """Boundary AP (reference `boundary-coco` mode, evaluator.py:121-141):
    IoU = min(mask IoU, boundary IoU), boundary = mask minus its erosion by
    round(0.02·diag) 3×3 iterations (6 px on a 224 canvas)."""

    BIG = np.array([[50.0, 50.0], [110.0, 50.0], [110.0, 110.0], [50.0, 110.0]])

    def _run(self, dx: float):
        gt = make_gt({1: [self.BIG]}, size=224)
        dt = gt.load_res(generate_coco_ann([self.BIG + np.array([dx, 0.0])], 1))
        return COCOEval(gt, dt).run(), COCOEval(gt, dt, iou_type="boundary").run()

    def test_identical_is_perfect(self):
        segm, bd = self._run(0.0)
        assert segm["AP"] == pytest.approx(1.0)
        assert bd["bAP"] == pytest.approx(1.0)

    def test_boundary_stricter_than_mask(self):
        # 8px shift of a 60px square: mask IoU 52/68 ≈ 0.76 keeps segm AP50
        # perfect, but the shift exceeds the 6px boundary band → boundary IoU
        # collapses and Boundary AP50 goes to zero.
        segm, bd = self._run(8.0)
        assert segm["AP50"] == pytest.approx(1.0)
        assert segm["AP"] == pytest.approx(0.6, abs=1e-6)
        assert bd["bAP50"] == pytest.approx(0.0)

    def test_band_width(self):
        from pixelspointspolygons_tpu.eval.cocoeval import mask_to_boundary

        m = np.zeros((224, 224), np.uint8)
        m[50:110, 50:110] = 1
        b = mask_to_boundary(m)
        # interior row: band is exactly round(0.02·√(2·224²)) = 6 px wide
        assert b[80, 50:60].tolist() == [1, 1, 1, 1, 1, 1, 0, 0, 0, 0]
        # fully eroded interior survives in the mask but not the boundary
        assert b[80, 80] == 0 and m[80, 80] == 1


class TestMTA:
    def test_identical_is_zero(self):
        gt = make_gt({1: [SQ1]})
        dt = gt.load_res(generate_coco_ann([SQ1], 1))
        r = compute_mta(gt, dt)
        assert r["mta"] == pytest.approx(0.0, abs=1e-6)

    def test_shifted_square_bounded(self):
        # a translated square's MTA is small-but-nonzero: samples straddling
        # corners project across the GT corner (inherent to the metric)
        gt = make_gt({1: [SQ1]})
        dt = gt.load_res(generate_coco_ann([SQ1 + 0.5], 1))
        r = compute_mta(gt, dt)
        assert 0.0 <= r["mta"] < 46.0

    def test_rotated_square_has_angle(self):
        gt = make_gt({1: [SQ1]})
        c = SQ1.mean(0)
        ang = np.deg2rad(10)
        R = np.array([[np.cos(ang), -np.sin(ang)], [np.sin(ang), np.cos(ang)]])
        rot = (SQ1 - c) @ R.T + c
        dt = gt.load_res(generate_coco_ann([rot], 1))
        r = compute_mta(gt, dt)
        assert 5.0 < r["mta"] < 46.0


class TestRLEAndCrowd:
    def test_compressed_rle_roundtrip(self):
        from pixelspointspolygons_tpu.utils.coco import rle_decode, rle_encode

        rng = np.random.RandomState(3)
        mask = (rng.rand(37, 23) > 0.7).astype(np.uint8)
        rle = rle_encode(mask, compressed=True)
        assert isinstance(rle["counts"], str)
        np.testing.assert_array_equal(rle_decode(rle), mask)

    def test_rle_string_delta_signs(self):
        """Delta coding goes negative when counts shrink — sign extension."""
        from pixelspointspolygons_tpu.utils.coco import (
            rle_string_decode,
            rle_string_encode,
        )

        for counts in ([0, 1000, 3, 2, 900, 1], [5], [0, 2**20, 7, 2, 1, 2**18]):
            assert rle_string_decode(rle_string_encode(counts)) == counts

    def test_crowd_region_not_fp(self):
        """A dt inside a crowd GT region is ignored (not an FP), and the crowd
        GT itself doesn't count toward recall (pycocotools semantics)."""
        from pixelspointspolygons_tpu.eval.cocoeval import COCOEval

        sq = [10, 10, 30, 10, 30, 30, 10, 30]
        crowd_zone = [40, 40, 62, 40, 62, 62, 40, 62]
        inside_crowd = [45, 45, 55, 45, 55, 55, 45, 55]
        gt = CocoIndex(
            {
                "images": [{"id": 1, "height": 64, "width": 64}],
                "categories": [{"id": 100, "name": "building"}],
                "annotations": [
                    {"id": 1, "image_id": 1, "category_id": 100,
                     "segmentation": [sq], "area": 400.0, "iscrowd": 0,
                     "bbox": [10, 10, 20, 20]},
                    {"id": 2, "image_id": 1, "category_id": 100,
                     "segmentation": [crowd_zone], "area": 484.0, "iscrowd": 1,
                     "bbox": [40, 40, 22, 22]},
                ],
            }
        )
        preds = [
            {"image_id": 1, "category_id": 100, "segmentation": [sq], "score": 0.9},
            {"image_id": 1, "category_id": 100, "segmentation": [inside_crowd], "score": 0.8},
        ]
        res = COCOEval(gt, gt.load_res(preds)).run()
        assert res["AP"] == 1.0 and res["AP50"] == 1.0
        # without crowd flag the second dt WOULD be an FP
        gt2 = CocoIndex(json.loads(json.dumps(gt.dataset)))
        gt2.dataset["annotations"][1]["iscrowd"] = 0
        gt2 = CocoIndex(gt2.dataset)
        res2 = COCOEval(gt2, gt2.load_res(preds)).run()
        assert res2["AP"] < 1.0


def test_ldof_shellout(tmp_path):
    """Drive the ldof plumbing end-to-end against a stub executable that
    emits the reference binary's output format (line_dof.py:81-96)."""
    import stat

    from pixelspointspolygons_tpu.eval.line_dof import compute_line_dof

    stub = tmp_path / "ldof"
    stub.write_text(
        "#!/bin/sh\n"
        'n=$(wc -l < "$2")\n'
        'echo "Number of degree of freedom is : $n"\n'
        'echo "Number segments is : $n"\n'
        'echo "Metric for DoF : 50.0"\n'
    )
    stub.chmod(stub.stat().st_mode | stat.S_IEXEC)

    sq = [0, 0, 10, 0, 10, 10, 0, 10]
    gt = CocoIndex(
        {
            "images": [{"id": 1, "height": 16, "width": 16}],
            "categories": [{"id": 100, "name": "building"}],
            "annotations": [
                {"id": 1, "image_id": 1, "category_id": 100,
                 "segmentation": [sq], "area": 100.0, "bbox": [0, 0, 10, 10]}
            ],
        }
    )
    dt = gt.load_res([{"image_id": 1, "category_id": 100, "segmentation": [sq], "score": 1.0}])
    res = compute_line_dof(str(stub), gt, dt)
    assert res["line_segs"] == 3.0  # 4-pt open ring → 3 segments
    assert res["norm_line_dofs"] == 0.5


def test_cocoeval_interpolated_ap_golden():
    """Hand-derived golden for the 101-pt interpolated AP protocol
    (pycocotools accumulate semantics): dts sorted by score give
    precision [1, 1/2, 1/3] at recall [1/2, 1/2, 1/2] → envelope puts
    precision 1 on the 51 recall grid points ≤ 0.5 → AP = 51/101."""
    from pixelspointspolygons_tpu.eval.cocoeval import COCOEval

    sq = [0, 0, 10, 0, 10, 10, 0, 10]
    far = [20, 20, 24, 20, 24, 24, 20, 24]
    shifted = [0, 7, 10, 7, 10, 17, 0, 17]  # IoU vs sq = 30/170 < 0.5
    gt = CocoIndex(
        {
            "images": [
                {"id": 1, "height": 32, "width": 32},
                {"id": 2, "height": 32, "width": 32},
            ],
            "categories": [{"id": 100, "name": "building"}],
            "annotations": [
                {"id": 1, "image_id": 1, "category_id": 100, "segmentation": [sq],
                 "area": 100.0, "bbox": [0, 0, 10, 10], "iscrowd": 0},
                {"id": 2, "image_id": 2, "category_id": 100, "segmentation": [sq],
                 "area": 100.0, "bbox": [0, 0, 10, 10], "iscrowd": 0},
            ],
        }
    )
    dt = gt.load_res(
        [
            {"image_id": 1, "category_id": 100, "segmentation": [sq], "score": 0.9},
            {"image_id": 1, "category_id": 100, "segmentation": [far], "score": 0.8},
            {"image_id": 2, "category_id": 100, "segmentation": [shifted], "score": 0.5},
        ]
    )
    res = COCOEval(gt, dt).run()
    want = 51 / 101
    assert abs(res["AP"] - want) < 1e-9, res["AP"]
    assert abs(res["AP50"] - want) < 1e-9
    assert abs(res["AR100"] - 0.5) < 1e-9


class TestCocoProtocolGoldens:
    """Hand-derived goldens for COCOeval protocol corners the 101-pt
    interpolation golden doesn't touch (VERDICT r2 next-step #6): score-order
    matching tie-breaks, area-range gt/dt ignores, maxDets, and crowd
    semantics. Each expected value is derived in-comment from the pycocotools
    evaluateImg/accumulate rules our COCOEval mirrors (cocoeval.py)."""

    def _eval(self, gt, dt_anns, scores):
        for a, s in zip(dt_anns, scores):
            a["score"] = s
        return COCOEval(gt, gt.load_res(dt_anns)).run()

    def test_score_order_tiebreak(self):
        # One gt (17x17 raster). dt_high (score .9) shifted 4px: raster IoU
        # 13/21 ≈ 0.619; dt_low (score .8) exact (IoU 1). Score order matches
        # dt_high first wherever its IoU clears the threshold:
        #  t ∈ {.50,.55,.60}: dt_high TP, dt_low FP after recall 1 → AP(t)=1
        #  t ∈ {.65..... .95}: dt_high FP, dt_low TP → pr=[0,.5] → AP(t)=0.5
        # AP = (3·1 + 7·0.5)/10 = 0.65
        gt = make_gt({1: [SQ1]})
        dts = generate_coco_ann([SQ1 + np.array([4.0, 0.0]), SQ1], 1)
        stats = self._eval(gt, dts, [0.9, 0.8])
        assert stats["AP50"] == pytest.approx(1.0)
        assert stats["AP75"] == pytest.approx(0.5)
        assert stats["AP"] == pytest.approx(0.65, abs=1e-6)

    def test_maxdets_one(self):
        # Two gts, two exact dts: AR@1 only considers the top-score det
        # → recall 1/2 at every threshold; AR@10/@100 see both → 1.0
        gt = make_gt({1: [SQ1, SQ2]})
        dts = generate_coco_ann([SQ1, SQ2], 1)
        stats = self._eval(gt, dts, [0.9, 0.8])
        assert stats["AR1"] == pytest.approx(0.5)
        assert stats["AR10"] == pytest.approx(1.0)
        assert stats["AP"] == pytest.approx(1.0)

    def test_area_range_partitions(self):
        # small gt (16px square, shoelace area 256 < 32²) + large gt (100px
        # square, area 10000 > 96²), both detected exactly. Per range, the
        # out-of-range gt is ignored and its matched dt ignored with it:
        # AP_small = AP_large = AP = 1; medium has no gt → -1 sentinel.
        big = np.array([[10.0, 40.0], [110.0, 40.0], [110.0, 140.0], [10.0, 140.0]])
        gt = make_gt({1: [SQ1, big]}, size=160)
        dts = generate_coco_ann([SQ1, big], 1)
        stats = self._eval(gt, dts, [0.9, 0.8])
        assert stats["AP_small"] == pytest.approx(1.0)
        assert stats["AP_large"] == pytest.approx(1.0)
        assert stats["AP_medium"] == -1.0
        assert stats["AP"] == pytest.approx(1.0)

    def test_crowd_absorbs_high_score_detection(self):
        # dt_B (score .95) covers a quarter of crowd region B: IoU vs crowd
        # uses the dt-area denominator → 1.0 → matched-to-ignored → dropped
        # from both TP and FP. dt_A exact on normal gt A. pr=[1] → AP=1.
        # Without iscrowd, B becomes a countable gt that is never detected
        # (dt_B IoU 0.25 is a leading FP): recall caps at 0.5 with precision
        # envelope 0.5 → AP = (51/101)·0.5 ≈ 0.2525 — the contrast case.
        crowd_region = np.array([[32.0, 32.0], [62.0, 32.0], [62.0, 62.0], [32.0, 62.0]])
        dt_in_crowd = np.array([[32.0, 32.0], [47.0, 32.0], [47.0, 47.0], [32.0, 47.0]])
        for iscrowd, want_ap in ((1, 1.0), (0, 51 / 101 * 0.5)):
            gt = make_gt({1: [SQ1, crowd_region]})
            gt.anns[2]["iscrowd"] = iscrowd
            gt.imgToAnns[1][1]["iscrowd"] = iscrowd
            dts = generate_coco_ann([dt_in_crowd, SQ1], 1)
            stats = self._eval(gt, dts, [0.95, 0.9])
            assert stats["AP"] == pytest.approx(want_ap), f"iscrowd={iscrowd}"

    def test_unmatched_out_of_range_dt_ignored_not_fp(self):
        # Spurious LARGE dt (score .9, no gt anywhere near) + exact small dt:
        # in the 'all' range the spurious det is a leading FP → AP=0.5; in
        # the 'small' range it is out-of-range-unmatched → ignored → AP_small=1.
        spurious = np.array([[40.0, 40.0], [150.0, 40.0], [150.0, 150.0], [40.0, 150.0]])
        gt = make_gt({1: [SQ1]}, size=160)
        dts = generate_coco_ann([spurious, SQ1], 1)
        stats = self._eval(gt, dts, [0.9, 0.8])
        assert stats["AP"] == pytest.approx(0.5)
        assert stats["AP_small"] == pytest.approx(1.0)
