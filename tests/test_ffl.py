"""FFL tests: model output ranges/shapes, loss stack on analytic fixtures
(perfect crossfield → ~zero align loss), epoch weight interpolation, ACM
polygonizer recovering a square from a synthetic seg+crossfield (the
reference's own manual fixture pattern, polygonize_acm.py:608-641), DP
simplification, corner detection on an axis-aligned field."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pixelspointspolygons_tpu.config import compose
from pixelspointspolygons_tpu.models.ffl import FFL, epoch_weight, make_ffl_loss
from pixelspointspolygons_tpu.ops.crossfield import uv_to_c0c2
from pixelspointspolygons_tpu.predict import ffl_polygonize as fp


def tiny_ffl():
    return FFL(
        encoder_cfg={
            "name": "vit_cnn",
            "img_size": 32,
            "patch_size": 8,
            "dim": 32,
            "depth": 1,
            "num_heads": 2,
            "out_size": 32,
        },
        dim=32,
        seg_channels=1,
        out_size=32,
    )


class TestModel:
    def test_output_ranges(self, key):
        model = tiny_ffl()
        batch = {"images": jnp.zeros((2, 32, 32, 3))}
        variables = model.init(key, batch)
        out = model.apply(variables, batch, train=False)
        seg = np.asarray(out["seg"])
        cf = np.asarray(out["crossfield"])
        assert seg.shape == (2, 1, 32, 32)
        assert cf.shape == (2, 4, 32, 32)
        assert 0 <= seg.min() and seg.max() <= 1
        assert -2 <= cf.min() and cf.max() <= 2


def axis_aligned_crossfield(H, W):
    """c0c2 for the axis-aligned frame field (u along i, v along j)."""
    u = np.full((H, W), 1.0 + 0j, np.complex64)  # direction (di=1, dj=0)
    v = np.full((H, W), 1j, np.complex64)
    c0, c2 = uv_to_c0c2(jnp.asarray(u), jnp.asarray(v))
    c0 = np.asarray(c0)
    c2 = np.asarray(c2)
    return np.stack([c0.real, c0.imag, c2.real, c2.imag]).astype(np.float32)


class TestLosses:
    def test_epoch_weight_interpolation(self):
        spec = [0, 0, 0.2]
        thr = [0, 5, 10]
        assert epoch_weight(spec, 0, thr) == 0
        assert epoch_weight(spec, 5, thr) == 0
        assert epoch_weight(spec, 7, thr) == pytest.approx(0.08)
        assert epoch_weight(spec, 10, thr) == pytest.approx(0.2)
        assert epoch_weight(spec, 50, thr) == pytest.approx(0.2)
        assert epoch_weight(1.0, 3, thr) == 1.0

    def test_align_loss_zero_on_perfect_field(self):
        cfg = compose(["experiment=ffl_image", "run_type=debug"])
        loss_fn, weights_for_epoch = make_ffl_loss(cfg)
        H = W = 16
        cf = axis_aligned_crossfield(H, W)[None]
        # GT angle = π/2 (tangent along j) lies on the axis-aligned field
        angle = np.full((1, 1, H, W), np.pi / 2, np.float32)
        gt_img = np.zeros((1, 3, H, W), np.float32)
        gt_img[:, 1] = 1.0  # everything is edge
        outputs = {
            "seg": jnp.asarray(np.full((1, 1, H, W), 0.5, np.float32)),
            "crossfield": jnp.asarray(cf),
        }
        batch = {
            "gt_polygons_image": jnp.asarray(gt_img),
            "gt_crossfield_angle": jnp.asarray(angle),
            "distances": jnp.ones((1, 1, H, W)),
            "sizes": jnp.ones((1, 1, H, W)),
            "class_freq": jnp.asarray([[0.9, 0.1]]),
        }
        weights = weights_for_epoch(0)
        total, losses = loss_fn(outputs, batch, weights)
        assert float(losses["crossfield_align"]) < 1e-4
        # a 45° field direction should NOT align
        angle_bad = np.full((1, 1, H, W), np.pi / 4, np.float32)
        batch["gt_crossfield_angle"] = jnp.asarray(angle_bad)
        _, losses_bad = loss_fn(outputs, batch, weights)
        assert float(losses_bad["crossfield_align"]) > 0.1


class TestPolygonizeACM:
    def test_recovers_square(self):
        """Seg = blurred square, crossfield = axis-aligned → ACM + corner
        split should recover ~4-corner polygon near the square's 0.5 level."""
        H = W = 64
        seg = np.zeros((H, W), np.float32)
        seg[16:48, 16:48] = 1.0
        import cv2

        seg = cv2.GaussianBlur(seg, (7, 7), 2.0)
        cf = axis_aligned_crossfield(H, W)
        cfg = compose(["experiment=ffl_image", "run_type=debug"])
        poly = fp.Polygonizer(cfg.experiment.polygonization, seg_threshold=0.5)
        result = poly(seg[None, None], cf[None])
        assert "acm" in result
        tol_key = next(iter(result["acm"]))
        polys = result["acm"][tol_key][0]
        assert len(polys) == 1
        p = polys[0]  # (V, 2) xy
        assert 3 <= len(p) <= 10
        # vertices near the square corners (15.5/47.5 boundary)
        assert 13 < p[:, 0].min() < 19 and 45 < p[:, 0].max() < 50

    def test_simple_method(self):
        H = W = 64
        seg = np.zeros((H, W), np.float32)
        seg[10:30, 20:50] = 1.0
        cf = axis_aligned_crossfield(H, W)
        cfg = compose(
            ["experiment=ffl_image", "run_type=debug", "experiment.polygonization.method=[simple]"]
        )
        poly = fp.Polygonizer(cfg.experiment.polygonization, seg_threshold=0.5)
        result = poly(seg[None, None], cf[None])
        polys = result["simple"]["tol_1.0"][0]
        assert len(polys) == 1
        assert len(polys[0]) >= 4

    def test_douglas_peucker(self):
        pts = np.array([[0, 0], [1, 0.01], [2, 0], [2, 2]], float)
        out = fp.douglas_peucker(pts, tol=0.1)
        assert len(out) == 3  # midpoint dropped

    def test_detect_corners_square(self):
        ring = np.array(
            [[10.0, 10.0], [10.0, 30.0], [30.0, 30.0], [30.0, 10.0]]
        )  # (y, x) square corners
        u = np.full((40, 40), 1.0 + 0j)
        v = np.full((40, 40), 1j)
        corners = fp.detect_corners(ring, u, v)
        assert corners.all()  # every vertex of the square is a corner


class TestBorderPolygons:
    def test_polygonize_with_border_splits_faces(self):
        """A vertical open polyline spanning top→bottom splits the tile into
        two faces (the reference's unary_union + polygonize_full,
        polygonize_acm.py:288-306)."""
        H = W = 41
        line = np.array([[0.0, 20.0], [40.0, 20.0]])  # (y, x)
        faces = fp.polygonize_with_border([line], H, W)
        areas = sorted(fp.ring_area(f) for f in faces)
        big = [a for a in areas if a > 1]
        assert len(big) == 2
        assert abs(sum(big) - 40 * 40) < 2.0

    def test_dangle_dropped(self):
        """An open polyline ending mid-image bounds no face."""
        H = W = 41
        dangle = np.array([[5.0, 5.0], [20.0, 20.0]])
        faces = fp.polygonize_with_border([dangle], H, W)
        # only the full-border face remains
        areas = [fp.ring_area(f) for f in faces]
        assert all(abs(a - 40 * 40) < 2.0 for a in areas)

    def test_acm_building_crossing_tile_edge(self):
        """A building crossing the right tile edge round-trips through
        ACM + border union (reference polygonize_acm.py:288-299; VERDICT
        round-1 missing item 3)."""
        H = W = 64
        seg = np.zeros((H, W), np.float32)
        seg[20:44, 40:64] = 1.0
        import cv2

        seg = cv2.GaussianBlur(seg, (7, 7), 2.0)
        seg[:, -1] = seg[:, -2]  # keep the level set open at the border
        cf = axis_aligned_crossfield(H, W)
        cfg = compose(["experiment=ffl_image", "run_type=debug"])
        poly = fp.Polygonizer(cfg.experiment.polygonization, seg_threshold=0.5)
        result = poly(seg[None, None], cf[None])
        tol_key = next(iter(result["acm"]))
        polys = result["acm"][tol_key][0]
        assert len(polys) == 1, [len(p) for p in polys]
        p = polys[0]  # (V, 2) (x, y)
        # the face must reach the border column
        assert p[:, 0].max() > 62.0
        area = fp.ring_area(p[:, ::-1])
        assert 350 < area < 650  # ~24x23.5 rectangle


class TestLossNormNormalization:
    """cfg-gated port of the reference norm-normalization (losses.py:21-69;
    the reference trains with normalize=False so default off, SURVEY §7.4)."""

    def test_norms_divide_terms(self):
        import jax.numpy as jnp

        from pixelspointspolygons_tpu.config import compose
        from pixelspointspolygons_tpu.models.ffl.losses import make_ffl_loss

        cfg = compose(
            ["experiment=ffl_image", "dataset=synthetic", "run_type=debug",
             "experiment.model.loss.multi.normalize=true"]
        )
        loss_fn, weights_for_epoch = make_ffl_loss(cfg)
        weights = {k: jnp.float32(v) for k, v in weights_for_epoch(0).items()}
        S, B = 16, 2
        r = np.random.RandomState(0)
        outputs = {
            "seg": jnp.asarray(r.rand(B, 1, S, S), jnp.float32),
            "crossfield": jnp.asarray(r.rand(B, 4, S, S) * 2 - 1, jnp.float32),
        }
        batch = {
            "gt_polygons_image": jnp.asarray((r.rand(B, 3, S, S) > 0.6), jnp.float32),
            "distances": jnp.asarray(r.rand(B, 1, S, S), jnp.float32),
            "sizes": jnp.asarray(np.clip(r.rand(B, 1, S, S), 0.1, 1), jnp.float32),
            "gt_crossfield_angle": jnp.asarray(r.rand(B, 1, S, S) * np.pi, jnp.float32),
            "class_freq": jnp.asarray(np.tile([[0.8, 0.2]], (B, 1)), jnp.float32),
        }
        total_nonorm, losses = loss_fn(outputs, batch, weights, None)
        norms = {k: jnp.float32(2.0) for k in losses}
        total_norm, losses2 = loss_fn(outputs, batch, weights, norms)
        # all norms = 2 → optimized total halves; reported raw losses unchanged
        np.testing.assert_allclose(float(total_norm), float(total_nonorm) / 2, rtol=1e-5)
        for k in losses:
            np.testing.assert_allclose(float(losses2[k]), float(losses[k]), rtol=1e-6)

    def test_tracker_running_mean(self):
        from pixelspointspolygons_tpu.models.ffl.losses import LossNormTracker

        t = LossNormTracker()
        t.update({"seg": 3.0})
        t.update({"seg": 5.0})
        # AverageMeter seeded with init_val=1: (1 + 3 + 5) / 3
        np.testing.assert_allclose(float(t.norms()["seg"]), 3.0)
