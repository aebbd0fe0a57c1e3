"""Native geometry kernel tests: marching squares subpixel accuracy against
analytic level sets, chaining into closed rings, DP equivalence with the
python implementation."""

import numpy as np
import pytest

from pixelspointspolygons_tpu import native
from pixelspointspolygons_tpu.predict.ffl_polygonize import douglas_peucker

pytestmark = pytest.mark.skipif(not native.available(), reason="no g++ available")


class TestMarchingSquares:
    def test_square_ring_subpixel(self):
        img = np.zeros((32, 32), np.float32)
        img[10:20, 12:22] = 1.0
        out = native.find_contours(img, 0.5)
        closed = [r for r, c in out if c]
        assert len(closed) == 1
        ring = closed[0]
        # level-0.5 crossings sit exactly halfway between 0 and 1 pixels
        assert ring[:, 0].min() == pytest.approx(9.5)
        assert ring[:, 0].max() == pytest.approx(19.5)
        assert ring[:, 1].min() == pytest.approx(11.5)
        assert ring[:, 1].max() == pytest.approx(21.5)
        # closed ring repeats first point
        np.testing.assert_allclose(ring[0], ring[-1])

    def test_subpixel_interpolation(self):
        # linear ramp in x: level 0.25 crossing sits at x = 10 + 0.25 within
        # the cell where values go 0 → 1
        img = np.zeros((8, 24), np.float32)
        img[:, 11:] = 1.0
        img[:, 10] = 0.0
        out = native.find_contours(img, 0.25)
        allpts = np.concatenate([r for r, _ in out])
        xs = allpts[:, 1]
        np.testing.assert_allclose(xs, 10.25, atol=1e-6)

    def test_two_blobs(self):
        img = np.zeros((40, 40), np.float32)
        img[5:15, 5:15] = 1.0
        img[25:35, 25:35] = 1.0
        out = native.find_contours(img, 0.5)
        closed = [r for r, c in out if c]
        assert len(closed) == 2

    def test_open_contour_at_border(self):
        img = np.zeros((10, 10), np.float32)
        img[:, :5] = 1.0  # high half touching 3 borders
        out = native.find_contours(img, 0.5)
        assert len(out) == 1
        ring, closed = out[0]
        assert not closed
        np.testing.assert_allclose(ring[:, 1], 4.5, atol=1e-6)

    def test_circle_area(self):
        yy, xx = np.mgrid[0:64, 0:64]
        img = ((yy - 32.0) ** 2 + (xx - 32.0) ** 2 < 15**2).astype(np.float32)
        out = native.find_contours(img, 0.5)
        closed = [r for r, c in out if c]
        assert len(closed) == 1
        ring = closed[0][:-1]
        y, x = ring[:, 0], ring[:, 1]
        area = 0.5 * abs(np.dot(x, np.roll(y, -1)) - np.dot(y, np.roll(x, -1)))
        assert area == pytest.approx(np.pi * 15**2, rel=0.05)


class TestNativeDP:
    def test_matches_python(self, rng):
        pts = np.cumsum(rng.randn(200, 2), axis=0)
        a = native.douglas_peucker_native(pts, 1.5)
        b = douglas_peucker(pts, 1.5)
        np.testing.assert_allclose(a, b)
