"""ASM polygonizer tests: thinning on a thick ring, skeleton graph tracing,
face extraction from a square arrangement, full ASM on a synthetic square."""

import numpy as np
import cv2
import pytest

from pixelspointspolygons_tpu.config import compose
from pixelspointspolygons_tpu.predict import ffl_asm
from tests.test_ffl import axis_aligned_crossfield


class TestSkeleton:
    def test_thinning_ring(self):
        mask = np.zeros((40, 40), np.uint8)
        cv2.rectangle(mask, (10, 10), (30, 30), 1, thickness=3)
        skel = ffl_asm.zhang_suen_skeletonize(mask)
        assert 0 < skel.sum() < mask.sum()
        # skeleton is thin: no 2x2 block fully set
        blocks = skel[:-1, :-1] & skel[1:, :-1] & skel[:-1, 1:] & skel[1:, 1:]
        assert blocks.sum() == 0

    def test_paths_cover_ring_and_reassemble(self):
        # corner pixels of an 8-connected rectangle have degree > 2, so the
        # ring may split into several paths; the contract is that the traced
        # paths cover the ring and the face extractor reassembles one face
        mask = np.zeros((40, 40), np.uint8)
        cv2.rectangle(mask, (10, 10), (30, 30), 1, thickness=1)
        nodes, paths = ffl_asm.skeleton_to_paths(mask)
        assert len(paths) >= 1
        covered = {i for p in paths for i in p}
        assert len(covered) == len(nodes)
        faces = ffl_asm.faces_from_polylines([nodes[p] for p in paths])
        assert len(faces) >= 1
        assert max(ffl_asm.ring_area(f) for f in faces) == pytest.approx(400.0, rel=0.15)

    def test_paths_on_T_junction(self):
        mask = np.zeros((21, 21), np.uint8)
        mask[10, 2:19] = 1  # horizontal bar
        mask[2:10, 10] = 1  # vertical stem
        nodes, paths = ffl_asm.skeleton_to_paths(mask)
        assert len(paths) == 3  # three arms from the junction


class TestFaces:
    def test_square_faces(self):
        ring = np.array(
            [[10.0, 10.0], [10.0, 30.0], [30.0, 30.0], [30.0, 10.0], [10.0, 10.0]]
        )
        faces = ffl_asm.faces_from_polylines([ring])
        assert len(faces) == 1
        assert ffl_asm.ring_area(faces[0]) == pytest.approx(400.0, rel=0.05)

    def test_shared_wall_two_faces(self):
        # two squares sharing a wall: |__|__|
        a = np.array([[0.0, 0.0], [0.0, 10.0], [10.0, 10.0], [10.0, 0.0], [0.0, 0.0]])
        b = np.array([[0.0, 10.0], [0.0, 20.0], [10.0, 20.0], [10.0, 10.0], [0.0, 10.0]])
        faces = ffl_asm.faces_from_polylines([a, b])
        areas = sorted(ffl_asm.ring_area(f) for f in faces)
        assert len(faces) == 2
        assert areas == pytest.approx([100.0, 100.0], rel=0.05)


class TestASMEndToEnd:
    def test_recovers_square(self):
        H = W = 64
        seg = np.zeros((H, W), np.float32)
        seg[16:48, 16:48] = 1.0
        # sigma 1: a trained seg head saturates, giving sharp level transitions
        seg = cv2.GaussianBlur(seg, (5, 5), 1.0)
        cf = axis_aligned_crossfield(H, W)
        cfg = compose(["experiment=ffl_image", "run_type=debug"])
        out = ffl_asm.asm_polygonize(
            cfg.experiment.polygonization, seg[None, None], cf[None]
        )
        tol_key = next(iter(out))
        polys = out[tol_key][0]
        assert len(polys) == 1
        p = polys[0]
        assert 3 <= len(p) <= 12
        # polygon roughly covers the square
        assert 12 < p[:, 0].min() < 20 and 44 < p[:, 0].max() < 52
