"""HiSup tests: on-device target encoding vs hand values, loss shapes,
tiny-model train step smoke, junction extraction NMS/topk semantics, host
polygonization on synthetic masks."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pixelspointspolygons_tpu.models.hisup import (
    HiSup,
    encode_targets,
    extract_junctions,
    hisup_losses,
)
from pixelspointspolygons_tpu.predict.hisup_polygon import (
    polygons_from_masks,
    simple_polygon,
)


def tiny_batch(size=32, B=2):
    juncs = np.zeros((B, 8, 2), np.float32)
    tags = np.zeros((B, 8), np.int32)
    valid = np.zeros((B, 8), bool)
    juncs[0, 0] = [5.25, 7.75]
    juncs[0, 1] = [20.0, 20.5]
    tags[0, :2] = [2, 1]
    valid[0, :2] = True
    edges = np.zeros((B, 8, 4), np.float32)
    evalid = np.zeros((B, 8), bool)
    edges[0, 0] = [5.25, 7.75, 20.0, 20.5]
    evalid[0, 0] = True
    mask = np.zeros((B, size, size), np.float32)
    mask[0, 5:20, 5:20] = 1
    return {
        "junctions": jnp.asarray(juncs),
        "junc_tags": jnp.asarray(tags),
        "junc_valid": jnp.asarray(valid),
        "edges": jnp.asarray(edges),
        "edges_valid": jnp.asarray(evalid),
        "mask": jnp.asarray(mask),
    }


class TestTargets:
    def test_encode_targets(self):
        t = encode_targets(tiny_batch(), 32)
        jloc = np.asarray(t["jloc"])
        assert jloc[0, 7, 5] == 2  # convex at (y=7, x=5)
        assert jloc[0, 20, 20] == 1
        assert jloc[1].sum() == 0
        joff = np.asarray(t["joff"])
        np.testing.assert_allclose(joff[0, 0, 7, 5], 5.25 - 5 - 0.5, atol=1e-6)
        np.testing.assert_allclose(joff[0, 1, 7, 5], 7.75 - 7 - 0.5, atol=1e-6)
        assert t["afmap"].shape == (2, 2, 32, 32)
        # sample-1 has no edges → zero afm
        assert np.asarray(t["afmap"])[1].sum() == 0

    def test_losses_finite(self, key):
        t = encode_targets(tiny_batch(), 32)
        outputs = {
            "jloc": jnp.zeros((2, 3, 32, 32)),
            "joff": jnp.zeros((2, 2, 32, 32)),
            "mask": jnp.zeros((2, 2, 32, 32)),
            "afm": jnp.zeros((2, 2, 32, 32)),
            "remask": jnp.zeros((2, 2, 32, 32)),
        }
        losses = hisup_losses(outputs, t)
        for k, v in losses.items():
            assert np.isfinite(float(v)), k


class TestModel:
    def test_forward_and_grad(self, key):
        model = HiSup(
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
            pred_size=32,
        )
        batch = {"images": jnp.zeros((2, 32, 32, 3))}
        variables = model.init(key, batch)
        out, _ = model.apply(variables, batch, train=True, mutable=["batch_stats"])
        assert out["jloc"].shape == (2, 3, 32, 32)
        assert out["remask"].shape == (2, 2, 32, 32)

        targets = encode_targets(tiny_batch(), 32)

        def loss_fn(params):
            o, _ = model.apply(
                {"params": params, "batch_stats": variables["batch_stats"]},
                batch,
                train=True,
                mutable=["batch_stats"],
            )
            return sum(hisup_losses(o, targets).values())

        g = jax.grad(loss_fn)(variables["params"])
        flat = jax.tree_util.tree_leaves(g)
        assert all(np.isfinite(np.asarray(x)).all() for x in flat)

    def test_hrnet_encoder(self, key):
        model = HiSup(
            encoder_cfg={
                "name": "hrnet", "in_size": 32, "width": 8, "stage1_planes": 8,
                "stage1_blocks": 1, "num_blocks": 1, "num_modules": (1, 1, 1),
            },
            dim=32,
            pred_size=32,
        )
        batch = {"images": jnp.zeros((1, 32, 32, 3))}
        variables = model.init(key, batch)
        out = model.apply(variables, batch, train=False)
        assert out["mask"].shape == (1, 2, 32, 32)


class TestJunctionExtraction:
    def test_peak_found_with_offset(self):
        jloc = np.zeros((1, 3, 16, 16), np.float32)
        jloc[0, 2, 5, 9] = 5.0  # convex logit peak at (y=5, x=9)
        joff = np.zeros((1, 2, 16, 16), np.float32)
        joff[0, 0, 5, 9] = 0.25
        joff[0, 1, 5, 9] = -0.25
        sm = jax.nn.softmax(jnp.asarray(jloc), axis=1)
        pts, scores = extract_junctions(sm, jnp.asarray(joff), topk=4)
        pts = np.asarray(pts[0])
        scores = np.asarray(scores[0])
        best = pts[np.argmax(scores)]
        np.testing.assert_allclose(best, [9 + 0.25 + 0.5, 5 - 0.25 + 0.5], atol=1e-5)


class TestHostPolygonization:
    def test_square_mask(self):
        mask = np.zeros((64, 64), np.float32)
        mask[10:30, 10:30] = 0.9
        polys, scores = polygons_from_masks(mask, np.zeros((0, 2)))
        assert len(polys) == 1
        p = polys[0]
        # traced boundary simplifies to ~4 corners of the pixel square
        assert 4 <= len(p) <= 8
        assert scores[0] == pytest.approx(0.9, abs=1e-5)
        assert p[:, 0].min() >= 9 and p[:, 0].max() <= 31

    def test_junction_snapping(self):
        mask = np.zeros((64, 64), np.float32)
        mask[10:30, 10:30] = 1.0
        juncs = np.array(
            [[10.6, 10.4], [29.5, 10.5], [29.5, 29.5], [10.5, 29.5]], np.float64
        )
        polys, _ = polygons_from_masks(mask, juncs)
        assert len(polys) == 1
        # snapped exactly to the provided junctions
        for j in juncs:
            assert (np.abs(polys[0] - j).sum(1) < 1e-9).any()

    def test_simple_polygon_collinear(self):
        poly = np.array([[0, 0], [5, 0], [10, 0], [10, 10], [0, 10], [0, 0]], float)
        out = simple_polygon(poly)
        assert len(out) - 1 == 4  # collinear (5,0) dropped


class TestPolygonizationMirrorIdentity:
    """The vectorized, bbox-cropped production tracing must be
    OUTPUT-IDENTICAL to the full-tile loop-per-point reference mirror (the
    mirror is also bench_baselines' same-chip probe baseline, so this test is
    what makes that probe honest)."""

    def _random_blob_mask(self, seed, H=96, W=96, n_blobs=6):
        import cv2

        rng = np.random.RandomState(seed)
        m = np.zeros((H, W), np.float32)
        for _ in range(n_blobs):
            x, y = rng.randint(5, W - 20), rng.randint(5, H - 20)
            w, h = rng.randint(4, 18), rng.randint(4, 18)
            m[y : y + h, x : x + w] = rng.uniform(0.6, 1.0)
            if rng.rand() < 0.5:  # rotated blob → diagonal staircase edges
                c = ((x + w / 2), (y + h / 2))
                rot = cv2.getRotationMatrix2D(c, rng.uniform(10, 80), 1.0)
                m = cv2.warpAffine(m, rot, (W, H))
        if rng.rand() < 0.5:  # punch holes
            m[
                H // 3 : H // 3 + rng.randint(8, 12),
                W // 3 : W // 3 + rng.randint(8, 12),
            ] = 0.0
        return m

    @pytest.mark.parametrize("seed", [0, 1, 2, 3, 4])
    def test_identical_outputs(self, seed):
        rng = np.random.RandomState(1000 + seed)
        mask = self._random_blob_mask(seed)
        juncs = rng.uniform(0, 96, size=(30, 2))
        fast_p, fast_s = polygons_from_masks(mask, juncs)
        ref_p, ref_s = polygons_from_masks(mask, juncs, reference_mirror=True)
        assert len(fast_p) == len(ref_p)
        np.testing.assert_allclose(fast_s, ref_s, atol=0)
        for a, b in zip(fast_p, ref_p):
            np.testing.assert_array_equal(a, b)

    def test_diagonal_to_square_identity(self):
        # all 8 unit steps incl. the 4 diagonal cases
        ring = np.array(
            [[5, 5], [6, 6], [7, 6], [8, 5], [8, 4], [7, 3], [6, 3], [5, 4], [5, 5]],
            np.int64,
        )
        from pixelspointspolygons_tpu.predict.hisup_polygon import (
            diagonal_to_square,
            diagonal_to_square_loop,
        )

        np.testing.assert_array_equal(
            diagonal_to_square(ring), diagonal_to_square_loop(ring)
        )


class TestPredictDoubleBuffering:
    """predict_dataset keeps exactly one forward in flight: batch k+1 is
    dispatched BEFORE batch k's host stage runs, and results stay in loader
    order (the overlap must never reorder or drop tiles)."""

    def test_dispatch_overlaps_consume(self, tmp_path, monkeypatch):
        import os

        os.environ["P3_DATASET_ROOT"] = str(tmp_path / "data")
        os.environ["P3_MODEL_ROOT"] = str(tmp_path / "out")
        from pixelspointspolygons_tpu.config import compose
        from pixelspointspolygons_tpu.predict import predictor_hisup as mod

        cfg = compose(
            [
                "experiment=hisup_image",
                "dataset=synthetic",
                "run_type=debug",
                "experiment.encoder.in_size=32",
                "experiment.model.decoder.in_feature_size=32",
                "experiment.model.decoder.in_feature_dim=64",
                "experiment.encoder.patch_feature_dim=96",
            ]
        )
        cfg.evaluation.pred_file = str(tmp_path / "pred.json")

        predictor = mod.HiSupPredictor(cfg)
        events = []

        batches = [
            {"images": np.zeros((2, 32, 32, 3), np.float32),
             "sample_valid": np.array([True, True]),
             "image_id": np.array([2 * k, 2 * k + 1])}
            for k in range(3)
        ]
        ring = np.array([[1.0, 1.0], [5.0, 1.0], [5.0, 5.0], [1.0, 5.0]])

        monkeypatch.setattr(predictor, "load_checkpoint", lambda: {"params": {}})
        monkeypatch.setattr(mod, "replicate", lambda v, mesh: v)
        monkeypatch.setattr(mod, "shard_batch", lambda b, mesh: b)
        monkeypatch.setattr(
            mod, "build_loader", lambda cfg, split, eval_mode=True: iter(batches)
        )

        def fake_forward(variables, inputs):
            k = len([e for e in events if e[0] == "dispatch"])
            events.append(("dispatch", k))
            return ("handle", k)

        def fake_host_stage(handles, reference_mirror=False):
            _, k = handles
            events.append(("consume", k))
            return [[ring], [ring]], [[0.9], [0.9]]

        predictor._forward = fake_forward
        monkeypatch.setattr(predictor, "_host_stage", fake_host_stage)

        pred_file = predictor.predict_dataset("val")

        assert events == [
            ("dispatch", 0),
            ("dispatch", 1),
            ("consume", 0),
            ("dispatch", 2),
            ("consume", 1),
            ("consume", 2),
        ]
        import json as _json

        with open(pred_file) as f:
            anns = _json.load(f)
        assert [a["image_id"] for a in anns] == [0, 1, 2, 3, 4, 5]


def test_remat_train_step_matches_plain(key):
    """training.remat wraps the forward in jax.checkpoint — a pure
    memory/FLOPs trade that must not change the math: same loss, same
    updated params as the plain step from the same initial state."""
    from pixelspointspolygons_tpu.train.hisup_step import make_train_step
    from pixelspointspolygons_tpu.train.state import create_train_state, make_optimizer

    model = HiSup(
        encoder_cfg={
            "name": "vit_cnn", "img_size": 32, "patch_size": 8,
            "dim": 32, "depth": 1, "num_heads": 2, "out_size": 32,
        },
        dim=32,
        pred_size=32,
    )
    batch = dict(tiny_batch(), images=jnp.linspace(0, 1, 2 * 32 * 32 * 3).reshape(2, 32, 32, 3))
    variables = model.init(key, {"images": batch["images"]})
    tx = make_optimizer("adamw", lambda _: 1e-3, weight_decay=0.0)
    weights = {k: 1.0 for k in ("loss_jloc", "loss_joff", "loss_mask", "loss_afm", "loss_remask")}

    outs = []
    for remat in (False, True):
        # the train step donates the state; give each branch its own copy
        v = jax.tree_util.tree_map(jnp.copy, variables)
        state = create_train_state(model, v, tx)
        step = make_train_step(model, weights, 32, remat=remat)
        new_state, metrics = step(state, batch)
        outs.append((new_state, metrics))
    (s0, m0), (s1, m1) = outs
    np.testing.assert_allclose(float(m1["loss"]), float(m0["loss"]), rtol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(s0.params), jax.tree_util.tree_leaves(s1.params)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=1e-6)
