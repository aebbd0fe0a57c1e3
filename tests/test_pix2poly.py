"""Pix2Poly model tests: tokenizer round-trip, teacher-forced shapes,
KV-cache decode == full re-forward (the parity-critical property,
SURVEY.md §7.3 hard part 3), modality dispatch, adaptive pool vs torch."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pixelspointspolygons_tpu.config import compose
from pixelspointspolygons_tpu.models.layers import adaptive_avg_pool1d
from pixelspointspolygons_tpu.models.pix2poly import (
    Pix2Poly,
    Tokenizer,
    build_pix2poly,
    greedy_generate,
)


@pytest.fixture(scope="module")
def cfg():
    return compose(["experiment=p2p_image", "run_type=debug"])


@pytest.fixture(scope="module")
def tiny_model_and_vars():
    """A tiny Pix2Poly (small dims, short sequences) for fast decode tests."""
    model = Pix2Poly(
        vocab_size=19,
        encoder_len=16,
        dim=32,
        num_heads=4,
        num_layers=2,
        max_len=12,
        pad_idx=18,
        max_num_vertices=5,
        sinkhorn_iterations=10,
        encoder_cfg={"name": "vit", "img_size": 16, "patch_size": 4, "dim": 32, "depth": 1, "num_heads": 2},
    )
    batch = {"images": jnp.zeros((2, 16, 16, 3))}
    y = jnp.zeros((2, 11), jnp.int32)
    variables = model.init(jax.random.PRNGKey(0), batch, y)
    return model, variables, batch


class TestTokenizer:
    def test_roundtrip(self, cfg):
        tok = Tokenizer(cfg)
        coords = np.array([[10.0, 20.0], [100.5, 200.25], [223.0, 0.0]])
        tokens, _ = tok(coords.copy(), shuffle=False)
        assert tokens[0] == tok.BOS_code and tokens[-1] == tok.EOS_code
        out = tok.decode(tok.pad(tokens))
        np.testing.assert_allclose(out, np.rint(coords * 223 / 224) * 224 / 223, atol=0.51)

    def test_cfg_writeback(self, cfg):
        tok = Tokenizer(cfg)
        assert cfg.experiment.model.tokenizer.pad_idx == tok.PAD_code == 226
        assert cfg.experiment.model.tokenizer.max_len == 386
        assert cfg.experiment.model.tokenizer.generation_steps == 385

    def test_debug_mode_reverses(self, cfg):
        tok = Tokenizer(cfg)
        coords = np.array([[10.0, 20.0], [30.0, 40.0]])
        _, idxs = tok(coords.copy(), shuffle=True)
        np.testing.assert_array_equal(idxs, [1, 0])

    def test_decode_truncates_at_eos(self, cfg):
        tok = Tokenizer(cfg)
        seq = np.array([tok.BOS_code, 5, 6, tok.EOS_code, 9, 9])
        out = tok.decode(seq)
        assert out.shape == (1, 2)


class TestAdaptivePool:
    def test_matches_torch(self, rng):
        torch = pytest.importorskip("torch")
        x = rng.randn(2, 7, 384).astype(np.float32)
        want = torch.nn.AdaptiveAvgPool1d(256)(torch.tensor(x)).numpy()
        got = np.asarray(adaptive_avg_pool1d(jnp.asarray(x), 256))
        np.testing.assert_allclose(got, want, atol=1e-5)


class TestPix2Poly:
    def test_forward_shapes(self, tiny_model_and_vars):
        model, variables, batch = tiny_model_and_vars
        y = jnp.zeros((2, 11), jnp.int32)
        (logits, perm), _ = model.apply(
            variables, batch, y, train=True, mutable=["batch_stats"]
        )
        assert logits.shape == (2, 11, 19)
        assert perm.shape == (2, 5, 5)
        # perm rows are softmax-normalized
        np.testing.assert_allclose(np.asarray(perm.sum(-1)), 1.0, atol=1e-5)

    def test_kv_cache_matches_full_forward(self, tiny_model_and_vars):
        """Greedy KV-cached decode must equal the reference-style full
        re-forward argmax chain, token for token."""
        model, variables, batch = tiny_model_and_vars
        steps = model.max_len - 1  # 11

        tokens, _ = jax.jit(
            lambda v, b: greedy_generate(model, v, b, bos_code=16, generation_steps=steps)
        )(variables, batch)
        tokens = np.asarray(tokens)

        # full re-forward reference chain (what the torch predictor does)
        enc = model.apply(variables, batch, method=Pix2Poly.encode)
        cur = np.full((2, 1), 16, np.int32)
        ref = []
        for t in range(steps):
            pad = np.full((2, steps - cur.shape[1]), model.pad_idx, np.int32)
            tgt = jnp.asarray(np.concatenate([cur, pad], axis=1))
            logits, _ = model.apply(variables, enc, tgt, method=lambda m, e, y: m.decoder(e, y))
            nxt = np.asarray(jnp.argmax(logits[:, cur.shape[1] - 1], axis=-1)).astype(np.int32)
            ref.append(nxt)
            cur = np.concatenate([cur, nxt[:, None]], axis=1)
        ref = np.stack(ref, axis=1)
        np.testing.assert_array_equal(tokens, ref)

    def test_build_from_config(self, cfg):
        model = build_pix2poly(cfg)
        assert model.vocab_size == 227
        assert model.max_len == 386
        assert model.encoder_len == 784
        assert model.dim == 256

    def test_lidar_modality(self):
        model = Pix2Poly(
            vocab_size=19,
            encoder_len=16,
            dim=32,
            num_heads=4,
            num_layers=1,
            max_len=8,
            pad_idx=18,
            max_num_vertices=3,
            sinkhorn_iterations=5,
            encoder_cfg={
                "name": "pointpillars_vit",
                "img_size": 16,
                "patch_size": 4,
                "dim": 32,
                "depth": 1,
                "num_heads": 2,
                "width": 16.0,
                "height": 16.0,
                "voxel_x": 4.0,
                "voxel_y": 4.0,
                "max_points_per_voxel": 8,
            },
        )
        batch = {
            "lidar": jnp.asarray(np.random.RandomState(0).uniform(0, 16, (2, 50, 3)).astype(np.float32)),
            "lidar_mask": jnp.ones((2, 50), bool),
        }
        y = jnp.zeros((2, 7), jnp.int32)
        variables = model.init(jax.random.PRNGKey(0), batch, y)
        (logits, perm), _ = model.apply(variables, batch, y, train=True, mutable=["batch_stats"])
        assert logits.shape == (2, 7, 19)
        assert perm.shape == (2, 3, 3)

    def test_fusion_modality(self):
        model = Pix2Poly(
            vocab_size=19,
            encoder_len=16,
            dim=32,
            num_heads=4,
            num_layers=1,
            max_len=8,
            pad_idx=18,
            max_num_vertices=3,
            sinkhorn_iterations=5,
            encoder_cfg={
                "name": "early_fusion_vit",
                "img_size": 16,
                "patch_size": 4,
                "dim": 32,
                "depth": 1,
                "num_heads": 2,
                "width": 16.0,
                "height": 16.0,
                "voxel_x": 4.0,
                "voxel_y": 4.0,
                "max_points_per_voxel": 8,
            },
        )
        batch = {
            "images": jnp.zeros((2, 16, 16, 3)),
            "lidar": jnp.asarray(np.random.RandomState(0).uniform(0, 16, (2, 50, 3)).astype(np.float32)),
            "lidar_mask": jnp.ones((2, 50), bool),
        }
        y = jnp.zeros((2, 7), jnp.int32)
        variables = model.init(jax.random.PRNGKey(0), batch, y)
        (logits, _), _ = model.apply(variables, batch, y, train=True, mutable=["batch_stats"])
        assert logits.shape == (2, 7, 19)


class TestEarlyExitDecode:
    def test_early_exit_matches_scan(self, tiny_model_and_vars):
        """eos_code-gated while_loop decode must agree with the fixed-length
        scan decode per row up to (and including) that row's first EOS, emit
        PAD afterwards, and produce the same raw-score block over the decoded
        vertices (rows are independent: a frozen row cannot perturb others)."""
        model, variables, batch = tiny_model_and_vars
        steps = model.max_len - 1
        eos = 17  # vocab 19: bos 16, eos 17, pad 18

        tok_scan, sc_scan = jax.jit(
            lambda v, b: greedy_generate(
                model, v, b, bos_code=16, generation_steps=steps, raw_scores=True
            )
        )(variables, batch)
        tok_ee, sc_ee = jax.jit(
            lambda v, b: greedy_generate(
                model, v, b, bos_code=16, generation_steps=steps,
                raw_scores=True, eos_code=eos,
            )
        )(variables, batch)
        tok_scan, tok_ee = np.asarray(tok_scan), np.asarray(tok_ee)
        sc_scan, sc_ee = np.asarray(sc_scan, np.float32), np.asarray(sc_ee, np.float32)

        for b in range(tok_scan.shape[0]):
            e = np.nonzero(tok_scan[b] == eos)[0]
            stop = int(e[0]) + 1 if len(e) else steps
            np.testing.assert_array_equal(tok_ee[b, :stop], tok_scan[b, :stop])
            assert (tok_ee[b, stop:] == model.pad_idx).all()
            nv = stop // 2  # completed (y, x) vertex pairs before EOS
            if nv:
                np.testing.assert_allclose(
                    sc_ee[b, :nv, :nv], sc_scan[b, :nv, :nv], atol=1e-4
                )
