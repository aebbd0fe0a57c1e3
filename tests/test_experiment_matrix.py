"""Every (model × modality) experiment config must build and forward.

Round-3 motivation: hisup_fusion (FusionHRNetEncoder) had a factory wiring
bug (`height` kwarg collision) that no test caught because only per-encoder
units existed — this drives each of the reference's 9 graded experiment
configs (scripts/modality_ablation.py:22-35) through its real factory and one
tiny forward pass.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pixelspointspolygons_tpu.config import compose

EXPERIMENTS = [
    "p2p_image",
    "p2p_lidar",
    "p2p_fusion",
    "hisup_image",
    "hisup_lidar",
    "hisup_fusion",
    "ffl_image",
    "ffl_lidar",
    "ffl_fusion",
]

TINY = [
    "experiment.encoder.in_size=32",
    "experiment.model.decoder.in_feature_size=32",
    "experiment.model.decoder.in_feature_dim=64",
    "experiment.encoder.patch_feature_dim=96",
    "experiment.encoder.max_num_points=256",
]


def _inputs(cfg):
    enc = cfg.experiment.encoder
    S = int(enc.in_size)
    out = {}
    if bool(enc.get("use_images")):
        out["images"] = jnp.zeros((1, S, S, 3), jnp.float32)
    if bool(enc.get("use_lidar")):
        n = int(enc.get("max_num_points") or 256)
        pts = np.random.RandomState(0).uniform(1, S - 1, (1, n, 3)).astype(np.float32)
        out["lidar"] = jnp.asarray(pts)
        out["lidar_mask"] = jnp.ones((1, n), bool)
    return out


@pytest.mark.slow
@pytest.mark.parametrize("experiment", EXPERIMENTS)
def test_experiment_builds_and_forwards(experiment):
    overrides = [f"experiment={experiment}", "dataset=synthetic", "run_type=debug"] + TINY
    cfg = compose(overrides)
    name = cfg.experiment.model.name
    rng = jax.random.PRNGKey(0)
    inputs = _inputs(cfg)

    if name == "pix2poly":
        from pixelspointspolygons_tpu.models.pix2poly import Tokenizer, build_pix2poly

        tok = Tokenizer(cfg)
        model = build_pix2poly(cfg, tok)
        y = jnp.zeros((1, tok.max_len - 1), jnp.int32)
        variables = model.init(rng, inputs, y)
        logits, perm = model.apply(variables, inputs, y, train=False)
        assert np.isfinite(np.asarray(logits, np.float32)).all()
    elif name == "hisup":
        from pixelspointspolygons_tpu.models.hisup.factory import build_hisup

        model = build_hisup(cfg)
        variables = model.init(rng, inputs)
        out = model.apply(variables, inputs, train=False)
        assert np.isfinite(np.asarray(out["mask"], np.float32)).all()
    else:
        from pixelspointspolygons_tpu.models.ffl.model import build_ffl

        model = build_ffl(cfg)
        variables = model.init(rng, inputs)
        out = model.apply(variables, inputs, train=False)
        assert np.isfinite(np.asarray(out["seg"], np.float32)).all()
