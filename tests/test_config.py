"""Config engine tests: composition, interpolation, resolvers, overrides.

The assertions encode the reference's config-resolution semantics
(reference: config/config.yaml defaults tree; misc/shared_utils.py:28-35
custom eq/if/divide resolvers; config/model/ffl.yaml:17 feature-dim switch;
config/encoder/hrnet.yaml out_feature_size divide resolver).
"""

import pytest

from pixelspointspolygons_tpu.config import compose


def test_default_compose():
    cfg = compose()
    assert cfg.run_type.name == "release"
    assert cfg.experiment.model.name == "ffl"
    assert cfg.experiment.encoder.name == "vit_cnn"
    assert cfg.experiment.dataset.country == "CH"
    # interpolation across groups
    assert cfg.experiment.encoder.in_size == 224
    assert cfg.num_workers == cfg.run_type.num_workers


def test_group_override():
    cfg = compose(["experiment=p2p_image", "run_type=debug"])
    assert cfg.experiment.model.name == "pix2poly"
    assert cfg.experiment.encoder.name == "vit"
    assert cfg.run_type.name == "debug"
    assert cfg.experiment.dataset.train_subset == 256
    # tokenizer num_bins tracks encoder in_size
    assert cfg.experiment.model.tokenizer.num_bins == 224
    assert cfg.experiment.model.tokenizer.max_num_vertices == 192


def test_if_eq_resolver():
    # ffl decoder dim: 256 at 224px, 32 at 512px (reference config/model/ffl.yaml:17)
    cfg = compose(["experiment=ffl_image"])
    assert cfg.experiment.model.decoder.in_feature_dim == 256
    cfg = compose(["experiment=ffl_image", "experiment.encoder.in_size=512"])
    assert cfg.experiment.model.decoder.in_feature_dim == 32


def test_divide_resolver():
    cfg = compose(["experiment=hisup_image"])
    assert cfg.experiment.encoder.name == "hrnet"
    # HRNet out_feature_size = in_size / 4 (reference config/encoder/hrnet.yaml)
    assert cfg.experiment.encoder.out_feature_size == 56


def test_kv_overrides_and_add():
    cfg = compose(
        [
            "experiment=p2p_image",
            "experiment.dataset.country=NY",
            "checkpoint=latest",
            "+image_file=/tmp/x.tif",
        ]
    )
    assert cfg.experiment.dataset.country == "NY"
    assert cfg.checkpoint == "latest"
    assert cfg.image_file == "/tmp/x.tif"
    assert "NY" in cfg.experiment.dataset.annotations.train


def test_output_dir_interpolation():
    cfg = compose(["experiment=p2p_image"])
    assert cfg.output_dir.endswith("/pix2poly/224/p2p_image")


def test_evaluation_group():
    cfg = compose(["evaluation=test"])
    assert cfg.evaluation.split == "test"
    assert "coco" in cfg.evaluation.modes


def test_mutation_after_compose():
    cfg = compose(["experiment=p2p_image"])
    cfg.experiment.model.tokenizer.pad_idx = 226
    assert cfg.experiment.model.tokenizer.pad_idx == 226


def test_lidar_density_ablation():
    cfg = compose(["experiment=lidar_density_ablation32"])
    assert cfg.experiment.encoder.max_num_points_per_voxel == 32
    assert cfg.experiment.model.name == "ffl"


@pytest.mark.parametrize(
    "exp,model,encoder",
    [
        ("p2p_fusion", "pix2poly", "early_fusion_vit"),
        ("hisup_lidar", "hisup", "pointpillars_vit_cnn"),
        ("ffl_fusion", "ffl", "early_fusion_vit_cnn"),
    ],
)
def test_experiment_grid(exp, model, encoder):
    cfg = compose([f"experiment={exp}"])
    assert cfg.experiment.model.name == model
    assert cfg.experiment.encoder.name == encoder
