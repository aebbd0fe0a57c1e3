"""Trainer integration: Pix2PolyTrainer.train() runs end-to-end on a tiny
config (CPU, 2 epochs) — epoch loops, deferred metrics, predict_and_eval,
checkpoint policy, run logger, resume."""

import os

import numpy as np
import pytest

from pixelspointspolygons_tpu.config import compose


@pytest.fixture(scope="module")
def tiny_cfg(tmp_path_factory):
    root = tmp_path_factory.mktemp("traininteg")
    os.environ["P3_DATASET_ROOT"] = str(root / "data")
    os.environ["P3_MODEL_ROOT"] = str(root / "out")
    overrides = [
        "experiment=debug",
        "run_type=debug",
        "experiment.dataset.num_train=4",
        "experiment.dataset.num_val=2",
        "experiment.dataset.num_test=2",
        "run_type.train_subset=null",
        "run_type.val_subset=null",
        "run_type.test_subset=null",
        "experiment.model.batch_size=2",
        "experiment.model.num_epochs=2",
        "training.val_every=2",
        "training.save_every=100",
        "experiment.encoder.in_size=32",
        "experiment.encoder.num_patches=16",
        "experiment.encoder.patch_feature_dim=48",
        "experiment.model.decoder.in_feature_dim=32",
        "experiment.model.decoder.num_layers=1",
        "experiment.model.decoder.num_heads=4",
        "experiment.model.tokenizer.max_num_vertices=16",
        "experiment.model.sinkhorn_iterations=5",
    ]
    return compose(overrides)


def test_pix2poly_trainer_end_to_end(tiny_cfg):
    from pixelspointspolygons_tpu.train.trainer_pix2poly import Pix2PolyTrainer

    trainer = Pix2PolyTrainer(tiny_cfg)
    history = trainer.train()
    assert np.isfinite(history["loss"])
    assert "val_iou" in history
    assert trainer.manager.exists("latest")
    assert trainer.manager.exists("best_val_loss")
    # run logger wrote the jsonl
    runs = os.path.join(tiny_cfg.output_dir, "runs")
    assert not tiny_cfg.run_type.log_to_wandb or os.path.isdir(runs)

    # resume continues from epoch 2 (immediately done)
    tiny_cfg.checkpoint = "latest"
    trainer2 = Pix2PolyTrainer(tiny_cfg)
    trainer2.train()
    assert trainer2.start_epoch == 2
