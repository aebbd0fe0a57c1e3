"""Base trainer: the template method of reference train/trainer.py:22-220
(seed → model → loaders → optimizer → train_val_loop → checkpoints), with the
DDP runtime replaced by a data mesh + jitted steps."""

from __future__ import annotations

import time
import jax
import numpy as np

from ..config.engine import Config
from ..parallel import make_mesh, replicate, shard_batch, sync_processes
from ..utils.checkpoint import CheckpointManager, save_best_and_latest
from ..utils.logger import MetricLogger, make_logger
from ..utils.seeding import seed_everything


class Trainer:
    def __init__(self, cfg: Config):
        self.cfg = cfg
        self.logger = make_logger(self.__class__.__name__)
        self.mesh = make_mesh()
        self.manager = CheckpointManager(cfg.output_dir)
        self.best = {
            "val_loss": float(cfg.training.best_val_loss),
            "val_iou": float(cfg.training.best_val_iou),
        }
        self.start_epoch = int(cfg.experiment.model.start_epoch)

    # subclasses implement: setup_model/setup_loaders/setup_optimizer/
    # train_one_epoch/val_one_epoch/predict_and_eval

    def train(self) -> dict:
        from ..utils.experiment_log import RunLogger

        self.rng = seed_everything(int(self.cfg.get("seed", 42)))
        self.setup()
        self.run_logger = RunLogger(self.cfg)
        num_epochs = int(self.cfg.experiment.model.num_epochs)
        val_every = int(self.cfg.training.val_every)
        history = {}
        for epoch in range(self.start_epoch, num_epochs):
            t0 = time.time()
            train_metrics = self.train_one_epoch(epoch)
            val_metrics = self.val_one_epoch(epoch)
            val_iou = None
            if (epoch + 1) % val_every == 0 or epoch == num_epochs - 1:
                val_iou = self.predict_and_eval(epoch)
            self.best = save_best_and_latest(
                self.manager,
                self.state,
                epoch,
                self.cfg,
                val_metrics.get("loss", np.inf),
                val_iou,
                self.best,
                save_every=int(self.cfg.training.save_every),
            )
            dt = time.time() - t0
            msg = " ".join(f"{k}={v:.4f}" for k, v in {**train_metrics, **{f'val_{k}': v for k, v in val_metrics.items()}}.items())
            if val_iou is not None:
                msg += f" val_iou={val_iou:.4f}"
            self.logger.info(f"epoch {epoch}: {msg} ({dt:.1f}s)")
            history = {"epoch": epoch, **train_metrics}
            history.update({f"val_{k}": v for k, v in val_metrics.items()})
            if val_iou is not None:
                history["val_iou"] = val_iou
            self.run_logger.log(history, step=epoch)
        self.run_logger.finish()
        sync_processes("p3_train_end")
        return history

    def maybe_resume(self) -> None:
        name = self.cfg.get("checkpoint")
        if not name:
            self._maybe_warm_start()
            return
        payload = self.manager.restore(name, state_template=self.state)
        self.manager.check_modality_compat(payload.get("cfg"), self.cfg)
        self.state = self.state.replace(
            params=payload["params"],
            opt_state=payload["opt_state"],
            batch_stats=payload.get("batch_stats"),
            step=int(payload["step"]),
        )
        self.start_epoch = int(payload["epoch"]) + 1
        self.best["val_loss"] = float(payload.get("best_val_loss", self.best["val_loss"]))
        self.best["val_iou"] = float(payload.get("best_val_iou", self.best["val_iou"]))
        self.logger.info(f"resumed from {name!r} at epoch {self.start_epoch}")

    def _maybe_warm_start(self) -> None:
        """Weights-only initialization from a prior run's orbax checkpoint
        (`init_weights_from=<ckpt dir>`): params/batch_stats are grafted via
        the fuzzy suffix matcher (cross-modality warm starts keep init where
        shapes differ, e.g. the P2P decoder transfers image→lidar), the
        optimizer/schedule/epoch restart fresh. The in-env substitute for the
        reference's pretrained-encoder downloads (misc/shared_utils.py
        smart_load_state_dict used the same way)."""
        src = self.cfg.get("init_weights_from")
        if not src:
            return
        import os

        import orbax.checkpoint as ocp

        from ..utils.checkpoint import smart_restore_params

        path = os.path.abspath(str(src))
        if not os.path.isdir(path):
            raise FileNotFoundError(f"init_weights_from checkpoint not found: {path}")
        payload = ocp.StandardCheckpointer().restore(path)
        params = smart_restore_params(
            jax.device_get(self.state.params), payload.get("params", {}), self.logger
        )
        updates = {"params": params}
        if self.state.batch_stats is not None and payload.get("batch_stats") is not None:
            updates["batch_stats"] = smart_restore_params(
                jax.device_get(self.state.batch_stats), payload["batch_stats"], self.logger
            )
        self.state = self.state.replace(**updates)
        self.logger.info(f"warm-started weights from {path} (fresh optimizer)")

    def shard(self, batch: dict) -> dict:
        return shard_batch(batch, self.mesh)

    def replicate(self, tree):
        return replicate(tree, self.mesh)

    @staticmethod
    def collect_metrics(meter: MetricLogger, metrics: dict) -> None:
        meter.update(**{k: float(np.asarray(v)) for k, v in metrics.items()})

    @staticmethod
    def summarize_deferred(records: list[dict]) -> dict:
        """Materialize a whole epoch's device-resident metric dicts in one
        host sync (per-step float() syncs cost a tunnel round trip each)."""
        if not records:
            return {}
        host = jax.device_get(records)
        keys = host[0].keys()
        return {k: float(np.mean([r[k] for r in host])) for k in keys}
