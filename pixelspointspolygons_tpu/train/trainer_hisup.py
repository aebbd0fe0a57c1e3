"""HiSup trainer: AdamW + cosine schedule, 5-term weighted loss
(reference train/trainer_hisup.py:31-63 LossReducer + optimizer recipe),
val-epoch IoU via the full polygonization path."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..data.loader import build_loader
from ..eval.metrics import compute_iou_ciou
from ..models.hisup.factory import build_hisup
from ..parallel import all_gather_objects, device_prefetch
from ..utils.coco import CocoIndex, generate_coco_ann
from .state import cosine_with_warmup, create_train_state, make_optimizer, num_params
from .trainer import Trainer


# device-resident batch leaves the jitted steps consume
_DEV_KEYS = (
    "images",
    "lidar",
    "lidar_mask",
    "junctions",
    "junc_tags",
    "junc_valid",
    "edges",
    "edges_valid",
    "mask",
)


class HiSupTrainer(Trainer):
    def setup(self) -> None:
        cfg = self.cfg
        from .state import compute_dtype

        self.model = build_hisup(cfg, dtype=compute_dtype(cfg))
        self.train_loader = build_loader(cfg, "train")
        self.val_loader = build_loader(cfg, "val")

        # device-resident dataset fast path (single-chip); same opt-in knob
        # as Pix2Poly (training.device_cache) — data/device_cache.py
        self.cache = None
        dc = str(cfg.training.get("device_cache") or "false").lower()
        if dc in ("auto", "true", "1"):
            from ..data.device_cache import CacheFitError, HiSupDeviceCache

            try:
                self.cache = {
                    "train": HiSupDeviceCache(cfg, "train", self.mesh),
                    "val": HiSupDeviceCache(cfg, "val", self.mesh),
                }
            except (NotImplementedError, ValueError) as e:
                # an oversized cache falls back to the host loader even when
                # device_cache=true — dying in RESOURCE_EXHAUSTED after the
                # upload helps nobody (round-4 HiSup-fusion failure mode)
                if dc != "auto" and not isinstance(e, CacheFitError):
                    raise
                self.cache = None
                self.logger.warning(f"device cache unavailable ({e}); host loader")

        m = cfg.experiment.model
        steps_per_epoch = (
            len(self.cache["train"]) if self.cache else len(self.train_loader)
        )
        total_steps = steps_per_epoch * int(m.num_epochs)
        schedule = cosine_with_warmup(float(m.learning_rate), total_steps)
        tx = make_optimizer("adamw", schedule, weight_decay=float(m.weight_decay))

        sample = next(iter(self.val_loader))
        init_inputs = {
            k: jnp.asarray(sample[k][:2])
            for k in ("images", "lidar", "lidar_mask")
            if k in sample
        }
        variables = self.model.init(jax.random.PRNGKey(0), init_inputs)
        from ..utils.pretrained import apply_pretrained_encoder

        variables = apply_pretrained_encoder(self.cfg, variables, self.logger)
        self.state = create_train_state(self.model, variables, tx)
        self.maybe_resume()
        self.state = self.replicate(self.state)
        self.logger.info(f"model has {num_params(self.state.params)/1e6:.2f}M params")

        weights = {k: float(v) for k, v in m.loss_weights.items()}
        size = int(m.decoder.in_feature_size)
        model = self.model

        from .hisup_step import make_train_step, make_val_step

        remat = bool(cfg.training.get("remat") or False)
        self._train_step = make_train_step(model, weights, size, remat=remat)
        self._val_step = make_val_step(model, weights, size)

        from ..predict.predictor_hisup import HiSupPredictor

        self._predictor = HiSupPredictor.__new__(HiSupPredictor)
        self._predictor.cfg = cfg
        self._predictor.logger = self.logger
        self._predictor.model = self.model
        self._predictor.mesh = self.mesh
        self._predictor.in_size = int(cfg.experiment.encoder.in_size)
        from ..models.hisup.model import HiSup, extract_junctions

        @jax.jit
        def forward(variables, batch):
            out = model.apply(variables, batch, train=False)
            jloc_sm = jax.nn.softmax(out["jloc"], axis=1)
            joff = jax.nn.sigmoid(out["joff"]) - 0.5
            remask = jax.nn.softmax(out["remask"], axis=1)[:, 1]
            juncs, scores = extract_junctions(jloc_sm, joff)
            return remask, juncs, scores

        self._predictor._forward = forward

    def train_one_epoch(self, epoch: int) -> dict:
        records = []
        if self.cache:
            for batch in self.cache["train"].epoch_batches(epoch):
                dev_batch = {k: batch[k] for k in _DEV_KEYS if k in batch}
                self.state, metrics = self._train_step(self.state, dev_batch)
                records.append(metrics)
            return self.summarize_deferred(records)
        self.train_loader.set_epoch(epoch)
        for batch in device_prefetch(self.train_loader, self.mesh):
            self.state, metrics = self._train_step(self.state, batch)
            records.append(metrics)
        return self.summarize_deferred(records)

    def val_one_epoch(self, epoch: int) -> dict:
        records = []
        if self.cache:
            for batch in self.cache["val"].epoch_batches(epoch):
                dev_batch = {k: batch[k] for k in _DEV_KEYS if k in batch}
                records.append(self._val_step(self.state, dev_batch))
            return self.summarize_deferred(records)
        for batch in self.val_loader:
            records.append(self._val_step(self.state, self.shard(batch)))
        return self.summarize_deferred(records)

    def predict_and_eval(self, epoch: int) -> float:
        variables = {"params": self.state.params}
        if self.state.batch_stats is not None:
            variables["batch_stats"] = self.state.batch_stats
        predictions: list[dict] = []
        for batch in self.val_loader:
            polys, scores = self._predictor.predict_batch(variables, batch)
            for b in range(len(polys)):
                if not batch["sample_valid"][b]:
                    continue
                predictions.extend(
                    generate_coco_ann(polys[b], int(batch["image_id"][b]), scores[b])
                )
        gathered = [p for chunk in all_gather_objects(predictions) for p in chunk]
        gt = CocoIndex(self.cfg.experiment.dataset.annotations["val"])
        dt = gt.load_res(gathered)
        results = compute_iou_ciou(gt, dt)
        self.logger.info(
            f"epoch {epoch} val IoU={results['IoU']:.4f} C-IoU={results['C-IoU']:.4f}"
        )
        return float(results["IoU"])
