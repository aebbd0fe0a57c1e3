"""FFL trainer: Adam + cosine schedule, MultiLoss with epoch-interpolated
weights (reference train/trainer_ffl.py:38-59), val loss per epoch and — on
COCO-eval epochs — the full predictor + ACM polygonization on the val split
(:244-253; note the reference runs it outside no_grad because torch ACM
needs autograd; our ACM is jax.grad inside jit, so no such constraint)."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..data.loader import build_loader
from ..eval.metrics import compute_iou_ciou
from ..models.ffl.losses import make_ffl_loss
from ..models.ffl.model import build_ffl
from ..parallel import all_gather_objects, device_prefetch
from ..utils.coco import CocoIndex, generate_coco_ann
from .state import cosine_with_warmup, create_train_state, make_optimizer, num_params
from .trainer import Trainer

FFL_BATCH_KEYS = (
    "images",
    "lidar",
    "lidar_mask",
    "gt_polygons_image",
    "distances",
    "sizes",
    "gt_crossfield_angle",
    "class_freq",
)


class FFLTrainer(Trainer):
    def setup(self) -> None:
        cfg = self.cfg
        from .state import compute_dtype

        self.model = build_ffl(cfg, dtype=compute_dtype(cfg))
        self.train_loader = build_loader(cfg, "train")
        self.val_loader = build_loader(cfg, "val")

        # device-resident dataset fast path (single-chip); same opt-in knob
        # as Pix2Poly/HiSup (training.device_cache) — data/device_cache.py
        self.cache = None
        dc = str(cfg.training.get("device_cache") or "false").lower()
        if dc in ("auto", "true", "1"):
            from ..data.device_cache import CacheFitError, FFLDeviceCache

            try:
                self.cache = {
                    "train": FFLDeviceCache(cfg, "train", self.mesh),
                    "val": FFLDeviceCache(cfg, "val", self.mesh),
                }
            except (NotImplementedError, ValueError) as e:
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
        tx = make_optimizer("adam", schedule)

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

        loss_fn_raw, self._weights_for_epoch = make_ffl_loss(cfg)
        model = self.model

        from .ffl_step import make_train_step, make_val_step

        self._normalize = bool(m.loss.multi.get("normalize") or False)
        if self._normalize:
            from ..models.ffl.losses import LossNormTracker

            self._norm_tracker = LossNormTracker(self._weights_for_epoch(0).keys())
        self._train_step = make_train_step(model, loss_fn_raw, normalize=self._normalize)
        self._val_step = make_val_step(model, loss_fn_raw)

        from ..predict.predictor_ffl import FFLPredictor
        from ..predict.ffl_polygonize import Polygonizer

        self._predictor = FFLPredictor.__new__(FFLPredictor)
        self._predictor.cfg = cfg
        self._predictor.logger = self.logger
        self._predictor.model = self.model
        self._predictor.mesh = self.mesh
        self._predictor.polygonizer = Polygonizer(
            cfg.experiment.polygonization,
            seg_threshold=float(m.eval.seg_threshold),
        )
        self._predictor._forward = jax.jit(
            lambda v, b: model.apply(v, b, train=False)
        )

    def _epoch_weights(self, epoch: int) -> dict:
        return {k: jnp.float32(v) for k, v in self._weights_for_epoch(epoch).items()}

    def train_one_epoch(self, epoch: int) -> dict:
        weights = self._epoch_weights(epoch)
        records = []
        norms = self._norm_tracker.norms() if self._normalize else None
        if self.cache:
            batches = (
                {k: b[k] for k in FFL_BATCH_KEYS if k in b}
                for b in self.cache["train"].epoch_batches(epoch)
            )
        else:
            self.train_loader.set_epoch(epoch)
            filtered = (
                {k: v for k, v in b.items() if k in FFL_BATCH_KEYS}
                for b in self.train_loader
            )
            batches = device_prefetch(filtered, self.mesh)
        for batch in batches:
            if self._normalize:
                self.state, metrics = self._train_step(self.state, batch, weights, norms)
            else:
                self.state, metrics = self._train_step(self.state, batch, weights)
            records.append(metrics)
        summary = self.summarize_deferred(records)
        if self._normalize:
            # per-epoch norm update from the epoch-mean RAW losses (reference
            # updates per batch + DDP-syncs; per-step host syncs are a tunnel
            # round trip here — epoch means are already global)
            self._norm_tracker.update({k: v for k, v in summary.items() if k != "loss"})
        return summary

    def val_one_epoch(self, epoch: int) -> dict:
        weights = self._epoch_weights(epoch)
        records = []
        if self.cache:
            for b in self.cache["val"].epoch_batches(epoch):
                dev = {k: b[k] for k in FFL_BATCH_KEYS if k in b}
                records.append(self._val_step(self.state, dev, weights))
        else:
            for batch in self.val_loader:
                b = {k: v for k, v in batch.items() if k in FFL_BATCH_KEYS}
                records.append(self._val_step(self.state, self.shard(b), weights))
        return self.summarize_deferred(records)

    def predict_and_eval(self, epoch: int) -> float:
        variables = {"params": self.state.params}
        if self.state.batch_stats is not None:
            variables["batch_stats"] = self.state.batch_stats
        predictions: list[dict] = []
        ev_tol = self.cfg.experiment.polygonization.acm_method.get("eval_tolerance", 1)
        for batch in self.val_loader:
            results = self._predictor.predict_batch(variables, batch)
            method = "acm" if "acm" in results else next(iter(results))
            tols = results[method]
            tol = f"tol_{ev_tol}" if f"tol_{ev_tol}" in tols else next(iter(tols))
            for b, polys in enumerate(tols[tol]):
                if not batch["sample_valid"][b]:
                    continue
                predictions.extend(generate_coco_ann(polys, int(batch["image_id"][b])))
        gathered = [p for chunk in all_gather_objects(predictions) for p in chunk]
        gt = CocoIndex(self.cfg.experiment.dataset.annotations["val"])
        dt = gt.load_res(gathered)
        results = compute_iou_ciou(gt, dt)
        self.logger.info(
            f"epoch {epoch} val IoU={results['IoU']:.4f} C-IoU={results['C-IoU']:.4f}"
        )
        return float(results["IoU"])
