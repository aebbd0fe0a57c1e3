"""Pix2Poly trainer.

Capability parity with reference train/trainer_pix2poly.py:
- AdamW(β2=0.95) + linear warmup-decay with 5% warmup (:38-77);
- CE (pad-ignored) + BCE perm losses weighted 1/10 (:87-93);
- teacher-forced train epoch (:284-351), val-loss epoch (:224-281);
- every val_every epochs: greedy-decode the val split, assemble polygons,
  evaluate IoU, track best_val_iou (:355-468). The DDP all_gather_object of
  COCO predictions is a host-side no-op single-process (parallel/mesh.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..data.loader import build_loader
from ..eval.metrics import compute_iou_ciou
from ..models.pix2poly import Tokenizer, build_pix2poly, greedy_generate
from ..parallel import all_gather_objects, device_prefetch
from ..utils.coco import CocoIndex, generate_coco_ann
from .pix2poly_step import make_train_step, make_val_step
from .state import create_train_state, linear_warmup_decay, make_optimizer, num_params
from .trainer import Trainer


# device-resident batch leaves the jitted steps consume (sample_valid /
# image_id stay host-side)
_DEV_KEYS = ("images", "lidar", "lidar_mask", "y", "y_perm")


class Pix2PolyTrainer(Trainer):
    def setup(self) -> None:
        cfg = self.cfg
        self.tokenizer = Tokenizer(cfg)
        from .state import compute_dtype

        self.model = build_pix2poly(cfg, self.tokenizer, dtype=compute_dtype(cfg))

        self.train_loader = build_loader(cfg, "train", tokenizer=self.tokenizer)
        self.val_loader = build_loader(cfg, "val", tokenizer=self.tokenizer)

        # device-resident dataset fast path (single-chip): upload the split
        # once, gather+augment on device — the tunnel's ~1 s/batch host→device
        # cost drops to index scalars (data/device_cache.py)
        self.cache = None
        dc = str(cfg.training.get("device_cache") or "false").lower()
        if dc in ("auto", "true", "1"):
            from ..data.device_cache import CacheFitError, P2PDeviceCache

            try:
                self.cache = {
                    "train": P2PDeviceCache(cfg, "train", self.tokenizer, self.mesh),
                    "val": P2PDeviceCache(cfg, "val", self.tokenizer, self.mesh),
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
        schedule = linear_warmup_decay(float(m.learning_rate), total_steps, 0.05)
        tx = make_optimizer("adamw", schedule, weight_decay=float(m.weight_decay), b2=0.95)

        sample = next(iter(self.val_loader))
        init_inputs = {
            k: jnp.asarray(sample[k][:2])
            for k in ("images", "lidar", "lidar_mask")
            if k in sample
        }
        variables = self.model.init(
            jax.random.PRNGKey(0), init_inputs, jnp.asarray(sample["y"][:2, :-1])
        )
        from ..utils.pretrained import apply_pretrained_encoder

        variables = apply_pretrained_encoder(self.cfg, variables, self.logger)
        self.state = create_train_state(self.model, variables, tx)
        self.maybe_resume()
        self.state = self.replicate(self.state)
        self.logger.info(f"model has {num_params(self.state.params)/1e6:.2f}M params")

        vw = float(m.vertex_loss_weight)
        pw = float(m.perm_loss_weight)
        self._train_step = make_train_step(self.model, vw, pw, self.tokenizer.PAD_code)
        self._val_step = make_val_step(self.model, vw, pw, self.tokenizer.PAD_code)

        from ..predict.predictor_pix2poly import Pix2PolyPredictor

        self._predictor = Pix2PolyPredictor.__new__(Pix2PolyPredictor)
        # share model/tokenizer without re-loading checkpoints
        self._predictor.cfg = cfg
        self._predictor.logger = self.logger
        self._predictor.tokenizer = self.tokenizer
        self._predictor.model = self.model
        self._predictor.mesh = self.mesh
        self._predictor._gen = jax.jit(
            lambda v, b: greedy_generate(
                self.model,
                v,
                b,
                bos_code=self.tokenizer.BOS_code,
                generation_steps=int(cfg.experiment.model.tokenizer.generation_steps),
                raw_scores=True,
                eos_code=self.tokenizer.EOS_code,  # early exit (see model.py)
            )
        )

    def train_one_epoch(self, epoch: int) -> dict:
        records = []
        if self.cache:
            for step, batch in enumerate(self.cache["train"].epoch_batches(epoch)):
                step_rng = jax.random.fold_in(self.rng, epoch * 100003 + step)
                dev_batch = {k: batch[k] for k in _DEV_KEYS if k in batch}
                self.state, metrics = self._train_step(self.state, dev_batch, step_rng)
                records.append(metrics)
            return self.summarize_deferred(records)
        self.train_loader.set_epoch(epoch)
        step = 0
        for batch in device_prefetch(self.train_loader, self.mesh):
            step_rng = jax.random.fold_in(self.rng, epoch * 100003 + step)
            self.state, metrics = self._train_step(self.state, batch, step_rng)
            records.append(metrics)
            step += 1
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
        """Greedy-decode the val split and compute mask IoU (val mode)."""
        variables = {"params": self.state.params}
        if self.state.batch_stats is not None:
            variables["batch_stats"] = self.state.batch_stats
        predictions: list[dict] = []
        for batch in self.val_loader:
            polys, _ = self._predictor.predict_batch(variables, batch)
            for b, image_polys in enumerate(polys):
                if not batch["sample_valid"][b]:
                    continue
                predictions.extend(generate_coco_ann(image_polys, int(batch["image_id"][b])))
        gathered = [p for chunk in all_gather_objects(predictions) for p in chunk]
        gt = CocoIndex(self.cfg.experiment.dataset.annotations["val"])
        dt = gt.load_res(gathered)
        results = compute_iou_ciou(gt, dt)
        self.logger.info(
            f"epoch {epoch} val IoU={results['IoU']:.4f} C-IoU={results['C-IoU']:.4f}"
        )
        self._log_val_visualization(epoch, polys, batch)
        return float(results["IoU"])

    def _log_val_visualization(self, epoch: int, polys, batch) -> None:
        """Per-val-epoch GT-vs-pred panel (reference trainer_pix2poly.py:96-179
        pushes these to wandb; here through the run logger)."""
        if not getattr(self, "run_logger", None) or not self.run_logger.enabled:
            return
        try:
            import io

            import matplotlib

            matplotlib.use("Agg")
            import matplotlib.pyplot as plt

            img = batch.get("images")
            fig, ax = plt.subplots(figsize=(4, 4))
            if img is not None:
                disp = img[0] - img[0].min()
                ax.imshow(disp / max(float(disp.max()), 1e-6))
            for poly in polys[0]:
                ring = np.concatenate([poly, poly[:1]])
                ax.plot(ring[:, 0], ring[:, 1], "-o", lw=1.2, ms=2)
            ax.set_axis_off()
            fig.canvas.draw()
            buf = np.asarray(fig.canvas.buffer_rgba())[..., :3]
            plt.close(fig)
            self.run_logger.log_image("val_prediction", buf, step=epoch)
        except Exception as e:  # visualization must never kill training
            self.logger.debug(f"val visualization failed: {e}")
