"""FFL predictor: jitted inference → on-device ACM polygonization → COCO.

Capability parity with reference predict/predictor_ffl.py:42-177 (per-method
per-tolerance output fan-out, canonical acm.tol_1 copy to pred_file) and
predict/ffl/inference.py:45-54 (no-patching inference)."""

from __future__ import annotations

import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from ..data.loader import build_loader
from ..models.ffl.model import build_ffl
from ..parallel import make_mesh, replicate, shard_batch
from ..utils.coco import generate_coco_ann, save_annotations
from .ffl_polygonize import Polygonizer
from .predictor import Predictor


class FFLPredictor(Predictor):
    def __init__(self, cfg):
        super().__init__(cfg)
        from ..train.state import compute_dtype

        self.model = build_ffl(cfg, dtype=compute_dtype(cfg))
        self.mesh = make_mesh()
        self.polygonizer = Polygonizer(
            cfg.experiment.polygonization,
            seg_threshold=float(cfg.experiment.model.eval.seg_threshold),
        )

        @jax.jit
        def forward(variables, batch):
            out = self.model.apply(variables, batch, train=False)
            # ship seg/crossfield to host as f16: halves the device→host
            # transfer (the axon tunnel moves ~MB/s under load and the
            # polygonizer's precision floor is ~1e-3 px, far above f16 ulp)
            return {k: v.astype(jnp.float16) for k, v in out.items()}

        self._forward = forward

    def _variables(self, payload):
        v = {"params": payload["params"]}
        if "batch_stats" in payload:
            v["batch_stats"] = payload["batch_stats"]
        return v

    def predict_batch(self, variables, batch: dict) -> dict:
        """Returns {method: {tol: per-sample polygon lists ((V,2) xy)}}."""
        inputs = {k: batch[k] for k in ("images", "lidar", "lidar_mask") if k in batch}
        inputs = shard_batch(inputs, self.mesh)
        out = self._forward(variables, inputs)
        # local rows only under multi-process SPMD (parallel.local_values)
        from ..parallel import local_values

        seg = local_values(out["seg"], np.float32)
        crossfield = local_values(out["crossfield"], np.float32)
        self._maybe_save_raw(batch, seg, crossfield)
        return self.polygonizer(seg, crossfield)

    def _maybe_save_raw(self, batch: dict, seg: np.ndarray, crossfield: np.ndarray) -> None:
        """Optional per-tile raw dumps (reference save_utils.save_crossfield
        :238-244, save_raw_pred :257-260), gated by model.eval flags."""
        ev = self.cfg.experiment.model.eval
        save_cf = bool(ev.get("save_crossfield", False))
        save_raw = bool(ev.get("save_raw", False))
        if not (save_cf or save_raw) or "image_id" not in batch:
            return
        raw_dir = os.path.join(os.path.dirname(self.cfg.evaluation.pred_file), "raw")
        os.makedirs(raw_dir, exist_ok=True)
        valid = np.asarray(batch.get("sample_valid", np.ones(len(seg), bool)))
        for b in range(len(seg)):
            if not valid[b]:
                continue
            img_id = int(batch["image_id"][b])
            if save_cf:
                np.save(os.path.join(raw_dir, f"{img_id}.crossfield.npy"), crossfield[b])
            if save_raw:
                np.savez_compressed(
                    os.path.join(raw_dir, f"{img_id}.raw_pred.npz"),
                    seg=seg[b],
                    crossfield=crossfield[b],
                )

    def predict_dataset(self, split: str | None = None) -> str:
        split = split or self.cfg.evaluation.split
        payload = self.load_checkpoint()
        variables = replicate(self._variables(payload), self.mesh)
        loader = build_loader(self.cfg, split, eval_mode=True)

        # per method.tol prediction lists (predictor_ffl.py:65-79)
        predictions: dict[str, list] = {}
        t0 = time.time()
        n_images = 0
        for batch in loader:
            try:
                results = self.predict_batch(variables, batch)
            except Exception as e:  # soft-fail per batch like the reference :113-123
                self.logger.warning(f"polygonization failed for batch: {e}")
                continue
            for method, tols in results.items():
                for tol, per_sample in tols.items():
                    key = f"{method}.{tol}"
                    predictions.setdefault(key, [])
                    for b, polys in enumerate(per_sample):
                        if not batch["sample_valid"][b]:
                            continue
                        predictions[key].extend(
                            generate_coco_ann(polys, int(batch["image_id"][b]))
                        )
            n_images += int(np.asarray(batch["sample_valid"]).sum())
        dt = (time.time() - t0) / max(n_images, 1)
        self.logger.info(f"prediction: {dt:.4f} [s/image] over {n_images} images")

        pred_file = self.cfg.evaluation.pred_file
        for key, anns in predictions.items():
            save_annotations(anns, pred_file.replace(".json", f"_{key}.json"))
        # canonical copy: acm.tol_<eval_tolerance> (reference hardcodes
        # acm.tol_1, predictor_ffl.py:74-79; the tolerance operating point is
        # a config knob here — see config/polygonization/asm_acm.yaml)
        ev_tol = self.cfg.experiment.polygonization.acm_method.get("eval_tolerance", 1)
        want = f"acm.tol_{ev_tol}"
        canonical = predictions.get(want)
        if canonical is None:
            acm_keys = [k for k in predictions if k.startswith("acm.")]
            canonical = predictions[acm_keys[0]] if acm_keys else next(iter(predictions.values()), [])
        save_annotations(canonical or [], pred_file)
        with open(pred_file.replace(".json", "_time.json"), "w") as f:
            json.dump({"prediction_time": dt, "num_images": n_images}, f)
        self.logger.info(f"wrote predictions for {list(predictions)} to {os.path.dirname(pred_file)}")
        return pred_file

    def predict_file(self, image_file=None, lidar_file=None, out_file="prediction.png"):
        payload = self.load_checkpoint()
        variables = self._variables(payload)
        batch = {}
        image = None
        if image_file and self.cfg.experiment.encoder.use_images:
            image = self.load_image_from_file(image_file)
            batch["images"] = image
        if lidar_file and self.cfg.experiment.encoder.use_lidar:
            lidar, mask = self.load_lidar_from_file(lidar_file)
            batch["lidar"] = lidar
            batch["lidar_mask"] = mask
        patch_size = self.cfg.experiment.model.eval.get("patch_size")
        if patch_size and image is not None and image.shape[1] > int(patch_size):
            # sliding-window inference for large rasters (inference.py:57-118)
            from .ffl_inference import inference_with_patching

            out = inference_with_patching(
                lambda p: {
                    k: np.asarray(v)
                    for k, v in self._forward(variables, {"images": p}).items()
                },
                image,
                int(patch_size),
                int(self.cfg.experiment.model.eval.patch_overlap),
            )
            results = self.polygonizer(out["seg"], out["crossfield"])
        else:
            results = self.predict_batch(variables, batch)
        method = next(iter(results))
        tol = next(iter(results[method]))
        polys = results[method][tol][0]
        self.plot_prediction(image, polys, out_file)
        return polys
