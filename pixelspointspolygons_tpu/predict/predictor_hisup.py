"""HiSup predictor: jitted forward + junction extraction, host polygonization.

Capability parity with reference predict/predictor_hisup.py:39-123 (loop the
loader, polygonize from forward_val outputs, write COCO json)."""

from __future__ import annotations

import json
import time

import cv2
import jax
import jax.numpy as jnp
import numpy as np

from ..data.loader import build_loader
from ..models.hisup.factory import build_hisup
from ..models.hisup.model import HiSup, extract_junctions
from ..parallel import make_mesh, replicate, shard_batch
from ..utils.coco import generate_coco_ann, save_annotations
from .hisup_polygon import polygons_from_masks
from .predictor import Predictor


class HiSupPredictor(Predictor):
    def __init__(self, cfg):
        super().__init__(cfg)
        from ..train.state import compute_dtype

        self.model = build_hisup(cfg, dtype=compute_dtype(cfg))
        self.mesh = make_mesh()
        self.in_size = int(cfg.experiment.encoder.in_size)
        ev = cfg.experiment.model.get("eval") or {}
        self.junc_threshold = float(ev.get("junc_threshold", 0.008) if hasattr(ev, "get") else 0.008)
        self.junc_topk = int(ev.get("junc_topk", 300) if hasattr(ev, "get") else 300)
        self.dp_tolerance = float(ev.get("dp_tolerance", 1.0) if hasattr(ev, "get") else 1.0)
        topk, th = self.junc_topk, self.junc_threshold

        @jax.jit
        def forward(variables, batch):
            out = self.model.apply(variables, batch, train=False)
            jloc_sm = jax.nn.softmax(out["jloc"], axis=1)
            joff = jax.nn.sigmoid(out["joff"]) - 0.5
            remask = jax.nn.softmax(out["remask"], axis=1)[:, 1]
            juncs, scores = extract_junctions(jloc_sm, joff, topk=topk, th=th)
            # f16 host shipping: remask is a probability map (precision floor
            # ~1e-3), juncs stay f32 (sub-pixel coordinates)
            return remask.astype(jnp.float16), juncs, scores

        self._forward = forward

    def _variables(self, payload):
        v = {"params": payload["params"]}
        if "batch_stats" in payload:
            v["batch_stats"] = payload["batch_stats"]
        return v

    def predict_batch(self, variables, batch: dict, reference_mirror: bool = False):
        """reference_mirror=True routes the host stage through the
        full-tile/loop-per-point tracing that mirrors the reference's
        polygon.py cost shape — ONLY for the same-chip baseline probe
        (scripts/bench_baselines.py); outputs are identical either way."""
        inputs = {k: batch[k] for k in ("images", "lidar", "lidar_mask") if k in batch}
        inputs = shard_batch(inputs, self.mesh)
        handles = self._forward(variables, inputs)
        return self._host_stage(handles, reference_mirror)

    def _host_stage(self, handles, reference_mirror: bool = False):
        """Materialize a forward's outputs and run the host polygonization.
        Separated from the device dispatch so predict_dataset can keep one
        forward in flight (double buffering — batch k's host tracing overlaps
        batch k+1's device compute, same pattern as predictor_pix2poly)."""
        remask, juncs, scores = handles
        # local rows only under multi-process SPMD (parallel.local_values)
        from ..parallel import local_values

        remask = local_values(remask, np.float32)
        juncs = local_values(juncs, np.float32)
        scores = local_values(scores, np.float32)

        S = remask.shape[-1]
        scale = self.in_size / S
        all_polys, all_scores = [], []
        for b in range(remask.shape[0]):
            mask = cv2.resize(remask[b], (self.in_size, self.in_size))
            jb = juncs[b][scores[b] > 0] * scale
            polys, pscores = polygons_from_masks(
                mask,
                jb,
                dp_tol=getattr(self, "dp_tolerance", 1.0),
                reference_mirror=reference_mirror,
            )
            all_polys.append(polys)
            all_scores.append(pscores)
        return all_polys, all_scores

    def predict_dataset(self, split: str | None = None) -> str:
        split = split or self.cfg.evaluation.split
        payload = self.load_checkpoint()
        variables = replicate(self._variables(payload), self.mesh)
        loader = build_loader(self.cfg, split, eval_mode=True)

        predictions: list[dict] = []
        t0 = time.time()
        n_images = 0

        def consume(handles, batch):
            nonlocal n_images
            polys, scores = self._host_stage(handles)
            for b in range(len(polys)):
                if not batch["sample_valid"][b]:
                    continue
                predictions.extend(
                    generate_coco_ann(polys[b], int(batch["image_id"][b]), scores[b])
                )
                n_images += 1

        # double buffering: dispatch batch k+1's forward before materializing
        # batch k, so host transfer+tracing overlap device compute
        pending = None
        for batch in loader:
            inputs = {k: batch[k] for k in ("images", "lidar", "lidar_mask") if k in batch}
            handles = self._forward(variables, shard_batch(inputs, self.mesh))
            if pending is not None:
                consume(*pending)
            pending = (handles, batch)
        if pending is not None:
            consume(*pending)
        dt = (time.time() - t0) / max(n_images, 1)
        self.logger.info(f"prediction: {dt:.4f} [s/image] over {n_images} images")
        pred_file = self.cfg.evaluation.pred_file
        save_annotations(predictions, pred_file)
        with open(pred_file.replace(".json", "_time.json"), "w") as f:
            json.dump({"prediction_time": dt, "num_images": n_images}, f)
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
        polys, _ = self.predict_batch(variables, batch)
        self.plot_prediction(image, polys[0], out_file)
        return polys[0]
