"""Pix2Poly predictor: KV-cached batch generation → Hungarian assignment →
cycle-merge polygon assembly → COCO json.

Capability parity with reference predict/predictor_pix2poly.py:
- test_generate :154-211 → jitted greedy_generate (O(L) with KV cache);
- scores_to_permutations :307-319 (scipy Hungarian on raw scores);
- permutations_to_polygons :213-284 (successor-chain merge into closed rings);
- postprocess :286-305 (EOS truncation + tokenizer decode);
- predict_dataset / timing "[s/image]" :42-58.
"""

from __future__ import annotations

import json
import os
import time

import jax
import numpy as np
from scipy.optimize import linear_sum_assignment

from ..data.loader import build_loader
from ..models.pix2poly import Pix2Poly, Tokenizer, build_pix2poly, greedy_generate
from ..parallel import make_mesh, replicate, shard_batch
from ..utils.coco import generate_coco_ann, save_annotations
from .predictor import Predictor


def scores_to_permutations(scores: np.ndarray) -> np.ndarray:
    """Hungarian-optimal hard permutation per sample (raw score maximization)."""
    B, N, _ = scores.shape
    perm = np.zeros_like(scores)
    for b in range(B):
        r, c = linear_sum_assignment(-scores[b])
        perm[b, r, c] = 1
    return perm


def permutations_to_polygons(perm: np.ndarray, vertices: np.ndarray) -> list[list[np.ndarray]]:
    """Assemble polygons by following successor links.

    perm: (B, N, N) hard permutation; vertices: (B, N, 2) (x, y) coords where
    row i corresponds to perm slot i (rows beyond the decoded vertex count
    must have perm[i, i] == 1 so they are skipped).
    Returns per-sample lists of (V, 2) open rings.
    """
    B, N, _ = perm.shape
    out: list[list[np.ndarray]] = []
    for b in range(B):
        real = ~(perm[b, np.arange(N), np.arange(N)] > 0.5)
        idx = np.nonzero(real)[0]
        polys_b: list[np.ndarray] = []
        if len(idx):
            sub = perm[b][np.ix_(idx, idx)]
            succ = np.argmax(sub, axis=1)
            chains = [[i, int(succ[i])] for i in range(len(idx))]
            chains = _bubble_merge(chains)
            for chain in chains:
                if len(chain) >= 2 and chain[0] == chain[-1]:
                    chain = chain[:-1]
                if len(chain) >= 3:
                    polys_b.append(vertices[b][idx[chain]])
        out.append(polys_b)
    return out


def _bubble_merge(chains: list[list[int]]) -> list[list[int]]:
    """Merge chains whose head matches another chain's tail
    (reference bubble_merge, predictor_pix2poly.py:218-234), iteratively."""
    merged = True
    while merged:
        merged = False
        s = 0
        while s < len(chains):
            head = chains[s][-1]
            t = s + 1
            while t < len(chains):
                if chains[t][0] == head:
                    chains[s] = chains[s] + chains[t][1:]
                    del chains[t]
                    merged = True
                    head = chains[s][-1]
                    t = s + 1
                else:
                    t += 1
            s += 1
    return chains


class Pix2PolyPredictor(Predictor):
    def __init__(self, cfg):
        super().__init__(cfg)
        self.tokenizer = Tokenizer(cfg)
        from ..train.state import compute_dtype

        self.model = build_pix2poly(cfg, self.tokenizer, dtype=compute_dtype(cfg))
        self.mesh = make_mesh()
        self._gen = jax.jit(
            lambda v, b: greedy_generate(
                self.model,
                v,
                b,
                bos_code=self.tokenizer.BOS_code,
                generation_steps=int(cfg.experiment.model.tokenizer.generation_steps),
                raw_scores=True,
                # early exit: stop decoding once every sequence in the batch
                # emitted EOS (the AR decode is latency-bound; trained models
                # finish in ~50-200 of the 385 steps)
                eos_code=self.tokenizer.EOS_code,
            )
        )

    def _variables(self, payload) -> dict:
        v = {"params": payload["params"]}
        if "batch_stats" in payload:
            v["batch_stats"] = payload["batch_stats"]
        return v

    def decode_async(self, variables, batch: dict):
        """Enqueue the device decode and return unmaterialized device arrays
        (tokens, scores).  JAX dispatch is async, so the caller can keep a
        batch in flight while assembling the previous one on host — the
        device→host score/token transfer of batch k then overlaps batch k+1's
        decode (predict_dataset's pipeline)."""
        inputs = {k: batch[k] for k in ("images", "lidar", "lidar_mask") if k in batch}
        inputs = shard_batch(inputs, self.mesh)
        return self._gen(variables, inputs)

    def predict_batch(self, variables, batch: dict) -> tuple[list, np.ndarray]:
        """Returns (per-sample polygon lists, tokens)."""
        tokens, scores = self.decode_async(variables, batch)
        return self.assemble(tokens, scores)

    def assemble(self, tokens, scores) -> tuple[list, np.ndarray]:
        """Host half: materialize + Hungarian + successor-chain merge.
        Under multi-process SPMD each rank assembles only its local rows
        (parallel.local_values) — the caller merges via all_gather_objects."""
        from ..parallel import local_values

        tokens = local_values(tokens)
        scores = local_values(scores, np.float32)

        B = tokens.shape[0]
        nmax = self.tokenizer.max_num_vertices
        vertices = np.zeros((B, nmax, 2), np.float32)
        counts = np.zeros((B,), int)
        for b in range(B):
            seq = np.concatenate([[self.tokenizer.BOS_code], tokens[b]])
            coords = self.tokenizer.decode(seq)  # (V, 2) in (y, x)
            n = min(len(coords), nmax)
            if n:
                vertices[b, :n] = coords[:n, ::-1]  # → (x, y)
            counts[b] = n
            # bias the region past the decoded vertex count to self-link
            # BEFORE Hungarian: decoder features there are junk (zeroed under
            # the early-exit decode, raw garbage under the fixed-length one —
            # the reference runs Hungarian on that garbage, letting it steal
            # valid columns), so pin the assignment to the valid block
            scores[b, n:, :] = -1e9
            scores[b, :, n:] = -1e9
            scores[b, range(n, nmax), range(n, nmax)] = 1e9
        perm = scores_to_permutations(scores)
        for b in range(B):
            n = counts[b]
            # force perm rows beyond decoded vertices to self-link
            perm[b, n:, :] = 0
            perm[b, :, n:] = 0
            perm[b, range(n, nmax), range(n, nmax)] = 1
        return permutations_to_polygons(perm, vertices), tokens

    def predict_dataset(self, split: str | None = None) -> str:
        split = split or self.cfg.evaluation.split
        payload = self.load_checkpoint()
        variables = replicate(self._variables(payload), self.mesh)
        # eval can run a larger batch than training (AR decode is
        # latency-bound; the batch-scan in BENCH_TABLE peaks ≥128) —
        # per-tile outputs are batch-size-invariant
        bs = self.cfg.evaluation.get("batch_size")
        loader = build_loader(
            self.cfg,
            split,
            tokenizer=self.tokenizer,
            eval_mode=True,
            batch_size=int(bs) if bs else None,
        )

        predictions: list[dict] = []
        t0 = time.time()
        n_images = 0

        def drain(entry) -> None:
            nonlocal n_images
            (tokens, scores), batch = entry
            polys, _ = self.assemble(tokens, scores)
            for b, image_polys in enumerate(polys):
                if not batch["sample_valid"][b]:
                    continue
                predictions.extend(
                    generate_coco_ann(image_polys, int(batch["image_id"][b]))
                )
                n_images += 1

        # keep one decode in flight: batch k's host assembly + score/token
        # download overlap batch k+1's device decode
        inflight: list = []
        for batch in loader:
            inflight.append((self.decode_async(variables, batch), batch))
            if len(inflight) > 1:
                drain(inflight.pop(0))
        while inflight:
            drain(inflight.pop(0))
        dt = (time.time() - t0) / max(n_images, 1)
        self.logger.info(f"prediction: {dt:.4f} [s/image] over {n_images} images")

        pred_file = self.cfg.evaluation.pred_file
        save_annotations(predictions, pred_file)
        # reference stores timing alongside (predictor_pix2poly.py:52-58)
        with open(pred_file.replace(".json", "_time.json"), "w") as f:
            json.dump({"prediction_time": dt, "num_images": n_images}, f)
        self.logger.info(f"wrote {len(predictions)} predictions to {pred_file}")
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
        batch["sample_valid"] = np.ones((1,), bool)
        batch["image_id"] = np.zeros((1,), np.int32)
        polys, _ = self.predict_batch(variables, batch)
        self.plot_prediction(image, polys[0], out_file)
        return polys[0]
