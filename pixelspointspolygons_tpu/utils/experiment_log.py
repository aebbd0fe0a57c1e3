"""Experiment logging: wandb-compatible surface with a local JSONL backend.

The reference logs per-epoch losses/metrics/images to wandb keyed by
experiment/group/project (train/trainer.py:71-92). The wandb package is not
available in this environment, so `RunLogger` provides the same call surface
(`log`, `log_image`, `finish`) writing to <output_dir>/runs/<name>.jsonl and
an images/ directory — and transparently uses the real wandb when importable
and cfg.run_type.log_to_wandb is set.
"""

from __future__ import annotations

import json
import os
import time
from typing import Any, Optional


class RunLogger:
    def __init__(self, cfg, enabled: Optional[bool] = None):
        self.cfg = cfg
        if enabled is None:
            import jax

            # rank-0-only run logging under multi-process SPMD
            enabled = bool(cfg.run_type.log_to_wandb) and jax.process_index() == 0
        self.enabled = enabled
        self._wandb = None
        self._file = None
        if not self.enabled:
            return
        try:
            import wandb  # type: ignore

            self._wandb = wandb
            wandb.init(
                project=cfg.experiment.project_name,
                group=cfg.experiment.group_name,
                name=cfg.experiment.name,
                config=cfg.to_dict(),
            )
        except Exception:
            run_dir = os.path.join(cfg.output_dir, "runs")
            os.makedirs(run_dir, exist_ok=True)
            path = os.path.join(run_dir, f"{cfg.experiment.name}.jsonl")
            self._file = open(path, "a")
            self._file.write(
                json.dumps({"_type": "config", "config": cfg.to_dict(), "t": time.time()})
                + "\n"
            )
            self.image_dir = os.path.join(run_dir, "images")

    def log(self, metrics: dict, step: int | None = None) -> None:
        if not self.enabled:
            return
        if self._wandb is not None:
            self._wandb.log(metrics, step=step)
            return
        rec = {"_type": "metrics", "step": step, "t": time.time()}
        rec.update({k: float(v) for k, v in metrics.items() if _is_num(v)})
        self._file.write(json.dumps(rec) + "\n")
        self._file.flush()

    def log_image(self, name: str, image, step: int | None = None) -> None:
        if not self.enabled:
            return
        if self._wandb is not None:
            self._wandb.log({name: self._wandb.Image(image)}, step=step)
            return
        import numpy as np
        import cv2

        os.makedirs(self.image_dir, exist_ok=True)
        arr = np.asarray(image)
        if arr.dtype != "uint8":
            arr = (np.clip(arr, 0, 1) * 255).astype("uint8")
        path = os.path.join(self.image_dir, f"{name.replace('/', '_')}_{step or 0}.png")
        cv2.imwrite(path, arr[..., ::-1] if arr.ndim == 3 else arr)

    def finish(self) -> None:
        if self._wandb is not None:
            self._wandb.finish()
        if self._file is not None:
            self._file.close()


def _is_num(v: Any) -> bool:
    try:
        float(v)
        return True
    except (TypeError, ValueError):
        return False
