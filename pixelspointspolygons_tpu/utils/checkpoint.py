"""Checkpointing with the reference's save/restore policy on orbax.

Policy parity (reference train/trainer.py:109-201): checkpoints named
best_val_loss / best_val_iou / latest / epoch_%d; payload carries params,
batch_stats, opt_state, epoch, best metrics, and the resolved config (for
the modality-compatibility check on resume, trainer.py:176-188).
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp

from ..config.engine import Config, to_yaml
import yaml


class CheckpointManager:
    def __init__(self, output_dir: str):
        self.ckpt_dir = os.path.join(os.path.abspath(output_dir), "checkpoints")
        os.makedirs(self.ckpt_dir, exist_ok=True)
        self._ckptr = ocp.StandardCheckpointer()

    def path(self, name: str) -> str:
        return os.path.join(self.ckpt_dir, str(name))

    def save(self, name: str, state, epoch: int, cfg=None, extra: Optional[dict] = None) -> None:
        # Under multi-process SPMD every rank must call save: orbax's async
        # checkpointer runs internal cross-process barriers
        # (_Checkpointer:save_start / save_end), so a torch-style rank-0-only
        # gate (reference train/trainer.py:109) deadlocks rank 0 against the
        # barrier. Orbax itself does the rank-0-only filesystem writes; the
        # save/not-save decisions are identical on all ranks because val
        # metrics are global (collective means + all_gather_objects).
        payload = {
            "params": jax.device_get(state.params),
            "opt_state": jax.device_get(state.opt_state),
            "step": np.asarray(state.step),
            "epoch": np.asarray(epoch),
        }
        if state.batch_stats is not None:
            payload["batch_stats"] = jax.device_get(state.batch_stats)
        for k, v in (extra or {}).items():
            payload[k] = np.asarray(v)
        path = self.path(name)
        self._ckptr.save(path, payload, force=True)
        self._ckptr.wait_until_finished()
        if cfg is not None and jax.process_index() == 0:
            with open(os.path.join(path, "config.yaml"), "w") as f:
                f.write(to_yaml(cfg))

    def restore(self, name: str, state_template=None) -> dict:
        """`state_template` (a TrainState) restores opt_state with its proper
        optax NamedTuple structure — orbax alone returns plain dicts."""
        path = self.path(name)
        if not os.path.isdir(path):
            raise FileNotFoundError(f"checkpoint {name!r} not found under {self.ckpt_dir}")
        target = None
        if state_template is not None:
            target = {
                "params": jax.device_get(state_template.params),
                "opt_state": jax.device_get(state_template.opt_state),
                "step": np.asarray(state_template.step),
                "epoch": np.asarray(0),
                "best_val_loss": np.asarray(0.0),
                "best_val_iou": np.asarray(0.0),
            }
            if state_template.batch_stats is not None:
                target["batch_stats"] = jax.device_get(state_template.batch_stats)
        payload = self._ckptr.restore(path, target) if target is not None else self._ckptr.restore(path)
        cfg_file = os.path.join(path, "config.yaml")
        if os.path.isfile(cfg_file):
            with open(cfg_file) as f:
                payload["cfg"] = Config.from_dict(yaml.safe_load(f))
        return payload

    def exists(self, name: str) -> bool:
        return os.path.isdir(self.path(name))

    def check_modality_compat(self, ckpt_cfg, cfg) -> None:
        """Refuse to load weights across modality mismatches (trainer.py:176-188)."""
        if ckpt_cfg is None:
            return
        a = ckpt_cfg.get_path("experiment.encoder.use_images"), ckpt_cfg.get_path(
            "experiment.encoder.use_lidar"
        )
        b = cfg.get_path("experiment.encoder.use_images"), cfg.get_path(
            "experiment.encoder.use_lidar"
        )
        if a != b:
            raise ValueError(
                f"checkpoint modality {a} does not match config modality {b}"
            )


def smart_restore_params(target: Any, loaded: Any, logger=None) -> Any:
    """Fuzzy parameter restore (reference misc/shared_utils.py:67-118
    smart_load_state_dict): exact path first, then unique suffix match with
    identical shape (absorbs wrapper-prefix renames across versions).
    Unmatched target leaves keep their initialized values."""
    import jax

    def flatten(tree):
        flat = {}

        def rec(node, path):
            if isinstance(node, dict):
                for k, v in node.items():
                    rec(v, path + (k,))
            else:
                flat[path] = node

        rec(tree, ())
        return flat

    tflat = flatten(target)
    lflat = flatten(loaded)
    out = dict(tflat)
    used = set()
    for path, leaf in tflat.items():
        if path in lflat and np.shape(lflat[path]) == np.shape(leaf):
            out[path] = lflat[path]
            used.add(path)
            continue
        # longest-common-suffix matching (absorbs differing wrapper prefixes)
        matched = False
        for k in range(len(path), 0, -1):
            suffix = path[-k:]
            cands = [
                lp
                for lp in lflat
                if lp not in used
                and lp[-k:] == suffix
                and np.shape(lflat[lp]) == np.shape(leaf)
            ]
            if len(cands) == 1:
                out[path] = lflat[cands[0]]
                used.add(cands[0])
                matched = True
                break
            if len(cands) > 1:
                break  # ambiguous at this depth; shorter suffixes only get worse
        if not matched and logger is not None:
            logger.warning(f"checkpoint: no match for {'/'.join(path)} — keeping init")

    # rebuild nested dict
    rebuilt: dict = {}
    for path, leaf in out.items():
        node = rebuilt
        for k in path[:-1]:
            node = node.setdefault(k, {})
        node[path[-1]] = leaf
    return rebuilt


def save_best_and_latest(
    manager: CheckpointManager,
    state,
    epoch: int,
    cfg,
    val_loss: float,
    val_iou: Optional[float],
    best: dict,
    save_every: int = 10,
) -> dict:
    """The reference's best/latest/epoch_N policy (trainer.py:126-148)."""
    # Every rank must reach the same save/skip decision or orbax's internal
    # cross-process save barriers hang (see CheckpointManager.save). Val
    # metrics are global by construction, but rather than rely on bitwise
    # agreement of host-side float reductions, all ranks adopt rank 0's
    # decision explicitly.
    decision = {
        "save_loss": bool(cfg.training.save_best and val_loss < best.get("val_loss", np.inf)),
        "save_iou": bool(
            cfg.training.save_best and val_iou is not None and val_iou > best.get("val_iou", 0.0)
        ),
        "val_loss": float(val_loss),
        "val_iou": None if val_iou is None else float(val_iou),
    }
    if jax.process_count() > 1:
        from ..parallel import all_gather_objects

        decision = all_gather_objects(decision)[0]
    extra = {
        "best_val_loss": best.get("val_loss", np.inf),
        "best_val_iou": best.get("val_iou", 0.0),
    }
    if cfg.training.save_latest:
        manager.save("latest", state, epoch, cfg, extra)
    if decision["save_loss"]:
        best["val_loss"] = decision["val_loss"]
        extra["best_val_loss"] = best["val_loss"]
        manager.save("best_val_loss", state, epoch, cfg, extra)
    if decision["save_iou"]:
        best["val_iou"] = decision["val_iou"]
        extra["best_val_iou"] = best["val_iou"]
        manager.save("best_val_iou", state, epoch, cfg, extra)
    if save_every and epoch % save_every == 0:
        manager.save(f"epoch_{epoch}", state, epoch, cfg, extra)
    return best
