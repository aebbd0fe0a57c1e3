"""Jitted HiSup train/val steps (factored out of the trainer so the
multi-chip dryrun and bench harness can build the identical step;
reference loss recipe: train/trainer_hisup.py:31-63 LossReducer)."""

from __future__ import annotations

from functools import partial

import jax

from ..models.hisup.model import encode_targets, hisup_losses


def _inputs(batch: dict) -> dict:
    return {k: batch[k] for k in ("images", "lidar", "lidar_mask") if k in batch}


def make_train_step(model, weights: dict, size: int, remat: bool = False):
    """remat=True (training.remat) wraps the forward in `jax.checkpoint`:
    activations are recomputed during backward instead of stored — the
    standard TPU FLOPs-for-HBM trade that lets the 97M-param fusion_hrnet
    train with a resident multi-GB device cache on a 16 GB v5e."""

    def fwd(params, batch_stats, inputs):
        variables = {"params": params}
        if batch_stats is not None:
            variables["batch_stats"] = batch_stats
        return model.apply(variables, inputs, train=True, mutable=["batch_stats"])

    if remat:
        fwd = jax.checkpoint(fwd)

    @partial(jax.jit, donate_argnums=(0,))
    def train_step(state, batch):
        targets = encode_targets(batch, size)

        def loss_fn(params):
            outputs, mut = fwd(params, state.batch_stats, _inputs(batch))
            losses = hisup_losses(outputs, targets)
            total = sum(weights[k] * v for k, v in losses.items())
            return total, (mut.get("batch_stats"), losses)

        (loss, (bs, losses)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params
        )
        new_state = state.apply_gradients(grads=grads)
        if bs is not None:
            new_state = new_state.replace(batch_stats=bs)
        return new_state, {"loss": loss, **losses}

    return train_step


def make_val_step(model, weights: dict, size: int):
    @jax.jit
    def val_step(state, batch):
        targets = encode_targets(batch, size)
        variables = {"params": state.params}
        if state.batch_stats is not None:
            variables["batch_stats"] = state.batch_stats
        outputs = model.apply(variables, _inputs(batch), train=False)
        losses = hisup_losses(outputs, targets)
        total = sum(weights[k] * v for k, v in losses.items())
        return {"loss": total, **losses}

    return val_step
