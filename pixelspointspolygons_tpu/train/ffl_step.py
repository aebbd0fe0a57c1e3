"""Jitted FFL train/val steps (factored out of the trainer so the multi-chip
dryrun and bench harness can build the identical step; loss recipe:
models/ffl/losses.py MultiLoss, reference train/trainer_ffl.py:38-59)."""

from __future__ import annotations

from functools import partial

import jax


def _inputs(batch: dict) -> dict:
    return {k: batch[k] for k in ("images", "lidar", "lidar_mask") if k in batch}


def make_train_step(model, loss_fn_raw, normalize: bool = False):
    """normalize=True threads per-term running norms (a dict of scalars) into
    the loss (cfg-gated reference norm-normalization, losses.py:21-69)."""

    @partial(jax.jit, donate_argnums=(0,))
    def train_step(state, batch, weights, norms=None):
        def loss_fn(params):
            variables = {"params": params}
            if state.batch_stats is not None:
                variables["batch_stats"] = state.batch_stats
            outputs, mut = model.apply(
                variables, _inputs(batch), train=True, mutable=["batch_stats"]
            )
            if normalize:
                total, losses = loss_fn_raw(outputs, batch, weights, norms)
            else:
                total, losses = loss_fn_raw(outputs, batch, weights)
            return total, (mut.get("batch_stats"), losses)

        (loss, (bs, losses)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params
        )
        new_state = state.apply_gradients(grads=grads)
        if bs is not None:
            new_state = new_state.replace(batch_stats=bs)
        return new_state, {"loss": loss, **losses}

    return train_step


def make_val_step(model, loss_fn_raw):
    @jax.jit
    def val_step(state, batch, weights):
        variables = {"params": state.params}
        if state.batch_stats is not None:
            variables["batch_stats"] = state.batch_stats
        outputs = model.apply(variables, _inputs(batch), train=False)
        total, losses = loss_fn_raw(outputs, batch, weights)
        return {"loss": total, **losses}

    return val_step
