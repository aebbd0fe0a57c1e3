"""Jitted Pix2Poly train/val steps.

Loss spec from the reference (train/trainer_pix2poly.py:87-93, 284-351):
teacher forcing with y_input = y[:, :-1] / y_expected = y[:, 1:];
vertex loss = CE over tokens ignoring PAD; permutation loss = BCE between the
Sinkhorn-softmaxed score matrix and the GT permutation; total =
vertex_loss_weight * CE + perm_loss_weight * BCE.

DDP's gradient all-reduce is replaced by data sharding: the step is jitted
over a mesh-sharded batch, gradients come out mesh-averaged by construction.
"""

from __future__ import annotations

from functools import partial
import jax
import jax.numpy as jnp
import optax

from .state import TrainState


def model_inputs(batch) -> dict:
    return {k: batch[k] for k in ("images", "lidar", "lidar_mask") if k in batch}


def token_ce_loss(logits, targets, pad_idx):
    """Cross-entropy over tokens, ignoring PAD targets (mean over valid)."""
    mask = (targets != pad_idx).astype(jnp.float32)
    ce = optax.softmax_cross_entropy_with_integer_labels(
        logits.astype(jnp.float32), targets
    )
    return (ce * mask).sum() / jnp.maximum(mask.sum(), 1.0)


def perm_bce_loss(perm, gt_perm):
    """BCE on probabilities (torch nn.BCELoss semantics, mean over elements)."""
    p = jnp.clip(perm.astype(jnp.float32), 1e-7, 1.0 - 1e-7)
    g = gt_perm.astype(jnp.float32)
    return -(g * jnp.log(p) + (1.0 - g) * jnp.log(1.0 - p)).mean()


def make_train_step(model, vertex_w: float, perm_w: float, pad_idx: int):
    @partial(jax.jit, donate_argnums=(0,))
    def train_step(state: TrainState, batch: dict, rng: jax.Array):
        y = batch["y"]
        y_input = y[:, :-1]
        y_expected = y[:, 1:]

        def loss_fn(params):
            variables = {"params": params}
            if state.batch_stats is not None:
                variables["batch_stats"] = state.batch_stats
            (logits, perm), mut = model.apply(
                variables,
                model_inputs(batch),
                y_input,
                train=True,
                mutable=["batch_stats"],
                rngs={"lidar_dropout": rng},
            )
            ce = token_ce_loss(logits, y_expected, pad_idx)
            bce = perm_bce_loss(perm, batch["y_perm"])
            loss = vertex_w * ce + perm_w * bce
            return loss, (mut.get("batch_stats"), ce, bce)

        (loss, (bs, ce, bce)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params
        )
        state = state.apply_gradients(grads=grads)
        if bs is not None:
            state = state.replace(batch_stats=bs)
        metrics = {"loss": loss, "vertex_loss": ce, "perm_loss": bce}
        return state, metrics

    return train_step


def make_val_step(model, vertex_w: float, perm_w: float, pad_idx: int):
    @jax.jit
    def val_step(state: TrainState, batch: dict):
        y = batch["y"]
        y_input = y[:, :-1]
        y_expected = y[:, 1:]
        variables = {"params": state.params}
        if state.batch_stats is not None:
            variables["batch_stats"] = state.batch_stats
        logits, perm = model.apply(variables, model_inputs(batch), y_input, train=False)
        ce = token_ce_loss(logits, y_expected, pad_idx)
        bce = perm_bce_loss(perm, batch["y_perm"])
        return {"loss": vertex_w * ce + perm_w * bce, "vertex_loss": ce, "perm_loss": bce}

    return val_step
