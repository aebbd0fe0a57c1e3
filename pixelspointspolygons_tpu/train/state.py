"""Train state + optimizers.

The reference's per-model optimizer recipes (train/trainer_pix2poly.py:38-77
AdamW β=(0.9,0.95) + linear warmup-decay with 5% warmup;
trainer_hisup.py:48-63 AdamW + cosine; trainer_ffl.py:38-54 Adam + cosine)
re-expressed with optax. State bundles params + batch_stats (flax BN).
"""

from __future__ import annotations

from typing import Any

import jax
import optax
from flax.training import train_state


class TrainState(train_state.TrainState):
    batch_stats: Any = None


def linear_warmup_decay(base_lr: float, total_steps: int, warmup_frac: float = 0.05):
    warmup = max(int(total_steps * warmup_frac), 1)
    return optax.join_schedules(
        [
            optax.linear_schedule(0.0, base_lr, warmup),
            optax.linear_schedule(base_lr, 0.0, max(total_steps - warmup, 1)),
        ],
        [warmup],
    )


def cosine_with_warmup(base_lr: float, total_steps: int, warmup_frac: float = 0.0):
    warmup = int(total_steps * warmup_frac)
    return optax.warmup_cosine_decay_schedule(
        0.0 if warmup else base_lr, base_lr, warmup, max(total_steps, 1)
    )


def make_optimizer(name: str, schedule, weight_decay: float = 0.0, b1=0.9, b2=0.999):
    if name == "adamw":
        return optax.adamw(schedule, b1=b1, b2=b2, weight_decay=weight_decay)
    if name == "adam":
        return optax.adam(schedule, b1=b1, b2=b2)
    raise ValueError(name)


def create_train_state(model, variables, tx) -> TrainState:
    return TrainState.create(
        apply_fn=model.apply,
        params=variables["params"],
        batch_stats=variables.get("batch_stats"),
        tx=tx,
    )


def num_params(params) -> int:
    return sum(x.size for x in jax.tree_util.tree_leaves(params))


def compute_dtype(cfg):
    """jnp dtype from cfg.host.compute_dtype (bfloat16 halves MXU time on TPU;
    params remain float32 — flax `dtype` is compute-only)."""
    import jax.numpy as jnp

    name = str(cfg.host.get("compute_dtype", "float32")).lower()
    return jnp.bfloat16 if name in ("bf16", "bfloat16") else jnp.float32


def model_summary(params, max_depth: int = 3) -> str:
    """Human-readable parameter tree with shapes and counts (the reference's
    torchview plot_model_architecture equivalent, text form)."""
    lines = []

    def rec(node, name, depth):
        if isinstance(node, dict) and depth < max_depth:
            total = num_params(node)
            lines.append(f"{'  ' * depth}{name}: {total/1e6:.3f}M")
            for k in sorted(node):
                rec(node[k], k, depth + 1)
        else:
            total = num_params(node) if isinstance(node, dict) else node.size
            lines.append(f"{'  ' * depth}{name}: {total/1e6:.3f}M")

    rec(params, "model", 0)
    return "\n".join(lines)
