"""Segment reductions over flat-packed variable-length structures.

TPU-native replacement for the torch_scatter CSR ops the reference's ASM
polygonizer uses (predict/ffl/polygonize_asm.py:263-300 gather_csr /
segment_max_csr / segment_sum_csr): here everything is padded/flat with
explicit ids, so `jax.ops.segment_*` applies directly and stays jittable.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def segment_sum(data, segment_ids, num_segments):
    return jax.ops.segment_sum(data, segment_ids, num_segments=num_segments)


def segment_max(data, segment_ids, num_segments):
    return jax.ops.segment_max(data, segment_ids, num_segments=num_segments)


def segment_mean(data, segment_ids, num_segments, eps: float = 1e-12):
    s = jax.ops.segment_sum(data, segment_ids, num_segments=num_segments)
    ones = jnp.ones(data.shape[: segment_ids.ndim], dtype=data.dtype)
    n = jax.ops.segment_sum(ones, segment_ids, num_segments=num_segments)
    n = n.reshape(n.shape + (1,) * (s.ndim - n.ndim))
    return s / jnp.maximum(n, eps)


def segment_softmax_weights(score, segment_ids, num_segments):
    """Softmax within segments (used for attention-style pooling)."""
    m = jax.ops.segment_max(score, segment_ids, num_segments=num_segments)
    score = score - m[segment_ids]
    e = jnp.exp(score)
    z = jax.ops.segment_sum(e, segment_ids, num_segments=num_segments)
    return e / jnp.maximum(z[segment_ids], 1e-12)


def run_starts(sorted_ids: jnp.ndarray) -> jnp.ndarray:
    """Boolean mask marking the first element of each equal-id run."""
    prev = jnp.concatenate([jnp.full((1,), -1, sorted_ids.dtype), sorted_ids[:-1]])
    return sorted_ids != prev


def rank_in_run(sorted_ids: jnp.ndarray) -> jnp.ndarray:
    """0-based position of each element within its equal-id run.

    `sorted_ids` must be sorted. Implemented with an associative max-scan of
    run-start indices — O(N log N) depth, fully on-device.
    """
    n = sorted_ids.shape[0]
    idx = jnp.arange(n, dtype=jnp.int32)
    starts = run_starts(sorted_ids)
    start_idx = jnp.where(starts, idx, 0)
    run_start = jax.lax.associative_scan(jnp.maximum, start_idx)
    return idx - run_start
