"""Differentiable optimal transport with a dustbin, in log space.

Behavioral spec: models/pix2poly/model_pix2poly.py:35-66 (SuperGlue-style
log_optimal_transport). The python loop over sinkhorn iterations becomes a
`lax.scan`, so the 100-iteration schedule is a single fused XLA while-body.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def log_sinkhorn(Z: jnp.ndarray, log_mu: jnp.ndarray, log_nu: jnp.ndarray, iters: int) -> jnp.ndarray:
    """Z: (B, M, N); log_mu: (B, M); log_nu: (B, N)."""

    def body(carry, _):
        u, v = carry
        u = log_mu - jax.nn.logsumexp(Z + v[:, None, :], axis=2)
        v = log_nu - jax.nn.logsumexp(Z + u[:, :, None], axis=1)
        return (u, v), None

    u0 = jnp.zeros_like(log_mu)
    v0 = jnp.zeros_like(log_nu)
    (u, v), _ = jax.lax.scan(body, (u0, v0), None, length=iters)
    return Z + u[:, :, None] + v[:, None, :]


def log_optimal_transport(scores: jnp.ndarray, alpha: jnp.ndarray, iters: int) -> jnp.ndarray:
    """Augment scores with a dustbin row/col, run Sinkhorn, return (B, M+1, N+1).

    scores: (B, M, N); alpha: scalar dustbin score (learnable).
    """
    b, m, n = scores.shape
    ms = jnp.float32(m)
    ns = jnp.float32(n)

    alpha = jnp.broadcast_to(jnp.asarray(alpha, scores.dtype), (b, 1, 1))
    bins0 = jnp.broadcast_to(alpha, (b, m, 1))
    bins1 = jnp.broadcast_to(alpha, (b, 1, n))

    couplings = jnp.concatenate(
        [
            jnp.concatenate([scores, bins0], axis=-1),
            jnp.concatenate([bins1, alpha], axis=-1),
        ],
        axis=1,
    )  # (B, M+1, N+1)

    norm = -jnp.log(ms + ns)
    log_mu = jnp.concatenate([jnp.full((m,), norm), jnp.array([jnp.log(ns) + norm])])
    log_nu = jnp.concatenate([jnp.full((n,), norm), jnp.array([jnp.log(ms) + norm])])
    log_mu = jnp.broadcast_to(log_mu[None], (b, m + 1))
    log_nu = jnp.broadcast_to(log_nu[None], (b, n + 1))

    Z = log_sinkhorn(couplings, log_mu, log_nu, iters)
    return Z - norm
