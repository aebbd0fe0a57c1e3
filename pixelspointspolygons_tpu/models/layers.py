"""Shared flax building blocks for the model zoo.

Includes exact functional equivalents of torch layers the reference leans on
(AdaptiveAvgPool1d channel bottleneck, post-norm TransformerDecoderLayer) —
re-implemented, not translated: attention is einsum-based so the KV-cached
decode path (absent in the reference, SURVEY.md §3 hot-loop (b)) can reuse
the same projection weights.
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

Dtype = Any


def adaptive_avg_pool1d(x: jnp.ndarray, out_size: int) -> jnp.ndarray:
    """torch.nn.AdaptiveAvgPool1d over the last axis.

    Matches the reference's channel bottleneck 384→256
    (models/vision_transformer/vit.py:41 uses it on (B, L, C)).
    """
    in_size = x.shape[-1]
    if in_size == out_size:
        return x
    # torch semantics: window i = [floor(i*in/out), ceil((i+1)*in/out))
    starts = (jnp.arange(out_size) * in_size) // out_size
    ends = -((-(jnp.arange(1, out_size + 1) * in_size)) // out_size)
    # build a (in, out) averaging matrix once (static shapes)
    idx = jnp.arange(in_size)[:, None]
    mask = (idx >= starts[None, :]) & (idx < ends[None, :])
    w = mask.astype(x.dtype) / (ends - starts).astype(x.dtype)[None, :]
    return x @ w


class MlpBlock(nn.Module):
    hidden_dim: int
    out_dim: int
    dropout: float = 0.0
    dtype: Dtype = jnp.float32
    activation: str = "gelu"

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
        x = nn.Dense(self.hidden_dim, dtype=self.dtype)(x)
        # exact (erf) GELU — torch nn.GELU parity for ported timm weights
        x = nn.gelu(x, approximate=False) if self.activation == "gelu" else nn.relu(x)
        x = nn.Dropout(self.dropout)(x, deterministic=deterministic)
        x = nn.Dense(self.out_dim, dtype=self.dtype)(x)
        return x


class MultiHeadAttention(nn.Module):
    """Explicit q/k/v/o projections; supports external K/V and additive bias."""

    dim: int
    num_heads: int
    dropout: float = 0.0
    dtype: Dtype = jnp.float32

    def setup(self):
        self.q_proj = nn.Dense(self.dim, dtype=self.dtype, name="q")
        self.k_proj = nn.Dense(self.dim, dtype=self.dtype, name="k")
        self.v_proj = nn.Dense(self.dim, dtype=self.dtype, name="v")
        self.o_proj = nn.Dense(self.dim, dtype=self.dtype, name="o")

    def project_kv(self, kv_src: jnp.ndarray):
        """Precompute K/V (e.g. cross-attention memory) once."""
        return self.k_proj(kv_src), self.v_proj(kv_src)

    def attend(
        self,
        q_src: jnp.ndarray,
        k: jnp.ndarray,
        v: jnp.ndarray,
        bias: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
    ) -> jnp.ndarray:
        """q_src: (B, Lq, D); k, v: (B, Lk, D); bias: broadcastable to
        (B, H, Lq, Lk) additive logits bias (use -inf/-1e9 to mask)."""
        B, Lq, _ = q_src.shape
        H = self.num_heads
        Dh = self.dim // H
        q = self.q_proj(q_src).reshape(B, Lq, H, Dh)
        kh = k.reshape(B, -1, H, Dh)
        vh = v.reshape(B, -1, H, Dh)
        logits = jnp.einsum("bqhd,bkhd->bhqk", q, kh) / jnp.sqrt(Dh).astype(self.dtype)
        if bias is not None:
            logits = logits + bias
        w = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(self.dtype)
        out = jnp.einsum("bhqk,bkhd->bqhd", w, vh).reshape(B, Lq, self.dim)
        return self.o_proj(out)

    def __call__(self, q_src, kv_src, bias=None, deterministic: bool = True):
        k, v = self.project_kv(kv_src)
        return self.attend(q_src, k, v, bias=bias, deterministic=deterministic)


class ConvBNReLU(nn.Module):
    """Conv → BatchNorm → ReLU (NHWC). BN stats sync across the data-sharded
    batch automatically under jit (the SyncBatchNorm equivalent)."""

    features: int
    kernel: tuple[int, int] = (3, 3)
    strides: tuple[int, int] = (1, 1)
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        x = nn.Conv(self.features, self.kernel, self.strides, padding="SAME", dtype=self.dtype)(x)
        x = nn.BatchNorm(momentum=0.9, use_running_average=not train, dtype=self.dtype)(x)
        return nn.relu(x)


def causal_bias(length: int, dtype=jnp.float32) -> jnp.ndarray:
    """(1, 1, L, L) additive causal mask."""
    mask = jnp.tril(jnp.ones((length, length), bool))
    return jnp.where(mask, 0.0, -1e9).astype(dtype)[None, None]


def padding_bias(pad_mask: jnp.ndarray, dtype=jnp.float32) -> jnp.ndarray:
    """pad_mask: (B, Lk) True where PAD → (B, 1, 1, Lk) additive bias."""
    return jnp.where(pad_mask, -1e9, 0.0).astype(dtype)[:, None, None, :]
