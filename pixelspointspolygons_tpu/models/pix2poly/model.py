"""Pix2Poly: autoregressive vertex-token transformer + Sinkhorn permutation.

Capability parity with reference models/pix2poly/model_pix2poly.py (Decoder
:116-219, ScoreNet :69-112, EncoderDecoder :223-281), redesigned TPU-first:

- The torch post-norm TransformerDecoder (6L, 8H, FFN 2048, ReLU) is
  re-expressed with explicit einsum attention so the SAME weights serve both
  the teacher-forced training pass and a KV-cached greedy decode under
  `lax.scan` — the reference instead re-runs the full decoder per generated
  token (predictor_pix2poly.py:154-211, its dominant inference cost).
- Sinkhorn (100 iters) runs as a `lax.scan` (ops/sinkhorn.py).
- ScoreNet's 1x1-conv stack is a plain per-pair MLP over concatenated
  vertex-feature pairs (mathematically identical, batched on the MXU).

Greedy decode here produces token-identical sequences to full re-forward
because causal masking makes position t's logits independent of positions
> t (verified in tests/test_pix2poly.py::test_kv_cache_matches_full_forward).
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...ops.sinkhorn import log_optimal_transport
from ..layers import MlpBlock, MultiHeadAttention, causal_bias, padding_bias
from ..vit import ViTEncoder

Dtype = Any


class DecoderLayer(nn.Module):
    """Post-norm transformer decoder layer (torch nn.TransformerDecoderLayer
    default semantics: self-attn → LN, cross-attn → LN, ReLU FFN → LN)."""

    dim: int
    num_heads: int
    ffn_dim: int = 2048
    dtype: Dtype = jnp.float32

    def setup(self):
        self.self_attn = MultiHeadAttention(self.dim, self.num_heads, dtype=self.dtype)
        self.cross_attn = MultiHeadAttention(self.dim, self.num_heads, dtype=self.dtype)
        self.ffn = MlpBlock(self.ffn_dim, self.dim, dtype=self.dtype, activation="relu")
        self.norm1 = nn.LayerNorm(dtype=self.dtype)
        self.norm2 = nn.LayerNorm(dtype=self.dtype)
        self.norm3 = nn.LayerNorm(dtype=self.dtype)

    def __call__(self, x, memory, self_bias, mem_bias=None):
        x = self.norm1(x + self.self_attn(x, x, bias=self_bias))
        x = self.norm2(x + self.cross_attn(x, memory, bias=mem_bias))
        x = self.norm3(x + self.ffn(x))
        return x

    # --- KV-cached single-step path -------------------------------------
    def project_self_kv(self, x):
        return self.self_attn.project_kv(x)

    def project_cross_kv(self, memory):
        return self.cross_attn.project_kv(memory)

    def step(self, x, self_k, self_v, cross_k, cross_v, self_bias):
        """x: (B, 1, D) current position; self_k/v: (B, T, D) cache incl.
        current position; cross_k/v precomputed from memory."""
        h = self.self_attn.attend(x, self_k, self_v, bias=self_bias)
        x = self.norm1(x + h)
        h = self.cross_attn.attend(x, cross_k, cross_v)
        x = self.norm2(x + h)
        x = self.norm3(x + self.ffn(x))
        return x


class Decoder(nn.Module):
    """Token decoder with learned decoder/encoder position embeddings.

    Reference: model_pix2poly.py:116-185. `max_len` counts BOS..EOS inclusive;
    the decoder operates on max_len-1 positions (input is y[:, :-1]).
    """

    vocab_size: int
    encoder_len: int
    dim: int
    num_heads: int
    num_layers: int
    max_len: int
    pad_idx: int
    dtype: Dtype = jnp.float32

    def setup(self):
        self.embedding = nn.Embed(self.vocab_size, self.dim, dtype=self.dtype)
        self.decoder_pos_embed = self.param(
            "decoder_pos_embed", nn.initializers.normal(0.02), (1, self.max_len - 1, self.dim)
        )
        self.encoder_pos_embed = self.param(
            "encoder_pos_embed", nn.initializers.normal(0.02), (1, self.encoder_len, self.dim)
        )
        self.layers = [
            DecoderLayer(self.dim, self.num_heads, dtype=self.dtype, name=f"layer{i}")
            for i in range(self.num_layers)
        ]
        self.output = nn.Dense(self.vocab_size, dtype=self.dtype)

    def __call__(self, encoder_out, tgt):
        """Teacher-forced pass. encoder_out: (B, N, D); tgt: (B, L) int.
        Returns (logits (B, L, V), features (B, L, D))."""
        L = tgt.shape[1]
        x = self.embedding(tgt) + self.decoder_pos_embed[:, :L].astype(self.dtype)
        memory = encoder_out + self.encoder_pos_embed.astype(self.dtype)
        bias = causal_bias(L, self.dtype) + padding_bias(tgt == self.pad_idx, self.dtype)
        for layer in self.layers:
            x = layer(x, memory, bias)
        return self.output(x), x

    # --- generation -----------------------------------------------------
    def init_memory_kv(self, encoder_out):
        memory = encoder_out + self.encoder_pos_embed.astype(self.dtype)
        return [layer.project_cross_kv(memory) for layer in self.layers]

    def decode_step(self, tok, pos, cache_k, cache_v, memory_kv):
        """One greedy step.

        tok: (B,) current input token; pos: scalar int position index;
        cache_k/v: (num_layers, B, max_len-1, D) self-attn caches;
        memory_kv: list of (k, v) per layer.
        Returns (logits (B, V), feats (B, D), new_cache_k, new_cache_v).
        """
        B = tok.shape[0]
        x = self.embedding(tok)[:, None, :] + jax.lax.dynamic_slice_in_dim(
            self.decoder_pos_embed.astype(self.dtype), pos, 1, axis=1
        )
        T = self.max_len - 1
        # mask future (and not-yet-written) cache slots
        slot_ids = jnp.arange(T)
        bias = jnp.where(slot_ids[None, None, None, :] <= pos, 0.0, -1e9).astype(self.dtype)
        new_k, new_v = [], []
        for i, layer in enumerate(self.layers):
            k_cur, v_cur = layer.project_self_kv(x)  # (B, 1, D)
            ck = jax.lax.dynamic_update_slice_in_dim(cache_k[i], k_cur, pos, axis=1)
            cv = jax.lax.dynamic_update_slice_in_dim(cache_v[i], v_cur, pos, axis=1)
            new_k.append(ck)
            new_v.append(cv)
            x = layer.step(x, ck, cv, memory_kv[i][0], memory_kv[i][1], bias)
        feats = x[:, 0]
        return self.output(feats), feats, jnp.stack(new_k), jnp.stack(new_v)


class ScoreNet(nn.Module):
    """Vertex-pair scores: (B, L-1, D) decoder feats → (B, V, V).

    Reference model_pix2poly.py:69-112: drop position 0, average (y,x) token
    pairs → per-vertex features, concat all pairs, 1x1 convs 512→256→128→64→1
    with BN+ReLU. 1x1 convs over a (V, V) grid ≡ Dense over the channel dim.
    """

    n_vertices: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, feats, *, train: bool = False):
        x = feats[:, 1:]  # drop BOS position
        B, L, D = x.shape
        x = x.reshape(B, L // 2, 2, D).mean(axis=2)  # (B, V, D)
        a = jnp.tile(x[:, :, None, :], (1, 1, self.n_vertices, 1))
        b = jnp.tile(x[:, None, :, :], (1, self.n_vertices, 1, 1))
        x = jnp.concatenate([a, b], axis=-1)  # (B, V, V, 2D)
        for ch in (256, 128, 64):
            x = nn.Dense(ch, dtype=self.dtype)(x)
            x = nn.BatchNorm(momentum=0.9, use_running_average=not train, axis=-1, dtype=self.dtype)(x)
            x = nn.relu(x)
        x = nn.Dense(1, dtype=self.dtype)(x)
        return x[..., 0]


class Pix2Poly(nn.Module):
    """Full encoder-decoder + twin ScoreNets + Sinkhorn head.

    `encoder` is any module mapping the modality inputs to (B, N, D) tokens.
    """

    vocab_size: int
    encoder_len: int
    dim: int
    num_heads: int
    num_layers: int
    max_len: int
    pad_idx: int
    max_num_vertices: int
    sinkhorn_iterations: int = 100
    encoder_cfg: dict | None = None
    dtype: Dtype = jnp.float32

    def setup(self):
        enc_cfg = dict(self.encoder_cfg or {})
        enc_name = enc_cfg.pop("name", "vit")
        if enc_name == "vit":
            self.encoder = ViTEncoder(dtype=self.dtype, out_dim=self.dim, **enc_cfg)
        elif enc_name == "pointpillars_vit":
            from ..pointpillars import PointPillarsViTEncoder

            self.encoder = PointPillarsViTEncoder(dtype=self.dtype, out_dim=self.dim, **enc_cfg)
        elif enc_name == "early_fusion_vit":
            from ..fusion import EarlyFusionViTEncoder

            self.encoder = EarlyFusionViTEncoder(dtype=self.dtype, out_dim=self.dim, **enc_cfg)
        else:
            raise NotImplementedError(f"encoder {enc_name!r} for pix2poly")
        self.decoder = Decoder(
            self.vocab_size,
            self.encoder_len,
            self.dim,
            self.num_heads,
            self.num_layers,
            self.max_len,
            self.pad_idx,
            dtype=self.dtype,
        )
        self.scorenet1 = ScoreNet(self.max_num_vertices, dtype=self.dtype)
        self.scorenet2 = ScoreNet(self.max_num_vertices, dtype=self.dtype)
        self.bin_score = self.param("bin_score", nn.initializers.constant(1.0), ())

    def encode(self, batch, *, train: bool = False):
        """Dispatch on modality (reference model_pix2poly.py:245-254)."""
        kw = {}
        if "images" in batch and "lidar" in batch:
            return self.encoder(
                batch["images"], batch["lidar"], batch["lidar_mask"], train=train, **kw
            )
        if "lidar" in batch:
            return self.encoder(batch["lidar"], batch["lidar_mask"], train=train)
        return self.encoder(batch["images"])

    def raw_scores_from_feats(self, feats, *, train: bool = False):
        """scorenet1 + scorenet2ᵀ — the raw matrix the predictor's Hungarian
        assignment consumes (reference predictor_pix2poly.py:205-210 uses raw
        scores, NOT the Sinkhorn softmax)."""
        s1 = self.scorenet1(feats, train=train)
        s2 = self.scorenet2(feats, train=train)
        return s1 + jnp.transpose(s2, (0, 2, 1))

    def perm_from_feats(self, feats, *, train: bool = False):
        scores = self.raw_scores_from_feats(feats, train=train)
        Z = log_optimal_transport(
            scores.astype(jnp.float32), self.bin_score, self.sinkhorn_iterations
        )[:, : scores.shape[1], : scores.shape[2]]
        return jax.nn.softmax(Z, axis=-1)

    def __call__(self, batch, y_input, *, train: bool = False):
        """Teacher-forced training/val forward.

        Returns (seq_logits (B, L, V), perm_mat (B, V, V))."""
        enc = self.encode(batch, train=train)
        logits, feats = self.decoder(enc, y_input)
        perm = self.perm_from_feats(feats, train=train)
        return logits, perm

    # generation lives in `greedy_generate` below (functional, lax.scan-based)

    def _init_memory_kv(self, enc):
        return self.decoder.init_memory_kv(enc)

    def _decode_step(self, tok, pos, cache_k, cache_v, memory_kv):
        return self.decoder.decode_step(tok, pos, cache_k, cache_v, memory_kv)


def greedy_generate(
    model: Pix2Poly,
    variables,
    batch,
    bos_code: int,
    generation_steps: int,
    raw_scores: bool = False,
    eos_code: int | None = None,
):
    """KV-cached greedy decode.

    Produces token-identical output to the reference's full-reforward loop
    (predictor_pix2poly.py:154-211) at O(L) instead of O(L^2) decoder cost.
    Returns (tokens (B, T), perm_mat (B, V, V)); tokens[:, t] is the token
    generated AT step t (BOS not included).

    eos_code=None (default): fixed-length `lax.scan` over generation_steps —
    bit-for-bit the historical behavior (bench.py keeps this so headline
    numbers stay comparable across rounds: a fixed, well-defined amount of
    work regardless of weights).

    eos_code set: `lax.while_loop` that stops as soon as EVERY sequence in
    the batch has emitted EOS — the AR decode is latency-bound (385
    sequential steps), and trained models emit EOS after ~50-200 tokens, so
    the production predictor skips the dead tail. Once a row is done it
    emits PAD and its features are zeroed (deterministic — the scan path
    leaves garbage decoder outputs past EOS, exactly like the reference's
    fixed-length loop; downstream masks both, see predictor assemble())."""
    enc = model.apply(variables, batch, method=Pix2Poly.encode)
    B = enc.shape[0]
    T = model.max_len - 1
    memory_kv = model.apply(variables, enc, method=Pix2Poly._init_memory_kv)
    cache_k = jnp.zeros((model.num_layers, B, T, model.dim), model.dtype)
    cache_v = jnp.zeros((model.num_layers, B, T, model.dim), model.dtype)
    tokens0 = jnp.full((B, T), model.pad_idx, jnp.int32)

    if eos_code is None:

        def body(carry, pos):
            tok, tokens, ck, cv = carry
            logits, feats, ck, cv = model.apply(
                variables, tok, pos, ck, cv, memory_kv, method=Pix2Poly._decode_step
            )
            nxt = jnp.argmax(logits, axis=-1).astype(jnp.int32)
            tokens = tokens.at[:, pos].set(nxt)
            return (nxt, tokens, ck, cv), feats

        init = (jnp.full((B,), bos_code, jnp.int32), tokens0, cache_k, cache_v)
        (last, tokens, _, _), feats_seq = jax.lax.scan(
            body, init, jnp.arange(generation_steps)
        )
        feats = jnp.moveaxis(feats_seq, 0, 1)  # (B, steps, D)
        if feats.shape[1] < T:
            feats = jnp.pad(feats, ((0, 0), (0, T - feats.shape[1]), (0, 0)))
    else:
        feats0 = jnp.zeros((B, T, model.dim), model.dtype)
        done0 = jnp.zeros((B,), bool)

        def cond(carry):
            pos = carry[0]
            done = carry[6]
            return jnp.logical_and(pos < generation_steps, ~jnp.all(done))

        def wbody(carry):
            pos, tok, tokens, ck, cv, feats, done = carry
            logits, f, ck, cv = model.apply(
                variables, tok, pos, ck, cv, memory_kv, method=Pix2Poly._decode_step
            )
            nxt = jnp.argmax(logits, axis=-1).astype(jnp.int32)
            nxt = jnp.where(done, model.pad_idx, nxt)
            tokens = tokens.at[:, pos].set(nxt)
            f = jnp.where(done[:, None], 0, f).astype(feats.dtype)
            feats = jax.lax.dynamic_update_slice_in_dim(feats, f[:, None], pos, axis=1)
            done = jnp.logical_or(done, nxt == eos_code)
            return (pos + 1, nxt, tokens, ck, cv, feats, done)

        init = (
            jnp.int32(0),
            jnp.full((B,), bos_code, jnp.int32),
            tokens0,
            cache_k,
            cache_v,
            feats0,
            done0,
        )
        _, _, tokens, _, _, feats, _ = jax.lax.while_loop(cond, wbody, init)

    method = Pix2Poly.raw_scores_from_feats if raw_scores else Pix2Poly.perm_from_feats
    perm = model.apply(variables, feats, method=method)
    return tokens, perm
