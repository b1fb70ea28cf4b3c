"""Shared transformer building blocks (Flax linen, TPU-first).

Behavioral contracts follow the reference's ops (EVOKE modules/encoder_decoder.py,
models/language_encoder/bert_model.py) but are implemented as batched, static-shape
JAX modules. Notable contract details preserved:

- ``TorchLayerNorm``: the reference's custom LayerNorm normalizes by the *unbiased*
  std and adds eps to the std, not the variance (encoder_decoder.py:93-103).
- Attention masking uses a large negative fill before softmax (``attention``,
  encoder_decoder.py:20-28).
- ``Embeddings`` scale by sqrt(d_model); sinusoidal positional encoding
  (encoder_decoder.py:219-243).
"""

from __future__ import annotations

import math
from typing import Any, Callable, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from evoke_tpu.ops.lineage_attention import (lineage_attention,
                                             lineage_interpret,
                                             use_pallas_lineage)

Dtype = Any
NEG_INF = -1e9

xavier = nn.initializers.xavier_uniform()


class TorchLayerNorm(nn.Module):
    """gamma * (x - mean) / (std_unbiased + eps) + beta  (reference LayerNorm)."""

    eps: float = 1e-6
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        d = x.shape[-1]
        gamma = self.param("gamma", nn.initializers.ones, (d,))
        beta = self.param("beta", nn.initializers.zeros, (d,))
        xf = x.astype(jnp.float32)
        mean = jnp.mean(xf, axis=-1, keepdims=True)
        var = jnp.sum((xf - mean) ** 2, axis=-1, keepdims=True) / max(d - 1, 1)
        y = (xf - mean) / (jnp.sqrt(var) + self.eps)
        return (gamma * y + beta).astype(self.dtype)


def dot_attention(q, k, v, mask=None, dropout_fn: Optional[Callable] = None):
    """Scaled dot-product attention.

    q: [B, h, Tq, dk], k: [B, h, Tk, dk], v: [B, h, Tk, dv]
    mask: broadcastable to [B, h, Tq, Tk]; True/1 = attend.
    """
    dk = q.shape[-1]
    if q.shape[2] <= 4 and q.dtype == jnp.bfloat16:
        # Small-Tq decode steps (Tq=1 single-token, or Tq=beam in the
        # shared-KV cross path): preferred_element_type=f32 would force the
        # ENTIRE K cache to be upcast+re-laid-out to f32 every step (measured:
        # 3 x 39 MB copies per step at batch 192). Contracting dk<=128 terms in
        # bf16 and casting the [B,h,Tq,Tk] scores afterwards avoids that
        # traffic; both lowerings accumulate in f32 then round to bf16, so the
        # Tq=1 and Tq=beam forms produce identical score values.
        scores = jnp.einsum("bhqd,bhkd->bhqk", q, k).astype(jnp.float32)
    else:
        scores = jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32)
    scores = scores / math.sqrt(dk)
    if mask is not None:
        scores = jnp.where(mask, scores, NEG_INF)
    probs = jax.nn.softmax(scores, axis=-1)
    if dropout_fn is not None:
        probs = dropout_fn(probs)
    out = jnp.einsum("bhqk,bhkd->bhqd", probs.astype(v.dtype), v)
    return out, probs


class MultiHeadAttention(nn.Module):
    """Standard MHA with separate q/k/v/o projections.

    ``project_kv`` is exposed for KV-cached decoding: keys/values are cached
    *after* projection, so an incremental step only projects the new token.
    """

    num_heads: int
    d_model: int
    dropout_rate: float = 0.0
    dtype: Dtype = jnp.float32

    def setup(self):
        assert self.d_model % self.num_heads == 0
        self.wq = nn.Dense(self.d_model, kernel_init=xavier, dtype=self.dtype)
        self.wk = nn.Dense(self.d_model, kernel_init=xavier, dtype=self.dtype)
        self.wv = nn.Dense(self.d_model, kernel_init=xavier, dtype=self.dtype)
        self.wo = nn.Dense(self.d_model, kernel_init=xavier, dtype=self.dtype)
        self.drop = nn.Dropout(self.dropout_rate)

    def _split(self, x):
        b, t, _ = x.shape
        return x.reshape(b, t, self.num_heads, -1).transpose(0, 2, 1, 3)

    def _merge(self, x):
        b, h, t, d = x.shape
        return x.transpose(0, 2, 1, 3).reshape(b, t, h * d)

    def project_kv(self, x):
        """x: [B, T, D] -> (k, v) each [B, T, D] (pre head-split, post projection)."""
        return self.wk(x), self.wv(x)

    def attend(self, q_in, k_proj, v_proj, mask=None, deterministic=True):
        """Attention with already-projected k/v ([B, Tk, D]).

        When ``q_in`` has g-times more rows than ``k_proj`` (beam-expanded
        queries over beam-INVARIANT cross K/V — rows ordered
        [s0b0, s0b1, ..., s1b0, ...] as produced by jnp.repeat), the g query
        rows of each sample attend the sample's single K/V row directly:
        exactly equivalent to attend(q, repeat(k, g), repeat(v, g)) but the
        K/V stream is read once per sample instead of once per beam (measured
        85 MB/step of duplicated cross reads at 384, batch 32 x beam 3).
        ``mask`` must then be [Bk, 1, 1, Tk]."""
        bq, tq, _ = q_in.shape
        bk = k_proj.shape[0]
        if bq != bk:
            assert bq % bk == 0, f"query rows {bq} not a multiple of kv rows {bk}"
            g = bq // bk
            h = self.num_heads
            q = self.wq(q_in).reshape(bk, g * tq, h, -1).transpose(0, 2, 1, 3)
            out, probs = dot_attention(q, self._split(k_proj), self._split(v_proj),
                                       mask=mask)
            self.sow("intermediates", "attn", probs)
            out = out.transpose(0, 2, 1, 3).reshape(bq, tq, -1)
            return self.wo(out)
        q = self._split(self.wq(q_in))
        k = self._split(k_proj)
        v = self._split(v_proj)
        drop = None if deterministic or self.dropout_rate == 0.0 else (
            lambda p: self.drop(p, deterministic=False))
        out, probs = dot_attention(q, k, v, mask=mask, dropout_fn=drop)
        # observability: capture attention maps via apply(..., mutable=['intermediates'])
        self.sow("intermediates", "attn", probs)
        return self.wo(self._merge(out))

    def __call__(self, q_in, k_in, v_in, mask=None, deterministic=True):
        k, v = self.wk(k_in), self.wv(v_in)
        return self.attend(q_in, k, v, mask=mask, deterministic=deterministic)

    def attend_lineage(self, h, cache_k, cache_v, anc, pos, age=None):
        """Ancestor-mode decode attention via the Pallas lineage kernel.

        h: [N, 1, D]; caches [N, L, D] (slot ``pos`` already written);
        anc: [B, kbeam, L] int32 (layers.cached_self_attention contract);
        age: optional [N] int32 ring history lengths (continuous serving) —
        rows of a sample share their slot's age, so only row 0 per sample
        rides into the kernel."""
        q = self.wq(h)[:, 0, :]
        b, kbeam = anc.shape[:2]
        age_b = None if age is None else age.reshape(b, kbeam)[:, 0]
        ctx = lineage_attention(q, cache_k, cache_v, anc, pos, self.num_heads,
                                interpret=lineage_interpret(), age=age_b)
        return self.wo(ctx[:, None, :])


def quantized_cache_update(cache, scale, new, pos):
    """Write ``new`` [N, 1, D] into an int8 KV cache with per-slot absmax scales.

    cache: [N, L, D] int8; scale: [N, L] f32. Each written slot stores
    round(new / s) with s = absmax(new)/127 — 8-bit symmetric per-token
    quantization. Returns the updated (cache, scale)."""
    new32 = new.astype(jnp.float32)
    s = jnp.maximum(jnp.max(jnp.abs(new32), axis=-1) / 127.0, 1e-8)  # [N, 1]
    q = jnp.round(new32 / s[..., None]).astype(jnp.int8)
    cache = jax.lax.dynamic_update_slice(cache, q, (0, pos, 0))
    scale = jax.lax.dynamic_update_slice(scale, s.astype(scale.dtype), (0, pos))
    return cache, scale


def _dequantize(cache, scale, dtype):
    """int8 [N, L, D] x per-slot scale [N, L] -> dtype. int8 values are exact
    in bf16, so the only rounding is the scale multiply. Left as a separate op
    for XLA to fuse into the consuming matmul's operand read (whether the HBM
    read stays int8 is an XLA scheduling fact — measured, not assumed)."""
    if scale is None:
        return cache
    return cache.astype(dtype) * scale[..., None].astype(dtype)


def cached_self_attention(attn, h, cache_k, cache_v, pos, anc=None,
                          scale_k=None, scale_v=None, age=None):
    """Decode-step self-attention over the KV cache.

    ``attn`` is any block exposing ``attend(q, k_proj, v_proj, mask=...)``
    (MultiHeadAttention / BertAttentionBlock). h: [N, 1, D]; caches [N, L, D];
    pos: scalar step index.

    anc=None: plain causal read of the row's own cache (slots <= pos).

    anc [B, k, L] (int, beam-ancestor table; N = B*k, rows sample-major):
    beam-search mode WITHOUT per-step cache reorder. Caches stay physically
    un-permuted; ``anc[s, b, t']`` names the physical beam row (within sample
    s) whose slot t' holds this beam's ancestor K/V at time t'. Each query
    attends the flattened k*L rows of its sample's caches, masked to its own
    lineage — the same attended set (hence the same attention) as gathering
    the caches by beam index each step, but the cache is READ once instead of
    read + reorder-gathered + rewritten (the 3-pass traffic in the analytic
    model; the reorder gathers were 15 of 54 loop-ms on the 224 trace).
    Slot ``pos`` is the row's own just-written K/V (the ancestor entry for
    ``pos`` is recorded by the beam AFTER its top-k picks parents).

    scale_k/scale_v: per-slot absmax scales [N, L] when the caches are int8
    (quantized_cache_update); the caches are dequantized to the query dtype
    at the attend boundary.

    Ancestor-mode dispatch: on TPU the lineage read runs as a Pallas kernel
    (ops/lineage_attention.py — each sample's cache block is DMA'd to VMEM
    once and the lineage mask never leaves the VPU, vs the XLA formulation's
    beam-times-larger materialized masked scores); EVOKE_LINEAGE_KERNEL
    forces either path.

    age [N] (continuous serving, decode/continuous.py): caches are RING
    buffers — every row writes at the shared physical slot ``pos`` but sits
    at its own logical position. Row r's valid history is the ring range of
    its last age[r]+1 writes: slot j is readable iff (pos - j) mod L <=
    age[r]. Attention is permutation-invariant given the mask (the PE is
    added to the input embedding, never inside K/V), so rotated storage is
    exact.

    anc + age together (ancestor-mode continuous serving): lineage masks
    over ring time — physical slot t' is history for a row of age a iff
    0 < (pos - t') mod L <= a, and the just-written slot is delta == 0. With
    a == pos and no wrap this reduces EXACTLY to the plain ancestor masks
    (delta = pos - t' for t' <= pos; slots beyond pos wrap to delta > pos
    and mask out), so the ring form strictly generalizes the batch form."""
    if age is not None and anc is None:
        cache_k = _dequantize(cache_k, scale_k, h.dtype)
        cache_v = _dequantize(cache_v, scale_v, h.dtype)
        lmax = cache_k.shape[1]
        delta = jnp.mod(pos - jnp.arange(lmax), lmax)          # [L]
        mask = (delta[None, :] <= age[:, None])[:, None, None, :]
        return attn.attend(h, cache_k, cache_v, mask=mask)
    if anc is not None and scale_k is None and use_pallas_lineage(cache_k, anc):
        return attn.attend_lineage(h, cache_k, cache_v, anc, pos, age=age)
    cache_k = _dequantize(cache_k, scale_k, h.dtype)
    cache_v = _dequantize(cache_v, scale_v, h.dtype)
    if anc is None:
        lmax = cache_k.shape[1]
        mask = (jnp.arange(lmax) <= pos)[None, None, None, :]
        return attn.attend(h, cache_k, cache_v, mask=mask)
    b, kbeam, lmax = anc.shape
    k_flat = cache_k.reshape(b, kbeam * lmax, cache_k.shape[-1])
    v_flat = cache_v.reshape(b, kbeam * lmax, cache_v.shape[-1])
    t = jnp.arange(lmax)
    if age is None:
        hist_t = (t < pos)[None, None, :, None]                # [1, 1, t', 1]
        now_t = (t == pos)[None, :, None]                      # [1, t', 1]
    else:
        delta = jnp.mod(pos - t, lmax)                         # [L]
        age_b = age.reshape(b, kbeam)[:, 0]                    # rows share slot age
        hist_t = ((delta > 0)[None, :] & (delta[None, :] <= age_b[:, None])
                  )[:, None, :, None]                          # [B, 1, t', 1]
        now_t = (delta == 0)[None, :, None]                    # [1, t', 1]
    hist = jax.nn.one_hot(anc, kbeam, dtype=bool) & hist_t     # [B, q, t', j]
    self_now = jnp.eye(kbeam, dtype=bool)[:, None, :] & now_t  # [q, t', j]
    mask = (hist | self_now[None]).transpose(0, 1, 3, 2)       # [B, q, j, t']
    mask = mask.reshape(b, 1, kbeam, kbeam * lmax)
    return attn.attend(h, k_flat, v_flat, mask=mask)


class PositionwiseFFN(nn.Module):
    d_model: int
    d_ff: int
    dropout_rate: float = 0.0
    dtype: Dtype = jnp.float32
    activation: Callable = nn.relu

    @nn.compact
    def __call__(self, x, deterministic=True):
        h = nn.Dense(self.d_ff, kernel_init=xavier, dtype=self.dtype)(x)
        h = self.activation(h)
        h = nn.Dropout(self.dropout_rate)(h, deterministic=deterministic)
        return nn.Dense(self.d_model, kernel_init=xavier, dtype=self.dtype)(h)


def sinusoidal_pe(max_len: int, d_model: int) -> np.ndarray:
    """[max_len, d_model] sine/cosine table (encoder_decoder.py:228-236)."""
    pe = np.zeros((max_len, d_model), dtype=np.float32)
    position = np.arange(max_len, dtype=np.float32)[:, None]
    div = np.exp(np.arange(0, d_model, 2, dtype=np.float32) * -(math.log(10000.0) / d_model))
    pe[:, 0::2] = np.sin(position * div)
    pe[:, 1::2] = np.cos(position * div)
    return pe


class TokenEmbed(nn.Module):
    """Embedding * sqrt(d_model) + sinusoidal PE (+ dropout)."""

    vocab_size: int
    d_model: int
    max_len: int = 5000
    dropout_rate: float = 0.0
    dtype: Dtype = jnp.float32

    def setup(self):
        self.lut = nn.Embed(self.vocab_size, self.d_model, embedding_init=xavier,
                            dtype=self.dtype)
        self.pe = jnp.asarray(sinusoidal_pe(self.max_len, self.d_model))
        self.drop = nn.Dropout(self.dropout_rate)

    def __call__(self, ids, deterministic=True):
        """ids: [B, T] -> [B, T, D] with PE for positions 0..T-1."""
        x = self.lut(ids) * math.sqrt(self.d_model)
        x = x + self.pe[None, : ids.shape[1]]
        return self.drop(x, deterministic=deterministic)

    def at_position(self, ids, pos, deterministic=True, age=None):
        """ids: [B] (one token per row), pos: scalar position -> [B, 1, D].

        age [B] (continuous serving, decode/continuous.py): rows sit at
        per-row logical positions while ``pos`` is only the shared physical
        ring slot — the PE is then a per-row gather (same op as the token
        embedding lookup)."""
        x = self.lut(ids)[:, None, :] * math.sqrt(self.d_model)
        if age is not None:
            x = x + self.pe[age][:, None, :]
        else:
            pe = jax.lax.dynamic_slice_in_dim(self.pe, pos, 1, axis=0)
            x = x + pe[None]
        return self.drop(x, deterministic=deterministic)


def causal_mask(t: int) -> jnp.ndarray:
    """[1, 1, t, t] lower-triangular boolean mask."""
    return jnp.tril(jnp.ones((t, t), dtype=bool))[None, None]


def make_self_mask(pad_mask: jnp.ndarray, causal: bool = False) -> jnp.ndarray:
    """pad_mask: [B, T] (1=token) -> [B, 1, T, T] attention mask."""
    m = pad_mask[:, None, None, :].astype(bool)
    if causal:
        m = m & causal_mask(pad_mask.shape[-1])
    return m


def make_cross_mask(kv_pad_mask: jnp.ndarray) -> jnp.ndarray:
    """kv_pad_mask: [B, Tk] -> [B, 1, 1, Tk]."""
    return kv_pad_mask[:, None, None, :].astype(bool)


class BertSelfOutput(nn.Module):
    """Dense + dropout + post-LN residual (HF Bert*Output contract)."""

    hidden_size: int
    dropout_rate: float = 0.1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, hidden, residual, deterministic=True):
        h = nn.Dense(self.hidden_size, dtype=self.dtype)(hidden)
        h = nn.Dropout(self.dropout_rate)(h, deterministic=deterministic)
        return nn.LayerNorm(epsilon=1e-12, dtype=self.dtype)(h + residual)


class BertAttentionBlock(nn.Module):
    """HF BertAttention: MHA (no output proj inside) + BertSelfOutput."""

    hidden_size: int
    num_heads: int
    dropout_rate: float = 0.1
    dtype: Dtype = jnp.float32

    def setup(self):
        d = self.hidden_size
        self.wq = nn.Dense(d, dtype=self.dtype)
        self.wk = nn.Dense(d, dtype=self.dtype)
        self.wv = nn.Dense(d, dtype=self.dtype)
        self.out = BertSelfOutput(d, self.dropout_rate, dtype=self.dtype)
        self.drop = nn.Dropout(self.dropout_rate)

    def project_kv(self, x):
        """x: [B, T, D] -> (k, v) each [B, T, D] (post-projection, pre head-split)
        for KV-cached decoding."""
        return self.wk(x), self.wv(x)

    def attend(self, x, k_proj, v_proj, mask=None, deterministic=True):
        """Attention + post-LN residual with already-projected k/v ([Bk, Tk, D]).

        Supports the shared-KV form (same contract as MultiHeadAttention
        .attend): when x has g-times more rows than k_proj (beam-grouped
        queries, rows sample-major), each sample's g query rows attend its
        single K/V row directly; ``mask`` must then broadcast to
        [Bk, h, g*Tq, Tk]."""
        b, tq, _ = x.shape
        h = self.num_heads
        bk = k_proj.shape[0]
        assert b % bk == 0, f"query rows {b} not a multiple of kv rows {bk}"
        q = self.wq(x).reshape(bk, (b // bk) * tq, h, -1).transpose(0, 2, 1, 3)
        k = k_proj.reshape(bk, k_proj.shape[1], h, -1).transpose(0, 2, 1, 3)
        v = v_proj.reshape(bk, v_proj.shape[1], h, -1).transpose(0, 2, 1, 3)
        dropout_fn = None if deterministic or self.dropout_rate == 0.0 else (
            lambda p: self.drop(p, deterministic=False))
        ctx, _ = dot_attention(q, k, v, mask=mask, dropout_fn=dropout_fn)
        ctx = ctx.transpose(0, 2, 1, 3).reshape(b, tq, -1)
        return self.out(ctx, x, deterministic=deterministic)

    def __call__(self, x, kv, mask=None, deterministic=True):
        k, v = self.project_kv(kv)
        return self.attend(x, k, v, mask=mask, deterministic=deterministic)

    def attend_lineage(self, x, cache_k, cache_v, anc, pos):
        """Ancestor-mode decode attention via the Pallas lineage kernel
        (same contract as MultiHeadAttention.attend_lineage), followed by
        this block's post-LN residual output."""
        q = self.wq(x)[:, 0, :]
        ctx = lineage_attention(q, cache_k, cache_v, anc, pos, self.num_heads,
                                interpret=lineage_interpret())
        return self.out(ctx[:, None, :], x)


class BertFFNBlock(nn.Module):
    """HF BertIntermediate + BertOutput (gelu, post-LN residual)."""

    hidden_size: int
    intermediate_size: int
    dropout_rate: float = 0.1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic=True):
        h = nn.Dense(self.intermediate_size, dtype=self.dtype)(x)
        h = nn.gelu(h, approximate=False)
        return BertSelfOutput(self.hidden_size, self.dropout_rate, dtype=self.dtype)(
            h, x, deterministic=deterministic)


class BertLayer(nn.Module):
    """Self-attention transformer layer (reference BertLayer, bert_model.py:548)."""

    hidden_size: int
    num_heads: int
    intermediate_size: int
    dropout_rate: float = 0.1
    dtype: Dtype = jnp.float32

    def setup(self):
        self.attention = BertAttentionBlock(self.hidden_size, self.num_heads,
                                            self.dropout_rate, dtype=self.dtype)
        self.ffn = BertFFNBlock(self.hidden_size, self.intermediate_size,
                                self.dropout_rate, dtype=self.dtype)

    def __call__(self, x, mask=None, deterministic=True):
        x = self.attention(x, x, mask=mask, deterministic=deterministic)
        return self.ffn(x, deterministic=deterministic)


class BertCrossLayer(nn.Module):
    """Self-attn -> cross-attn -> FFN (reference BertCrossLayer, bert_model.py:444).

    Used to co-attend image tokens over the encoded indication text.
    """

    hidden_size: int
    num_heads: int
    intermediate_size: int
    dropout_rate: float = 0.1
    dtype: Dtype = jnp.float32

    def setup(self):
        self.attention = BertAttentionBlock(self.hidden_size, self.num_heads,
                                            self.dropout_rate, dtype=self.dtype)
        self.crossattention = BertAttentionBlock(self.hidden_size, self.num_heads,
                                                 self.dropout_rate, dtype=self.dtype)
        self.ffn = BertFFNBlock(self.hidden_size, self.intermediate_size,
                                self.dropout_rate, dtype=self.dtype)

    def __call__(self, x, enc, self_mask=None, cross_mask=None, deterministic=True):
        x = self.attention(x, x, mask=self_mask, deterministic=deterministic)
        x = self.crossattention(x, enc, mask=cross_mask, deterministic=deterministic)
        return self.ffn(x, deterministic=deterministic)

    def prepare_cross_kv(self, enc):
        return self.crossattention.project_kv(enc)

    def step(self, x, cross_k, cross_v, cross_mask, cache_k, cache_v, pos, anc=None):
        """One-token decode step with projected-KV caching (exact: every
        sublayer is causal and the post-LN residuals act per position).

        x: [B, 1, D]; cache_k/v: [B, Lmax, D]; pos: scalar int;
        anc: optional beam-ancestor table (cached_self_attention)."""
        k_new, v_new = self.attention.project_kv(x)
        cache_k = jax.lax.dynamic_update_slice(cache_k, k_new.astype(cache_k.dtype),
                                               (0, pos, 0))
        cache_v = jax.lax.dynamic_update_slice(cache_v, v_new.astype(cache_v.dtype),
                                               (0, pos, 0))
        x = cached_self_attention(self.attention, x, cache_k, cache_v, pos, anc)
        x = self.crossattention.attend(x, cross_k, cross_v, mask=cross_mask)
        return self.ffn(x), cache_k, cache_v
