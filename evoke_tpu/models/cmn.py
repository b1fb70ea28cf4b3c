"""Cross-modal Memory Network decoder (alternative to the R2Gen decoder).

Capability parity: EVOKE modules/base_cmn.py — a pre-LN transformer
encoder-decoder plus a learnable memory matrix [cmm_size=2048, cmm_dim=512]
queried through ``MultiThreadMemory`` (multi-head attention that keeps only the
top-k=32 memory slots per query, :37-57); responses are ADDED to the embedded
visual features before encoding (:358-366) and to the embedded target tokens
before decoding (:68-77). Decoding here is KV-cached per layer (the reference
carries a ``past`` too, :303-317), expressed as lax-friendly static-shape
caches like rm_decoder.
"""

from __future__ import annotations

import math
from typing import Any, Dict, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from evoke_tpu.models.layers import (MultiHeadAttention, PositionwiseFFN, TokenEmbed,
                                     TorchLayerNorm, cached_self_attention,
                                     make_cross_mask, make_self_mask,
                                     xavier, sinusoidal_pe)
from evoke_tpu.models.rm_decoder import EncoderLayer

Dtype = Any


class MultiThreadMemory(nn.Module):
    """MHA over memory slots keeping only the top-k scores per query-head."""

    num_heads: int
    d_model: int
    topk: int = 32
    dropout_rate: float = 0.1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, query, memory, deterministic=True):
        """query: [B, T, D]; memory: [M, D] -> responses [B, T, D]."""
        b, t, d = query.shape
        h = self.num_heads
        dk = d // h
        q = nn.Dense(d, dtype=self.dtype, name="wq")(query)
        k = nn.Dense(d, dtype=self.dtype, name="wk")(memory)
        v = nn.Dense(d, dtype=self.dtype, name="wv")(memory)
        q = q.reshape(b, t, h, dk).transpose(0, 2, 1, 3)            # [B, h, T, dk]
        k = k.reshape(-1, h, dk).transpose(1, 0, 2)                  # [h, M, dk]
        v = v.reshape(-1, h, dk).transpose(1, 0, 2)                  # [h, M, dk]
        scores = jnp.einsum("bhtd,hmd->bhtm", q, k,
                            preferred_element_type=jnp.float32) / math.sqrt(dk)
        sel_scores, sel_idx = jax.lax.top_k(scores, self.topk)       # [B, h, T, k]
        probs = jax.nn.softmax(sel_scores, axis=-1)
        if not deterministic and self.dropout_rate > 0.0:
            probs = nn.Dropout(self.dropout_rate)(probs, deterministic=False)
        # gather selected values: v [h, M, dk] indexed by sel_idx [B, h, T, k]
        sel_v = jnp.take_along_axis(
            v[None, :, None, :, :].astype(jnp.float32),              # [1, h, 1, M, dk]
            sel_idx[..., None], axis=3)                              # [B, h, T, k, dk]
        out = jnp.einsum("bhtk,bhtkd->bhtd", probs, sel_v)
        out = out.transpose(0, 2, 1, 3).reshape(b, t, d).astype(self.dtype)
        return nn.Dense(d, dtype=self.dtype, name="wo")(out)


class PlainDecoderLayer(nn.Module):
    """Pre-LN decoder layer (base_cmn.py:159-181) with a KV-cached step."""

    d_model: int
    d_ff: int
    num_heads: int
    dropout_rate: float = 0.0
    dtype: Dtype = jnp.float32

    def setup(self):
        self.self_attn = MultiHeadAttention(self.num_heads, self.d_model,
                                            self.dropout_rate, dtype=self.dtype)
        self.src_attn = MultiHeadAttention(self.num_heads, self.d_model,
                                           self.dropout_rate, dtype=self.dtype)
        self.ff = PositionwiseFFN(self.d_model, self.d_ff, self.dropout_rate,
                                  dtype=self.dtype)
        self.norm1 = TorchLayerNorm(dtype=self.dtype)
        self.norm2 = TorchLayerNorm(dtype=self.dtype)
        self.norm3 = TorchLayerNorm(dtype=self.dtype)
        self.drop = nn.Dropout(self.dropout_rate)

    def __call__(self, x, enc, self_mask, cross_mask, deterministic=True):
        h = self.norm1(x)
        x = x + self.drop(self.self_attn(h, h, h, mask=self_mask,
                                         deterministic=deterministic),
                          deterministic=deterministic)
        h = self.norm2(x)
        x = x + self.drop(self.src_attn(h, enc, enc, mask=cross_mask,
                                        deterministic=deterministic),
                          deterministic=deterministic)
        h = self.norm3(x)
        return x + self.drop(self.ff(h, deterministic=deterministic),
                             deterministic=deterministic)

    def prepare_cross_kv(self, enc):
        return self.src_attn.project_kv(enc)

    def step(self, x, cross_k, cross_v, cross_mask, cache_k, cache_v, pos, anc=None):
        h = self.norm1(x)
        k_new, v_new = self.self_attn.project_kv(h)
        cache_k = jax.lax.dynamic_update_slice(cache_k, k_new.astype(cache_k.dtype),
                                               (0, pos, 0))
        cache_v = jax.lax.dynamic_update_slice(cache_v, v_new.astype(cache_v.dtype),
                                               (0, pos, 0))
        x = x + cached_self_attention(self.self_attn, h, cache_k, cache_v, pos, anc)
        h = self.norm2(x)
        x = x + self.src_attn.attend(h, cross_k, cross_v, mask=cross_mask)
        h = self.norm3(x)
        return x + self.ff(h), cache_k, cache_v


class CMNDecoder(nn.Module):
    """BaseCMN-equivalent surface: same API as RMDecoder (drop-in for FinetuneModel)."""

    vocab_size: int
    d_model: int = 512
    d_ff: int = 512
    d_vf: int = 2048
    num_layers: int = 3
    num_heads: int = 8
    dropout_rate: float = 0.0
    drop_prob_lm: float = 0.5
    cmm_size: int = 2048
    cmm_dim: int = 512
    topk: int = 32
    max_seq_len: int = 100
    dtype: Dtype = jnp.float32

    def setup(self):
        assert self.cmm_dim == self.d_model, "CMN memory dim must equal d_model"
        self.att_embed = nn.Dense(self.d_model, dtype=self.dtype, name="att_embed")
        self.att_drop = nn.Dropout(self.drop_prob_lm)
        self.cmn = MultiThreadMemory(self.num_heads, self.d_model, self.topk,
                                     dtype=self.dtype)
        self.memory_matrix = self.param(
            "memory_matrix", nn.initializers.normal(1.0 / self.cmm_dim),
            (self.cmm_size, self.cmm_dim))
        self.enc_layers = [
            EncoderLayer(self.d_model, self.d_ff, self.num_heads, self.dropout_rate,
                         dtype=self.dtype, name=f"enc_{i}") for i in range(self.num_layers)]
        self.enc_norm = TorchLayerNorm(dtype=self.dtype)
        self.dec_layers = [
            PlainDecoderLayer(self.d_model, self.d_ff, self.num_heads, self.dropout_rate,
                              dtype=self.dtype, name=f"dec_{i}")
            for i in range(self.num_layers)]
        self.dec_norm = TorchLayerNorm(dtype=self.dtype)
        self.tgt_embed = TokenEmbed(self.vocab_size + 1, self.d_model,
                                    dropout_rate=self.dropout_rate, dtype=self.dtype)
        self.pe = jnp.asarray(sinusoidal_pe(5000, self.d_model))
        self.pe_drop = nn.Dropout(self.dropout_rate)
        self.logit = nn.Dense(self.vocab_size + 1, dtype=self.dtype, name="logit")

    # ---- shared ----

    def encode(self, att_feats, att_mask, deterministic=True):
        """att_embed -> +memory responses -> +PE -> pre-LN encoder (base_cmn contract)."""
        x = self.att_embed(att_feats * att_mask[..., None])
        x = nn.relu(x)
        x = self.att_drop(x, deterministic=deterministic)
        x = x + self.cmn(x, self.memory_matrix, deterministic=deterministic)
        x = x + self.pe[None, : x.shape[1]]
        x = self.pe_drop(x, deterministic=deterministic)
        mask = make_cross_mask(att_mask)
        for layer in self.enc_layers:
            x = layer(x, mask=mask, deterministic=deterministic)
        return self.enc_norm(x)

    def _embed_with_memory(self, x, deterministic=True):
        return x + self.cmn(x, self.memory_matrix, deterministic=deterministic)

    # ---- training ----

    def __call__(self, att_feats, att_mask, tgt_ids, tgt_mask, deterministic=True):
        enc = self.encode(att_feats, att_mask, deterministic=deterministic)
        return self.decode_train(enc, att_mask, tgt_ids, tgt_mask,
                                 deterministic=deterministic)

    def decode_train(self, enc, att_mask, tgt_ids, tgt_mask, deterministic=True):
        x = self.tgt_embed(tgt_ids, deterministic=deterministic)
        x = self._embed_with_memory(x, deterministic=deterministic)
        self_mask = make_self_mask(tgt_mask, causal=True)
        cross_mask = make_cross_mask(att_mask)
        for layer in self.dec_layers:
            x = layer(x, enc, self_mask, cross_mask, deterministic=deterministic)
        x = self.dec_norm(x)
        return jax.nn.log_softmax(self.logit(x).astype(jnp.float32), axis=-1)

    # ---- incremental decoding ----

    def init_decode_state(self, enc, batch: int, max_len: Optional[int] = None
                          ) -> Dict[str, Any]:
        lmax = max_len or self.max_seq_len
        cross = [layer.prepare_cross_kv(enc) for layer in self.dec_layers]
        # per-layer tuples: keeps in-place cache updates independent of XLA
        # fusing the stacked layout's unstack/restack (measured neutral on v5e)
        zeros = lambda: jnp.zeros((batch, lmax, self.d_model), self.dtype)
        return {
            "cache_k": tuple(zeros() for _ in range(self.num_layers)),
            "cache_v": tuple(zeros() for _ in range(self.num_layers)),
            "cross_k": tuple(c[0] for c in cross),
            "cross_v": tuple(c[1] for c in cross),
        }

    def decode_step(self, tok, pos, state, att_mask, return_logits=False):
        x = self.tgt_embed.at_position(tok, pos)
        x = self._embed_with_memory(x)
        cross_mask = make_cross_mask(att_mask)
        anc = state.get("anc")
        new_k, new_v = [], []
        for i, layer in enumerate(self.dec_layers):
            x, ck, cv = layer.step(x, state["cross_k"][i], state["cross_v"][i],
                                   cross_mask, state["cache_k"][i], state["cache_v"][i],
                                   pos, anc=anc)
            new_k.append(ck)
            new_v.append(cv)
        x = self.dec_norm(x)
        logits = self.logit(x)[:, 0, :]
        logp = (logits if return_logits
                else jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1))
        return logp, {"cache_k": tuple(new_k), "cache_v": tuple(new_v),
                      "cross_k": state["cross_k"], "cross_v": state["cross_v"],
                      **({"anc": anc} if anc is not None else {})}
