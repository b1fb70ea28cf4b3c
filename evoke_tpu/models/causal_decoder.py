"""Causal-LM text decoder with cross-attention (HF-style alternative decoder).

Capability parity: the reference's HF text decoders — ``TextDecoderModel``
(BertGeneration causal LM with cross-attention + custom beam hooks) and
``DistilGPT2TextDecoderModel`` (GPT2 wrapped in an EncoderDecoderModel), EVOKE
models/language_encoder/language_model.py:15,161. Behaviorally both are a
post-LN/pre-LN transformer LM with learned positions, cross-attending over the
image tokens. This module implements that as ONE configurable decoder with the
same train/decode API as RMDecoder/CMNDecoder (drop-in via decoder_kind='causal').

style='gpt2': pre-LN, gelu, learned positions (distilgpt2-like).
style='bert': post-LN, gelu, learned positions (BertGeneration-like).
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from evoke_tpu.models.layers import (BertAttentionBlock, BertCrossLayer, BertSelfOutput,
                                     MultiHeadAttention, PositionwiseFFN,
                                     cached_self_attention, make_cross_mask,
                                     make_self_mask)

Dtype = Any


class CausalLayer(nn.Module):
    """Pre-LN causal layer: self-attn -> cross-attn -> FFN, all with KV-cache step."""

    d_model: int
    num_heads: int
    d_ff: int
    dropout_rate: float = 0.1
    gelu_approximate: bool = False   # True = GPT-2's gelu_new (tanh approximation)
    dtype: Dtype = jnp.float32

    def setup(self):
        self.ln1 = nn.LayerNorm(dtype=self.dtype)
        self.ln2 = nn.LayerNorm(dtype=self.dtype)
        self.ln3 = nn.LayerNorm(dtype=self.dtype)
        self.self_attn = MultiHeadAttention(self.num_heads, self.d_model,
                                            self.dropout_rate, dtype=self.dtype)
        self.cross_attn = MultiHeadAttention(self.num_heads, self.d_model,
                                             self.dropout_rate, dtype=self.dtype)
        approx = self.gelu_approximate
        self.ff = PositionwiseFFN(self.d_model, self.d_ff, self.dropout_rate,
                                  dtype=self.dtype,
                                  activation=lambda y: nn.gelu(y, approximate=approx))

    def __call__(self, x, enc, self_mask, cross_mask, deterministic=True):
        h = self.ln1(x)
        x = x + self.self_attn(h, h, h, mask=self_mask, deterministic=deterministic)
        h = self.ln2(x)
        x = x + self.cross_attn(h, enc, enc, mask=cross_mask, deterministic=deterministic)
        h = self.ln3(x)
        return x + self.ff(h, deterministic=deterministic)

    def prepare_cross_kv(self, enc):
        return self.cross_attn.project_kv(enc)

    def step(self, x, cross_k, cross_v, cross_mask, cache_k, cache_v, pos, anc=None):
        h = self.ln1(x)
        k_new, v_new = self.self_attn.project_kv(h)
        cache_k = jax.lax.dynamic_update_slice(cache_k, k_new.astype(cache_k.dtype),
                                               (0, pos, 0))
        cache_v = jax.lax.dynamic_update_slice(cache_v, v_new.astype(cache_v.dtype),
                                               (0, pos, 0))
        x = x + cached_self_attention(self.self_attn, h, cache_k, cache_v, pos, anc)
        h = self.ln2(x)
        x = x + self.cross_attn.attend(h, cross_k, cross_v, mask=cross_mask)
        h = self.ln3(x)
        return x + self.ff(h), cache_k, cache_v


class CausalDecoder(nn.Module):
    """Same surface as RMDecoder: __call__ / encode / init_decode_state / decode_step."""

    vocab_size: int
    d_model: int = 512
    d_ff: int = 2048
    d_vf: int = 2048
    num_layers: int = 3
    num_heads: int = 8
    dropout_rate: float = 0.1
    drop_prob_lm: float = 0.5
    max_seq_len: int = 100
    max_positions: int = 512
    style: str = "bert"   # bert = exact gelu (BertGeneration) | gpt2 = gelu_new
    dtype: Dtype = jnp.float32

    def setup(self):
        self.att_embed = nn.Dense(self.d_model, dtype=self.dtype, name="att_embed")
        self.att_drop = nn.Dropout(self.drop_prob_lm)
        self.tok_embed = nn.Embed(self.vocab_size + 1, self.d_model, dtype=self.dtype)
        self.pos_embed = nn.Embed(self.max_positions, self.d_model, dtype=self.dtype)
        self.drop = nn.Dropout(self.dropout_rate)
        self.layers = [CausalLayer(self.d_model, self.num_heads, self.d_ff,
                                   self.dropout_rate,
                                   gelu_approximate=self.style == "gpt2",
                                   dtype=self.dtype,
                                   name=f"layer_{i}") for i in range(self.num_layers)]
        self.final_ln = nn.LayerNorm(dtype=self.dtype)
        self.logit = nn.Dense(self.vocab_size + 1, dtype=self.dtype, name="logit")

    def encode(self, att_feats, att_mask, deterministic=True):
        """Project image tokens into the decoder width (no extra encoder stack —
        the HF decoders cross-attend over raw encoder states)."""
        x = self.att_embed(att_feats * att_mask[..., None])
        x = nn.relu(x)
        return self.att_drop(x, deterministic=deterministic)

    def __call__(self, att_feats, att_mask, tgt_ids, tgt_mask, deterministic=True):
        enc = self.encode(att_feats, att_mask, deterministic=deterministic)
        return self.decode_train(enc, att_mask, tgt_ids, tgt_mask,
                                 deterministic=deterministic)

    def decode_train(self, enc, att_mask, tgt_ids, tgt_mask, deterministic=True):
        t = tgt_ids.shape[1]
        x = self.tok_embed(tgt_ids) + self.pos_embed(jnp.arange(t))[None]
        x = self.drop(x, deterministic=deterministic)
        self_mask = make_self_mask(tgt_mask, causal=True)
        cross_mask = make_cross_mask(att_mask)
        for layer in self.layers:
            x = layer(x, enc, self_mask, cross_mask, deterministic=deterministic)
        x = self.final_ln(x)
        return jax.nn.log_softmax(self.logit(x).astype(jnp.float32), axis=-1)

    def init_decode_state(self, enc, batch: int, max_len: Optional[int] = None
                          ) -> Dict[str, Any]:
        lmax = max_len or self.max_seq_len
        cross = [layer.prepare_cross_kv(enc) for layer in self.layers]
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
        pos_vec = self.pos_embed(jnp.asarray(pos, jnp.int32))
        x = self.tok_embed(tok)[:, None, :] + pos_vec[None, None, :]
        cross_mask = make_cross_mask(att_mask)
        anc = state.get("anc")
        new_k, new_v = [], []
        for i, layer in enumerate(self.layers):
            x, ck, cv = layer.step(x, state["cross_k"][i], state["cross_v"][i],
                                   cross_mask, state["cache_k"][i], state["cache_v"][i],
                                   pos, anc=anc)
            new_k.append(ck)
            new_v.append(cv)
        x = self.final_ln(x)
        logits = self.logit(x)[:, 0, :]
        logp = (logits if return_logits
                else jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1))
        return logp, {"cache_k": tuple(new_k), "cache_v": tuple(new_v),
                      "cross_k": state["cross_k"], "cross_v": state["cross_v"],
                      **({"anc": anc} if anc is not None else {})}


class BertGenerationEmbeddings(nn.Module):
    """HF BertGenerationEmbeddings: word + position + LN + dropout (NO token-type,
    transformers bert_generation modeling contract)."""

    vocab_size: int
    hidden_size: int
    max_positions: int = 512
    dropout_rate: float = 0.1
    dtype: Dtype = jnp.float32

    def setup(self):
        self.word_embeddings = nn.Embed(self.vocab_size, self.hidden_size,
                                        dtype=self.dtype, name="word_embeddings")
        self.position_embeddings = nn.Embed(self.max_positions, self.hidden_size,
                                            dtype=self.dtype, name="position_embeddings")
        self.ln = nn.LayerNorm(epsilon=1e-12, dtype=self.dtype, name="LayerNorm_0")
        self.drop = nn.Dropout(self.dropout_rate)

    def __call__(self, ids, deterministic=True):
        t = ids.shape[1]
        x = self.word_embeddings(ids) + self.position_embeddings(jnp.arange(t))[None]
        return self.drop(self.ln(x), deterministic=deterministic)

    def at_position(self, ids, pos, deterministic=True):
        """ids: [B] -> [B, 1, H] embedding at a dynamic position (decode step)."""
        pos_vec = self.position_embeddings(jnp.asarray(pos, jnp.int32))
        x = self.word_embeddings(ids)[:, None, :] + pos_vec[None, None, :]
        return self.drop(self.ln(x), deterministic=deterministic)


class BertGenerationDecoder(nn.Module):
    """BertGeneration-style causal LM decoder with cross-attention.

    Capability parity: the reference's ``TextDecoderModel``
    (models/language_encoder/language_model.py:15-60) — a HF
    ``BertGenerationDecoder`` built with ``is_decoder=True`` +
    ``add_cross_attention=True``, optionally seeded from a BERT checkpoint with
    ``ignore_mismatched_sizes=True`` (import path:
    torch_import.import_bertgeneration_decoder). Post-LN Bert layers, exact
    gelu, learned positions, LM head without extra transform
    (BertGenerationOnlyLMHead). Same train/decode API as RMDecoder
    (drop-in via decoder_kind='bertgen').
    """

    vocab_size: int
    d_model: int = 512
    d_ff: int = 2048
    d_vf: int = 2048
    num_layers: int = 3
    num_heads: int = 8
    dropout_rate: float = 0.1
    drop_prob_lm: float = 0.5
    max_seq_len: int = 100
    max_positions: int = 512
    dtype: Dtype = jnp.float32

    def setup(self):
        self.att_embed = nn.Dense(self.d_model, dtype=self.dtype, name="att_embed")
        self.att_drop = nn.Dropout(self.drop_prob_lm)
        self.embeddings = BertGenerationEmbeddings(
            self.vocab_size + 1, self.d_model, self.max_positions,
            self.dropout_rate, dtype=self.dtype)
        self.layers = [BertCrossLayer(self.d_model, self.num_heads, self.d_ff,
                                      self.dropout_rate, dtype=self.dtype,
                                      name=f"layer_{i}") for i in range(self.num_layers)]
        self.lm_head = nn.Dense(self.vocab_size + 1, dtype=self.dtype, name="lm_head")

    def encode(self, att_feats, att_mask, deterministic=True):
        """Project image tokens into the decoder width (the HF decoder
        cross-attends over raw encoder states)."""
        x = self.att_embed(att_feats * att_mask[..., None])
        x = nn.relu(x)
        return self.att_drop(x, deterministic=deterministic)

    def __call__(self, att_feats, att_mask, tgt_ids, tgt_mask, deterministic=True):
        enc = self.encode(att_feats, att_mask, deterministic=deterministic)
        return self.decode_train(enc, att_mask, tgt_ids, tgt_mask,
                                 deterministic=deterministic)

    def decode_train(self, enc, att_mask, tgt_ids, tgt_mask, deterministic=True):
        x = self.embeddings(tgt_ids, deterministic=deterministic)
        self_mask = make_self_mask(tgt_mask, causal=True)
        cross_mask = make_cross_mask(att_mask)
        for layer in self.layers:
            x = layer(x, enc, self_mask=self_mask, cross_mask=cross_mask,
                      deterministic=deterministic)
        return jax.nn.log_softmax(self.lm_head(x).astype(jnp.float32), axis=-1)

    def init_decode_state(self, enc, batch: int, max_len: Optional[int] = None
                          ) -> Dict[str, Any]:
        lmax = max_len or self.max_seq_len
        cross = [layer.prepare_cross_kv(enc) for layer in self.layers]
        zeros = lambda: jnp.zeros((batch, lmax, self.d_model), self.dtype)
        return {
            "cache_k": tuple(zeros() for _ in range(self.num_layers)),
            "cache_v": tuple(zeros() for _ in range(self.num_layers)),
            "cross_k": tuple(c[0] for c in cross),
            "cross_v": tuple(c[1] for c in cross),
        }

    def decode_step(self, tok, pos, state, att_mask, return_logits=False):
        x = self.embeddings.at_position(tok, pos)
        cross_mask = make_cross_mask(att_mask)
        anc = state.get("anc")
        new_k, new_v = [], []
        for i, layer in enumerate(self.layers):
            x, ck, cv = layer.step(x, state["cross_k"][i], state["cross_v"][i],
                                   cross_mask, state["cache_k"][i], state["cache_v"][i],
                                   pos, anc=anc)
            new_k.append(ck)
            new_v.append(cv)
        logits = self.lm_head(x)[:, 0, :]
        logp = (logits if return_logits
                else jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1))
        return logp, {"cache_k": tuple(new_k), "cache_v": tuple(new_v),
                      "cross_k": state["cross_k"], "cross_v": state["cross_v"],
                      **({"anc": anc} if anc is not None else {})}
