"""BERT-style text encoder (Flax linen).

Capability parity: EVOKE models/language_encoder/language_model.py:120
(``TextEncoderModel``): a SciBERT-architecture encoder with overridden
vocab size, hidden=768 and 6 layers, returning the last hidden state.
Weight layout follows HF BERT so SciBERT checkpoints can be imported
(token/position/type embeddings + post-LN layers, gelu FFN).
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from evoke_tpu.models.layers import BertLayer, make_self_mask

Dtype = Any


class BertEmbeddings(nn.Module):
    vocab_size: int
    hidden_size: int
    max_positions: int = 512
    type_vocab_size: int = 2
    dropout_rate: float = 0.1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, ids, deterministic=True):
        b, t = ids.shape
        tok = nn.Embed(self.vocab_size, self.hidden_size, name="word_embeddings",
                       dtype=self.dtype)(ids)
        pos = nn.Embed(self.max_positions, self.hidden_size, name="position_embeddings",
                       dtype=self.dtype)(jnp.arange(t)[None].repeat(b, 0))
        typ = nn.Embed(self.type_vocab_size, self.hidden_size, name="token_type_embeddings",
                       dtype=self.dtype)(jnp.zeros_like(ids))
        x = tok + pos + typ
        x = nn.LayerNorm(epsilon=1e-12, dtype=self.dtype)(x)
        return nn.Dropout(self.dropout_rate)(x, deterministic=deterministic)


class TextEncoder(nn.Module):
    vocab_size: int
    hidden_size: int = 768
    num_layers: int = 6
    num_heads: int = 12
    intermediate_size: int = 3072
    max_positions: int = 512
    dropout_rate: float = 0.1
    dtype: Dtype = jnp.float32

    def setup(self):
        self.embeddings = BertEmbeddings(self.vocab_size, self.hidden_size,
                                         self.max_positions, dropout_rate=self.dropout_rate,
                                         dtype=self.dtype)
        self.layers = [
            BertLayer(self.hidden_size, self.num_heads, self.intermediate_size,
                      self.dropout_rate, dtype=self.dtype, name=f"layer_{i}")
            for i in range(self.num_layers)
        ]

    def __call__(self, input_ids, attention_mask, deterministic=True):
        """input_ids [B, T], attention_mask [B, T] (1=token) -> [B, T, H]."""
        x = self.embeddings(input_ids, deterministic=deterministic)
        mask = make_self_mask(attention_mask)
        for layer in self.layers:
            x = layer(x, mask=mask, deterministic=deterministic)
        return x
