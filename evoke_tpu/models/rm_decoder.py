"""R2Gen-style report decoder: relational memory + conditional LayerNorm.

Capability parity: EVOKE modules/encoder_decoder.py — a 3-layer pre-LN
transformer encoder over image tokens and a 3-layer decoder whose sublayer
LayerNorms are *conditioned* on a RelationalMemory rolled over the target
embeddings (rm_num_slots=3). Two idiomatic-TPU departures from the reference:

1. The memory roll is a ``lax.scan`` (nn.scan) instead of a Python loop
   (encoder_decoder.py:293-300).
2. Incremental decoding keeps per-layer projected K/V caches and carries the
   relational memory as loop state; the reference re-decodes the full prefix
   every generation step with no KV cache (encoder_decoder.py:396-404). Because
   the architecture is causal (memory at position t depends only on tokens
   <= t, and each position's CLN uses its own memory), cached decoding is
   mathematically exact.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from evoke_tpu.models.layers import (MultiHeadAttention, PositionwiseFFN, TokenEmbed,
                                     TorchLayerNorm, cached_self_attention,
                                     make_cross_mask, make_self_mask,
                                     quantized_cache_update, xavier)

Dtype = Any


class RelationalMemory(nn.Module):
    """Gated slot memory rolled over target embeddings (encoder_decoder.py:246-300)."""

    num_slots: int
    d_model: int
    num_heads: int = 8
    attn_dropout: float = 0.1  # the reference's MHA default applies inside RM
    unroll: int = 10           # scan unrolling: the per-step math is tiny (S=3 slots),
                               # so the 100-step roll is latency-bound without it

    def setup(self):
        self.attn = MultiHeadAttention(self.num_heads, self.d_model, self.attn_dropout)
        self.mlp1 = nn.Dense(self.d_model, kernel_init=xavier)
        self.mlp2 = nn.Dense(self.d_model, kernel_init=xavier)
        self.W = nn.Dense(self.d_model * 2, kernel_init=xavier)
        self.U = nn.Dense(self.d_model * 2, kernel_init=xavier)

    def init_memory(self, batch_size: int) -> jnp.ndarray:
        """[B, S*D]: identity over slots, zero-padded to d_model."""
        s, d = self.num_slots, self.d_model
        eye = jnp.eye(s)
        if d > s:
            mem = jnp.concatenate([eye, jnp.zeros((s, d - s))], axis=-1)
        else:
            mem = eye[:, :d]
        return jnp.tile(mem.reshape(1, s * d), (batch_size, 1))

    def step(self, x_t: jnp.ndarray, memory: jnp.ndarray, deterministic=True) -> jnp.ndarray:
        """x_t: [B, D] (one target embedding), memory: [B, S*D] -> next [B, S*D]."""
        b = x_t.shape[0]
        s, d = self.num_slots, self.d_model
        mem = memory.reshape(b, s, d)
        kv = jnp.concatenate([mem, x_t[:, None, :]], axis=1)
        nxt = mem + self.attn(mem, kv, kv, deterministic=deterministic)
        nxt = nxt + nn.relu(self.mlp2(nn.relu(self.mlp1(nxt))))
        gates = self.W(x_t[:, None, :]) + self.U(jnp.tanh(mem))
        input_gate, forget_gate = jnp.split(gates, 2, axis=-1)
        nxt = jax.nn.sigmoid(input_gate) * jnp.tanh(nxt) + jax.nn.sigmoid(forget_gate) * mem
        return nxt.reshape(b, s * d)

    def roll(self, xs: jnp.ndarray, deterministic=True) -> jnp.ndarray:
        """xs: [B, T, D] -> memories after each step: [B, T, S*D]."""
        init = self.init_memory(xs.shape[0])

        def body(cell, carry, x):
            new = cell.step(x, carry, deterministic)
            return new, new

        scan = nn.scan(body, variable_broadcast="params",
                       variable_axes={"intermediates": 1},
                       split_rngs={"params": False, "dropout": not deterministic},
                       in_axes=1, out_axes=1, unroll=self.unroll)
        _, outs = scan(self, init, xs)
        return outs


class ConditionalLayerNorm(nn.Module):
    """LN whose scale/shift are offset by MLPs of the memory (encoder_decoder.py:144-178)."""

    d_model: int
    eps: float = 1e-6
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, memory):
        """x: [B, T, D], memory: [B, T, S*Drm] (broadcastable on T).

        The gamma/beta-offset MLPs stay f32 BY MEASUREMENT, not by accident:
        they are the decode step's FLOP and weight-read bulk (9 CLNs x ~2.1M
        params = ~19M of the ~21M per-step decoder params — ~75 MB of f32 HBM
        weight reads every token at the serving config), yet running them at
        the bf16 compute dtype measured NEUTRAL on a real v5e (636 vs 632 r/s
        interleaved @224 batch 64) while flipping 95% of generated rows: the
        decode loop is op-chain-latency-bound, not bandwidth-bound (DESIGN
        5i/5n), so the halved reads buy nothing and the numerics cost is
        real. EVOKE_CLN_MLP=dtype opts into the compute dtype anyway (the
        A/B knob)."""
        import os

        d = self.d_model
        mlp_dt = (self.dtype if os.environ.get("EVOKE_CLN_MLP", "f32") == "dtype"
                  else jnp.float32)
        bias_01 = nn.initializers.constant(0.1)
        gamma = self.param("gamma", nn.initializers.ones, (d,))
        beta = self.param("beta", nn.initializers.zeros, (d,))
        dg = nn.Dense(d, kernel_init=xavier, bias_init=bias_01, dtype=mlp_dt,
                      name="mlp_gamma_0")(memory.astype(mlp_dt))
        dg = nn.Dense(d, kernel_init=xavier, bias_init=bias_01, dtype=mlp_dt,
                      name="mlp_gamma_1")(nn.relu(dg))
        db = nn.Dense(d, kernel_init=xavier, bias_init=bias_01, dtype=mlp_dt,
                      name="mlp_beta_0")(memory.astype(mlp_dt))
        db = nn.Dense(d, kernel_init=xavier, bias_init=bias_01, dtype=mlp_dt,
                      name="mlp_beta_1")(nn.relu(db))
        dg = dg.astype(jnp.float32)
        db = db.astype(jnp.float32)
        xf = x.astype(jnp.float32)
        mean = jnp.mean(xf, axis=-1, keepdims=True)
        var = jnp.sum((xf - mean) ** 2, axis=-1, keepdims=True) / max(d - 1, 1)
        y = (xf - mean) / (jnp.sqrt(var) + self.eps)
        return ((gamma + dg) * y + (beta + db)).astype(x.dtype)


class EncoderLayer(nn.Module):
    """Pre-LN self-attention + FFN (encoder_decoder.py:70-90)."""

    d_model: int
    d_ff: int
    num_heads: int
    dropout_rate: float = 0.0
    dtype: Dtype = jnp.float32

    def setup(self):
        self.self_attn = MultiHeadAttention(self.num_heads, self.d_model,
                                            self.dropout_rate, dtype=self.dtype)
        self.ff = PositionwiseFFN(self.d_model, self.d_ff, self.dropout_rate, dtype=self.dtype)
        self.norm1 = TorchLayerNorm(dtype=self.dtype)
        self.norm2 = TorchLayerNorm(dtype=self.dtype)
        self.drop = nn.Dropout(self.dropout_rate)

    def __call__(self, x, mask=None, deterministic=True):
        h = self.norm1(x)
        x = x + self.drop(self.self_attn(h, h, h, mask=mask, deterministic=deterministic),
                          deterministic=deterministic)
        h = self.norm2(x)
        return x + self.drop(self.ff(h, deterministic=deterministic), deterministic=deterministic)


class RMDecoderLayer(nn.Module):
    """Decoder layer with conditional-LN sublayers (encoder_decoder.py:118-141)."""

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
        self.ff = PositionwiseFFN(self.d_model, self.d_ff, self.dropout_rate, dtype=self.dtype)
        self.cln1 = ConditionalLayerNorm(self.d_model, dtype=self.dtype)
        self.cln2 = ConditionalLayerNorm(self.d_model, dtype=self.dtype)
        self.cln3 = ConditionalLayerNorm(self.d_model, dtype=self.dtype)
        self.drop = nn.Dropout(self.dropout_rate)

    def __call__(self, x, enc, self_mask, cross_mask, memory, deterministic=True):
        h = self.cln1(x, memory)
        x = x + self.drop(self.self_attn(h, h, h, mask=self_mask, deterministic=deterministic),
                          deterministic=deterministic)
        h = self.cln2(x, memory)
        x = x + self.drop(self.src_attn(h, enc, enc, mask=cross_mask, deterministic=deterministic),
                          deterministic=deterministic)
        h = self.cln3(x, memory)
        return x + self.drop(self.ff(h, deterministic=deterministic), deterministic=deterministic)

    def prepare_cross_kv(self, enc):
        return self.src_attn.project_kv(enc)

    def step(self, x, cross_k, cross_v, cross_mask, memory, cache_k, cache_v, pos,
             anc=None, kv_scales=None, age=None):
        """One-token decode step with projected-KV caching (exact vs full re-decode).

        x: [B, 1, D]; memory: [B, 1, S*Drm]; cache_k/v: [B, Lmax, D]; pos: scalar.
        anc: optional beam-ancestor table (layers.cached_self_attention).
        kv_scales: (scale_k, scale_v) [B, Lmax] when the caches are int8
        (DecodeConfig.kv_cache_dtype='int8'). Returns (x, ck, cv, kv_scales).
        age [B]: ring-buffer caches at per-row logical positions (continuous
        serving) — pos is the shared physical write slot, masks follow age.
        """
        h = self.cln1(x, memory)
        k_new, v_new = self.self_attn.project_kv(h)
        if kv_scales is None:
            cache_k = jax.lax.dynamic_update_slice(cache_k, k_new.astype(cache_k.dtype),
                                                   (0, pos, 0))
            cache_v = jax.lax.dynamic_update_slice(cache_v, v_new.astype(cache_v.dtype),
                                                   (0, pos, 0))
            sk = sv = None
        else:
            cache_k, sk = quantized_cache_update(cache_k, kv_scales[0], k_new, pos)
            cache_v, sv = quantized_cache_update(cache_v, kv_scales[1], v_new, pos)
        x = x + cached_self_attention(self.self_attn, h, cache_k, cache_v, pos, anc,
                                      sk, sv, age=age)
        h = self.cln2(x, memory)
        x = x + self.src_attn.attend(h, cross_k, cross_v, mask=cross_mask)
        h = self.cln3(x, memory)
        x = x + self.ff(h)
        return x, cache_k, cache_v, (None if sk is None else (sk, sv))


class RMDecoder(nn.Module):
    """Full encoder-decoder: image tokens -> report logits / decode steps.

    Equivalent surface to EVOKE's ``EncoderDecoder`` (encoder_decoder.py:303-404):
    ``__call__`` = training forward returning log-probs [B, T, V+1];
    ``encode`` + ``init_decode_state`` + ``decode_step`` = KV-cached generation.
    """

    vocab_size: int                 # tokenizer vocab size; logits dim = vocab_size + 1
    d_model: int = 512
    d_ff: int = 512
    d_vf: int = 2048
    num_layers: int = 3
    num_heads: int = 8
    dropout_rate: float = 0.0
    drop_prob_lm: float = 0.5
    rm_num_slots: int = 3
    rm_num_heads: int = 8
    rm_d_model: int = 512
    max_seq_len: int = 100
    dtype: Dtype = jnp.float32

    def setup(self):
        # the memory rolls over tgt embeddings of width d_model (encoder_decoder.py:53)
        assert self.rm_d_model == self.d_model, "rm_d_model must equal d_model"
        self.att_embed = nn.Dense(self.d_model, dtype=self.dtype, name="att_embed")
        self.att_drop = nn.Dropout(self.drop_prob_lm)
        self.enc_layers = [
            EncoderLayer(self.d_model, self.d_ff, self.num_heads, self.dropout_rate,
                         dtype=self.dtype, name=f"enc_{i}") for i in range(self.num_layers)]
        self.enc_norm = TorchLayerNorm(dtype=self.dtype)
        self.dec_layers = [
            RMDecoderLayer(self.d_model, self.d_ff, self.num_heads, self.dropout_rate,
                           dtype=self.dtype, name=f"dec_{i}") for i in range(self.num_layers)]
        self.dec_norm = TorchLayerNorm(dtype=self.dtype)
        self.tgt_embed = TokenEmbed(self.vocab_size + 1, self.d_model,
                                    dropout_rate=self.dropout_rate, dtype=self.dtype)
        self.rm = RelationalMemory(self.rm_num_slots, self.rm_d_model, self.rm_num_heads)
        self.logit = nn.Dense(self.vocab_size + 1, dtype=self.dtype, name="logit")

    # ---- shared ----

    def encode(self, att_feats, att_mask, deterministic=True):
        """att_feats: [B, L, d_vf], att_mask: [B, L] -> [B, L, d_model]."""
        x = self.att_embed(att_feats * att_mask[..., None])
        x = nn.relu(x)
        x = self.att_drop(x, deterministic=deterministic)
        mask = make_cross_mask(att_mask)
        for layer in self.enc_layers:
            x = layer(x, mask=mask, deterministic=deterministic)
        return self.enc_norm(x)

    # ---- training ----

    def __call__(self, att_feats, att_mask, tgt_ids, tgt_mask, deterministic=True):
        """Training forward -> log-probs [B, T, V+1]."""
        enc = self.encode(att_feats, att_mask, deterministic=deterministic)
        return self.decode_train(enc, att_mask, tgt_ids, tgt_mask, deterministic=deterministic)

    def decode_train(self, enc, att_mask, tgt_ids, tgt_mask, deterministic=True):
        x = self.tgt_embed(tgt_ids, deterministic=deterministic)
        mem = self.rm.roll(x, deterministic=deterministic)
        self_mask = make_self_mask(tgt_mask, causal=True)
        cross_mask = make_cross_mask(att_mask)
        for layer in self.dec_layers:
            x = layer(x, enc, self_mask, cross_mask, mem, deterministic=deterministic)
        x = self.dec_norm(x)
        logits = self.logit(x)
        return jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)

    # ---- incremental decoding ----

    def init_decode_state(self, enc, batch: int, max_len: Optional[int] = None,
                          kv_dtype: Optional[str] = None) -> Dict[str, Any]:
        """Build the decode carry: relational memory + per-layer KV caches + cross K/V.

        Caches are PER-LAYER tuples, not one stacked [L, B, T, D] array, so
        each layer's dynamic_update_slice stands alone in the loop carry
        (measured neutral vs the stacked layout on v5e — XLA already fused the
        unstack/restack — but the aliasing no longer depends on that fusion).

        kv_dtype='int8': caches are stored 8-bit with per-slot absmax scales
        (layers.quantized_cache_update) — half the cache HBM traffic and
        memory, quantized numerics (opt-in, DecodeConfig.kv_cache_dtype)."""
        lmax = max_len or self.max_seq_len
        cross = [layer.prepare_cross_kv(enc) for layer in self.dec_layers]
        cache_dt = jnp.int8 if kv_dtype in ("int8", jnp.int8) else self.dtype
        zeros = lambda: jnp.zeros((batch, lmax, self.d_model), cache_dt)
        state = {
            "memory": self.rm.init_memory(batch),
            "cache_k": tuple(zeros() for _ in range(self.num_layers)),
            "cache_v": tuple(zeros() for _ in range(self.num_layers)),
            "cross_k": tuple(c[0] for c in cross),
            "cross_v": tuple(c[1] for c in cross),
        }
        if cache_dt == jnp.int8:
            sz = lambda: jnp.zeros((batch, lmax), jnp.float32)
            state["cache_k_scale"] = tuple(sz() for _ in range(self.num_layers))
            state["cache_v_scale"] = tuple(sz() for _ in range(self.num_layers))
        return state

    def decode_step(self, tok, pos, state, att_mask, return_logits=False, age=None,
                    return_topk=None, topk_suppress=()):
        """tok: [B] token ids, pos: scalar int, state: from init_decode_state.

        Returns (log-probs [B, V+1], new state); with ``return_logits=True``
        the first element is the UNNORMALIZED logits (the beam's two-stage
        top-k normalizes only the k*k winning candidates — decode/beam.py).

        ``return_topk=k``: the vocab tail (logit projection + logsumexp +
        stage-1 top-k, with ``topk_suppress`` ids knocked down -1000) runs as
        ONE fused Pallas kernel that never materializes the [B, V] logits in
        HBM (ops/fused_logit_topk.py) — the first element becomes the triple
        (vals [B, k] f32, idx [B, k] i32, lse [B] f32).

        age [N]: continuous-serving mode (decode/continuous.py) — rows sit
        at per-row logical positions (PE gathered per row) while ``pos`` is
        the shared physical ring slot the caches write at.
        """
        x = self.tgt_embed.at_position(tok, pos, age=age)      # [B, 1, D]
        import os
        if os.environ.get("EVOKE_RM_PROBE", "") == "skip":
            # measurement-only knob (NOT exact): carry the memory unchanged to
            # price the RM update's serialized chain cost (DESIGN §5i: ~12
            # tiny-op stages at the head of every decode step). A/B'd against
            # the default to decide whether a fused RM kernel is worth building.
            mem = state["memory"]
        else:
            mem = self.rm.step(x[:, 0, :], state["memory"])    # [B, S*D]
        cross_mask = make_cross_mask(att_mask)
        anc = state.get("anc")
        quant = "cache_k_scale" in state
        new_k, new_v, new_sk, new_sv = [], [], [], []
        for i, layer in enumerate(self.dec_layers):
            kv_scales = ((state["cache_k_scale"][i], state["cache_v_scale"][i])
                         if quant else None)
            x, ck, cv, sc = layer.step(x, state["cross_k"][i], state["cross_v"][i],
                                       cross_mask, mem[:, None, :],
                                       state["cache_k"][i], state["cache_v"][i], pos,
                                       anc=anc, kv_scales=kv_scales, age=age)
            new_k.append(ck)
            new_v.append(cv)
            if sc is not None:
                new_sk.append(sc[0])
                new_sv.append(sc[1])
        x = self.dec_norm(x)
        if return_topk:
            from evoke_tpu.ops.fused_logit_topk import (fused_logit_topk,
                                                        fused_topk_interpret)

            import os

            p = self.logit.variables["params"]
            # the astype casts replicate nn.Dense's promote_dtype and are
            # loop-invariant: XLA hoists them out of the decode while_loop, so
            # the loop reads the weights at the compute width (DESIGN 5c)
            logp = fused_logit_topk(
                x[:, 0, :].astype(self.dtype), p["kernel"].astype(self.dtype),
                p["bias"].astype(self.dtype), k=int(return_topk),
                suppress_ids=tuple(topk_suppress),
                tile=int(os.environ.get("EVOKE_LOGIT_TILE", 2048)),
                interpret=fused_topk_interpret())
        else:
            logits = self.logit(x)[:, 0, :]
            logp = (logits if return_logits
                    else jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1))
        new_state = {
            "memory": mem,
            "cache_k": tuple(new_k),
            "cache_v": tuple(new_v),
            "cross_k": state["cross_k"],
            "cross_v": state["cross_v"],
        }
        if quant:
            new_state["cache_k_scale"] = tuple(new_sk)
            new_state["cache_v_scale"] = tuple(new_sv)
        if anc is not None:
            new_state["anc"] = anc  # pass-through; the beam advances it per step
        return logp, new_state
