"""Multiview fusion: one masked cross-attention over the whole batch.

Capability parity: EVOKE's ``multiview_fusion``
(models/model_pretrain_finetune_v0425_ablation.py:133-157 / :296-322) with the
reference's batch layout (dataloaders_v0401.py:60-116): a batch holds the
``n_anchor`` anchor images FIRST (one per study, aligned with the per-study
texts) followed by the deduped auxiliary views. Fusion queries are the anchor
rows only (the reference loops ``for i in range(batch_size)``); keys/values are
the gradient-stopped tokens of every same-study row in the WHOLE batch
(anchors + auxiliaries); residual + LayerNorm after; anchors with no partner
pass through unchanged (after the first LayerNorm only).

The reference loops over the batch in Python per sample — a GPU-hostile and
TPU-impossible pattern. Here it is ONE batched attention: queries
[n_anchor, T, D] attend over the flattened batch token axis [B*T, D] under a
same-study mask. Under a dp-sharded jit, XLA all-gathers the key/value tokens
across shards so cross-shard same-study pairs fuse exactly as on one device.

The reference's ScaledDotProductAttention (modules/utils_v0511.py:210-281)
uses per-head dim == d_model (h*d_k = 8*2048, a 134M-parameter attention);
``wide_qkv=True`` (the default, required for checkpoint-import parity)
reproduces that dimensioning, ``wide_qkv=False`` is the standard d_model/h
alternative. The two LayerNorms are torch ``nn.LayerNorm`` semantics
(biased variance, eps=1e-5 inside the sqrt — reference
model_pretrain_finetune_v0425_ablation.py:38-39), unlike the R2Gen decoder's
custom unbiased-std LayerNorm.
"""

from __future__ import annotations

from typing import Any, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from evoke_tpu.models.layers import dot_attention

Dtype = Any


def same_study_matrix(q_pids: jnp.ndarray, k_pids: jnp.ndarray, q_valid: jnp.ndarray,
                      k_valid: jnp.ndarray) -> jnp.ndarray:
    """[Q], [K] int codes + validity -> [Q, K] bool: same study, both valid, not self.

    "Self" means the same batch slot: query slot i corresponds to key slot i
    (anchors are the first n_anchor slots of the key axis).
    """
    q, k = q_pids.shape[0], k_pids.shape[0]
    eq = q_pids[:, None] == k_pids[None, :]
    v = q_valid[:, None] & k_valid[None, :]
    self_slot = jnp.arange(q)[:, None] == jnp.arange(k)[None, :]
    return eq & v & ~self_slot


def max_partners_in(pids: "np.ndarray", valid: "np.ndarray", n_anchor: int) -> int:
    """Host-side: the largest number of same-study partner rows any anchor has
    in this batch layout. Loaders/serving use it to check that a configured
    ``max_partners`` bound is exact for their data (grouped fusion attention
    truncates partners beyond the bound, keeping the lowest row indices)."""
    import numpy as np

    pids = np.asarray(pids)
    valid = np.asarray(valid)
    best = 0
    for i in range(n_anchor):
        if not valid[i]:
            continue
        same = (pids == pids[i]) & valid
        same[i] = False
        best = max(best, int(same.sum()))
    return best


class BatchedCrossViewAttention(nn.Module):
    """MHA where anchor i's tokens attend over all tokens of its same-study partners.

    ``max_partners=None`` runs the dense masked form: every anchor's queries
    attend over ALL B*T batch tokens under the same-study mask — exact for any
    partner multiplicity, but the MXU work scales with the whole batch
    (measured 34 ms of the 87 ms encoder at 384, batch 32+32, where each
    anchor's real partners are ~1 row of 64). With ``max_partners=G`` the
    partner ROWS are gathered per anchor (lowest row index first, plus a
    self-row slot for partnerless anchors) and attention runs over (1+G)*T
    keys — mathematically identical to the dense form whenever every anchor
    has <= G partners (softmax over the same attended set), and the compute
    drops by B/(1+G)."""

    d_model: int
    num_heads: int = 8
    dropout_rate: float = 0.1
    wide_qkv: bool = True
    use_pallas: bool = False   # fused flash-style kernel (ops/fusion_attention.py)
    max_partners: Any = None   # static int bound on partner rows per anchor
    dtype: Dtype = jnp.float32

    def setup(self):
        d, h = self.d_model, self.num_heads
        dk = d if self.wide_qkv else d // h
        self._dk = dk
        self.fc_q = nn.Dense(h * dk, dtype=self.dtype)
        self.fc_k = nn.Dense(h * dk, dtype=self.dtype)
        self.fc_v = nn.Dense(h * dk, dtype=self.dtype)
        self.fc_o = nn.Dense(d, dtype=self.dtype)
        self.attn_drop = nn.Dropout(self.dropout_rate)

    def apply_plain(self, q_in, kv_in):
        """Unmasked attention of q_in [B, Tq, D] over kv_in [B, Tk, D] (test oracle /
        per-sample semantics of the reference's ScaledDotProductAttention)."""
        b, tq, d = q_in.shape
        h, dk = self.num_heads, self._dk
        q = self.fc_q(q_in).reshape(b, tq, h, dk).transpose(0, 2, 1, 3)
        k = self.fc_k(kv_in).reshape(b, kv_in.shape[1], h, dk).transpose(0, 2, 1, 3)
        v = self.fc_v(kv_in).reshape(b, kv_in.shape[1], h, dk).transpose(0, 2, 1, 3)
        out, _ = dot_attention(q, k, v)
        return self.fc_o(out.transpose(0, 2, 1, 3).reshape(b, tq, h * dk))

    def __call__(self, x_q, x_kv, study_mask, deterministic=True):
        """x_q: [Q, T, D] anchors; x_kv: [B, T, D] whole batch;
        study_mask: [Q, B] bool (True = key row j is a partner view of anchor i)."""
        qn, t, d = x_q.shape
        b = x_kv.shape[0]
        h, dk = self.num_heads, self._dk

        kv = jax.lax.stop_gradient(x_kv)  # reference detaches k/v
        q = self.fc_q(x_q)
        k = self.fc_k(kv)
        v = self.fc_v(kv)

        q = q.reshape(qn, t, h, dk).transpose(0, 2, 1, 3)              # [Q, h, T, dk]
        has_partner = study_mask.any(-1)                               # [Q]
        use_dropout = not deterministic and self.dropout_rate > 0.0

        if self.max_partners is not None and not (self.use_pallas and not use_dropout):
            # grouped: gather each anchor's G partner rows (+ its own row as a
            # NaN-safe slot for partnerless anchors) and attend over (1+G)*T
            # keys instead of B*T
            G = min(int(self.max_partners), b)
            cols = jnp.arange(b)[None, :]
            order = jnp.sort(jnp.where(study_mask, cols, b + cols), axis=1)[:, :G]
            pidx = order % b                                           # [Q, G] row ids
            pvalid = order < b
            slot_idx = jnp.concatenate([jnp.arange(qn)[:, None], pidx], axis=1)
            slot_valid = jnp.concatenate([~has_partner[:, None], pvalid], axis=1)
            kg = k.reshape(b, t, h, dk)[slot_idx]                      # [Q, 1+G, T, h, dk]
            vg = v.reshape(b, t, h, dk)[slot_idx]
            kg = kg.reshape(qn, (1 + G) * t, h, dk).transpose(0, 2, 1, 3)
            vg = vg.reshape(qn, (1 + G) * t, h, dk).transpose(0, 2, 1, 3)
            mask4 = jnp.repeat(slot_valid, t, axis=1)[:, None, None, :]
            dropout_fn = None if not use_dropout else (
                lambda p: self.attn_drop(p, deterministic=False))
            out, _ = dot_attention(q, kg, vg, mask=mask4, dropout_fn=dropout_fn)
            out = out.transpose(0, 2, 1, 3).reshape(qn, t, h * dk)
            return self.fc_o(out)

        k = k.reshape(b * t, h, dk).transpose(1, 0, 2)                 # [h, B*T, dk]
        v = v.reshape(b * t, h, dk).transpose(1, 0, 2)                 # [h, B*T, dk]

        # anchors with no partner attend to their own tokens (a dummy, NaN-safe
        # path); their output is discarded by the caller's `where`.
        self_mask = (jnp.arange(qn)[:, None] == jnp.arange(b)[None, :]) & ~has_partner[:, None]
        attend = study_mask | self_mask                                # [Q, B]

        if self.use_pallas and not use_dropout:
            from evoke_tpu.ops.fusion_attention import masked_cross_view_attention
            out = masked_cross_view_attention(q, k, v, attend, t_tokens=t)
        else:
            mask4 = jnp.repeat(attend, t, axis=1)[:, None, None, :]    # [Q, 1, 1, B*T]
            dropout_fn = None if not use_dropout else (
                lambda p: self.attn_drop(p, deterministic=False))
            out, _ = dot_attention(q, k[None], v[None], mask=mask4, dropout_fn=dropout_fn)
        out = out.transpose(0, 2, 1, 3).reshape(qn, t, h * dk)
        return self.fc_o(out)


class MultiviewFusion(nn.Module):
    """LN1 -> masked cross-view attention -> residual + LN2 (pass-through when no partner).

    Input is the full batch [B, T, D]; output covers the first ``n_anchor`` rows.
    """

    d_model: int
    num_heads: int = 8
    dropout_rate: float = 0.1
    wide_qkv: bool = True
    max_partners: Any = None   # see BatchedCrossViewAttention
    dtype: Dtype = jnp.float32

    def setup(self):
        self.layer_norm_1 = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype)
        self.layer_norm_2 = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype)
        self.cross = BatchedCrossViewAttention(self.d_model, self.num_heads,
                                               self.dropout_rate, self.wide_qkv,
                                               max_partners=self.max_partners,
                                               dtype=self.dtype)

    def __call__(self, image_embed, pid_codes, valid, n_anchor: int, deterministic=True
                 ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """image_embed: [B, T, D] ([global; patches] per image, anchors first);
        pid_codes/valid: [B]; n_anchor: static anchor count.

        Returns (fused [n_anchor, T, D], has_partner [n_anchor]).
        """
        study_mask = same_study_matrix(pid_codes[:n_anchor], pid_codes,
                                       valid[:n_anchor], valid)
        has_partner = study_mask.any(-1)
        x = self.layer_norm_1(image_embed)
        x_q = x[:n_anchor]
        att = self.cross(x_q, x, study_mask, deterministic=deterministic)
        fused = self.layer_norm_2(att + x_q)
        out = jnp.where(has_partner[:, None, None], fused, x_q)
        return out, has_partner

    def norm_only(self, image_embed):
        """The is_multiview_learning=False path: just LN1 (reference :169-172)."""
        return self.layer_norm_1(image_embed)
