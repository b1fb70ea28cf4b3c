"""Multi-positive InfoNCE losses for Stage-1 pretraining.

Behavioral contracts from EVOKE models/model_pretrain_finetune_v0425_ablation.py:
- ``multi_positive_image_loss`` (:274-294): image-image InfoNCE where all other
  views of the same study are positives; rows AND columns are restricted to
  samples that have at least one partner view; diagonal excluded; returns 0 when
  no batch sample has a partner.
- ``global_alignment_loss`` (:324-342): bidirectional image-text InfoNCE with a
  same-study soft-target matrix (diagonal included).
- ``local_token_alignment_loss`` (:344-364): text-token -> image-patch attention
  then symmetric cross-entropy against token-index targets.

TPU/global-batch semantics: these are written over the *full* (global) batch
arrays. Under a dp-sharded jitted step, XLA all-gathers the embeddings so the
contrastive batch is the global batch — cross-shard positives are preserved
(the reference computes B x B logits on one device; SURVEY.md §2.10).

All losses take a ``valid`` mask so padded batch rows contribute nothing
(static-shape batching pads the batch, not the semantics).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

NEG_INF = -1e9


def _l2_normalize(x, axis=-1, eps=1e-12):
    return x / jnp.maximum(jnp.linalg.norm(x, axis=axis, keepdims=True), eps)


def _soft_ce(logits: jnp.ndarray, soft_targets: jnp.ndarray, row_mask: jnp.ndarray
             ) -> jnp.ndarray:
    """Mean over masked rows of -(targets * log_softmax(logits)).sum(-1)."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    per_row = -jnp.sum(soft_targets * logp, axis=-1)
    rm = row_mask.astype(jnp.float32)
    denom = jnp.maximum(jnp.sum(rm), 1.0)
    return jnp.sum(per_row * rm) / denom


def multi_positive_image_loss(global_image_embed: jnp.ndarray, pid_codes: jnp.ndarray,
                              valid: jnp.ndarray, temp: float) -> jnp.ndarray:
    """[B, D] raw global image feats; same-study partners are positives.

    Only samples with >=1 partner participate (as rows AND as softmax columns).
    """
    eq = (pid_codes[:, None] == pid_codes[None, :]) & valid[:, None] & valid[None, :]
    b = pid_codes.shape[0]
    eye = jnp.eye(b, dtype=bool)
    labels = (eq & ~eye).astype(jnp.float32)
    has_partner = labels.sum(-1) > 0

    row_sum = jnp.maximum(labels.sum(-1, keepdims=True), 1.0)
    targets = labels / row_sum

    e = _l2_normalize(global_image_embed.astype(jnp.float32))
    logits = (e @ e.T) / temp
    # restrict columns to participating samples; kill the diagonal
    col_ok = has_partner[None, :] & ~eye
    logits = jnp.where(col_ok, logits, NEG_INF)
    logits = logits - jax.lax.stop_gradient(jnp.max(logits, axis=-1, keepdims=True))
    return _soft_ce(logits, targets, has_partner)


def multi_positive_image_loss_avg(global_image_embed: jnp.ndarray,
                                  pid_codes: jnp.ndarray, valid: jnp.ndarray,
                                  temp: float) -> jnp.ndarray:
    """PretrainNewMulPos's alternative multi-positive formulation
    (EVOKE models/model_pretrain_finetune_v0425_ori.py:665-702,
    ``multi_pos_contra_images_v0404``): instead of soft-target rows, the
    logits of all positives are AVERAGED into one positive logit and
    cross-entropied against the row's negatives. Columns are NOT restricted
    to multiview samples (one-view samples stay as negatives), matching the
    reference; the per-row Python loop is vectorized."""
    eq = (pid_codes[:, None] == pid_codes[None, :]) & valid[:, None] & valid[None, :]
    b = pid_codes.shape[0]
    eye = jnp.eye(b, dtype=bool)
    pos = eq & ~eye
    has_partner = pos.any(-1)

    e = _l2_normalize(global_image_embed.astype(jnp.float32))
    logits = (e @ e.T) / temp
    logits = jnp.where(eye, NEG_INF, logits)          # fill_diagonal_(-1e9)
    logits = jnp.where(valid[None, :], logits, NEG_INF)  # padded rows are no columns
    logits = logits - jax.lax.stop_gradient(jnp.max(logits, axis=-1, keepdims=True))

    n_pos = jnp.maximum(pos.sum(-1), 1)
    pos_logit = jnp.sum(jnp.where(pos, logits, 0.0), axis=-1) / n_pos      # [B]
    neg = jnp.where(pos | eye | ~valid[None, :], NEG_INF, logits)          # [B, B]
    # CE over [pos_logit, negatives...] with label 0
    lse = jnp.logaddexp(pos_logit, jax.nn.logsumexp(neg, axis=-1))
    per_row = lse - pos_logit
    rm = has_partner.astype(jnp.float32)
    return jnp.sum(per_row * rm) / jnp.maximum(jnp.sum(rm), 1.0)


def global_alignment_loss(global_image_embed: jnp.ndarray, global_text_embed: jnp.ndarray,
                          pid_codes: jnp.ndarray, valid: jnp.ndarray, temp: float
                          ) -> jnp.ndarray:
    """Bidirectional multi-positive InfoNCE between [B, D] image and text globals."""
    eq = (pid_codes[:, None] == pid_codes[None, :]) & valid[:, None] & valid[None, :]
    labels = eq.astype(jnp.float32)  # diagonal included (self is a positive)
    row_sum = jnp.maximum(labels.sum(-1, keepdims=True), 1.0)
    targets = labels / row_sum

    img = _l2_normalize(global_image_embed.astype(jnp.float32))
    txt = _l2_normalize(global_text_embed.astype(jnp.float32))
    sim_it = (img @ txt.T) / temp
    sim_ti = (txt @ img.T) / temp
    col_ok = valid[None, :]
    sim_it = jnp.where(col_ok, sim_it, NEG_INF)
    sim_ti = jnp.where(col_ok, sim_ti, NEG_INF)
    loss_1 = _soft_ce(sim_it, targets, valid)
    loss_2 = _soft_ce(sim_ti, targets, valid)
    return (loss_1 + loss_2) / 2.0


def local_token_alignment_loss(local_image_embed: jnp.ndarray, local_text_embed: jnp.ndarray,
                               text_mask: Optional[jnp.ndarray], temp: float,
                               valid: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Token-level alignment: [B, P, D] patches vs [B, T, D] text tokens.

    text_mask: [B, T] (1=real token) or None. The reference computes this loss
    over pad positions too (no mask); pass text_mask=None for that behavior.
    """
    b, t, d_txt = local_text_embed.shape
    img = local_image_embed.astype(jnp.float32)
    txt = local_text_embed.astype(jnp.float32)

    att_sim = jnp.einsum("btd,bpd->btp", txt, img) / jnp.sqrt(jnp.float32(img.shape[-1]))
    att = jax.nn.softmax(att_sim, axis=-1)
    att_out = jnp.einsum("btp,bpd->btd", att, img)

    att_out = _l2_normalize(att_out)
    txt_n = _l2_normalize(txt)
    word_sim = jnp.einsum("bqd,bkd->bqk", txt_n, att_out) / temp  # [B, T, T]

    targets = jnp.arange(t)
    if text_mask is not None:
        tm = text_mask.astype(bool)
        word_sim = jnp.where(tm[:, None, :], word_sim, NEG_INF)   # mask pad columns
        row_mask = tm
    else:
        row_mask = jnp.ones((b, t), dtype=bool)
    if valid is not None:
        row_mask = row_mask & valid[:, None]

    logp_q = jax.nn.log_softmax(word_sim, axis=-1)
    picked_q = jnp.take_along_axis(logp_q, targets[None, :, None].repeat(b, 0), axis=-1)[..., 0]

    word_sim_t = jnp.swapaxes(word_sim, 1, 2)
    if text_mask is not None:
        tm = text_mask.astype(bool)
        word_sim_t = jnp.where(tm[:, None, :], word_sim_t, NEG_INF)
    logp_k = jax.nn.log_softmax(word_sim_t, axis=-1)
    picked_k = jnp.take_along_axis(logp_k, targets[None, :, None].repeat(b, 0), axis=-1)[..., 0]

    rm = row_mask.astype(jnp.float32)
    denom = jnp.maximum(jnp.sum(rm), 1.0)
    loss_q = -jnp.sum(picked_q * rm) / denom
    loss_k = -jnp.sum(picked_k * rm) / denom
    return (loss_q + loss_k) / 2.0
