"""Masked language-model NLL (EVOKE modules/loss.py:5-21 behavioral contract)."""

from __future__ import annotations

import jax.numpy as jnp


def lm_loss(log_probs: jnp.ndarray, target_ids: jnp.ndarray, target_mask: jnp.ndarray,
            sample_mask: jnp.ndarray | None = None) -> jnp.ndarray:
    """log_probs: [B, T, V] (position i predicts token i+1), ids/mask: [B, T].

    loss = -sum(logp[b, i, ids[b, i+1]] * mask[b, i+1]) / sum(mask[:, 1:])
    sample_mask: optional [B] validity (padding batch rows contribute nothing).
    """
    tgt = target_ids[:, 1:]
    msk = target_mask[:, 1:].astype(jnp.float32)
    if sample_mask is not None:
        msk = msk * sample_mask[:, None].astype(jnp.float32)
    lp = log_probs[:, : tgt.shape[1], :]
    picked = jnp.take_along_axis(lp, tgt[..., None], axis=-1)[..., 0]
    denom = jnp.maximum(jnp.sum(msk), 1.0)
    return -jnp.sum(picked * msk) / denom
