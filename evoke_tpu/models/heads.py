"""Projection heads for the contrastive embedding space.

Capability parity: EVOKE modules/utils_v0511.py:131-209 — per-token Conv1d(k=1)
(== Dense) -> BatchNorm1d -> ReLU -> Conv1d(k=1), with a trailing affine-free
BatchNorm1d in the *finetune* heads only (the pretrain heads end without it).

TPU note: BatchNorm statistics reduce over (batch, token) axes. Under a jitted
GSPMD step with the batch sharded on ``dp``, jnp reductions are global, so batch
stats match the single-device math exactly — no explicit cross-replica sync op
is needed (XLA inserts the collective).
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

Dtype = Any


class SeqBatchNorm(nn.Module):
    """BatchNorm over (batch, token) per channel, matching torch BatchNorm1d on [B, C, T]."""

    use_affine: bool = True
    momentum: float = 0.9
    epsilon: float = 1e-5
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        # x: [B, T, C] (we keep channels last)
        return nn.BatchNorm(
            use_running_average=not train,
            momentum=self.momentum,
            epsilon=self.epsilon,
            use_bias=self.use_affine,
            use_scale=self.use_affine,
            axis=-1,
            dtype=self.dtype,
        )(x)


class ProjectionHead(nn.Module):
    """Dense -> BN -> ReLU -> Dense [-> affine-free BN]."""

    hidden_dim: int
    output_dim: int
    final_bn: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        """x: [B, T, C_in] -> [B, T, output_dim]. Also accepts [B, C_in] (global embeds)."""
        squeeze = x.ndim == 2
        if squeeze:
            x = x[:, None, :]
        x = nn.Dense(self.hidden_dim, dtype=self.dtype)(x)
        x = SeqBatchNorm(dtype=self.dtype)(x, train=train)
        x = nn.relu(x)
        x = nn.Dense(self.output_dim, dtype=self.dtype)(x)
        if self.final_bn:
            x = SeqBatchNorm(use_affine=False, dtype=self.dtype)(x, train=train)
        if squeeze:
            x = x[:, 0]
        return x
