"""ViT-B/32 visual encoder (alternative to ResNet-101).

Capability parity: the reference's Inference model offers a 'ViT-B-32' visual
encoder via a CLIP wrapper (EVOKE models/model_pretrain_finetune_v0425_ablation.py
:429-651, models/vision_encoder/clip_model.py — its standalone vit.py is broken,
SURVEY §2.4 'dead/experimental vision'). This is a clean TPU-native ViT: conv
patchify, CLS token, learned positions, pre-LN transformer; returns
(patch_tokens [B, N, width], global [B, width]) matching the VisualExtractor
surface (a Dense maps width -> d_vf so downstream dims are unchanged).
"""

from __future__ import annotations

from typing import Any, Tuple

import flax.linen as nn
import jax.numpy as jnp

from evoke_tpu.models.layers import MultiHeadAttention, PositionwiseFFN

Dtype = Any


class ViTBlock(nn.Module):
    width: int
    num_heads: int
    mlp_dim: int
    dropout_rate: float = 0.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic=True):
        h = nn.LayerNorm(dtype=self.dtype)(x)
        x = x + MultiHeadAttention(self.num_heads, self.width, self.dropout_rate,
                                   dtype=self.dtype)(h, h, h, deterministic=deterministic)
        h = nn.LayerNorm(dtype=self.dtype)(x)
        return x + PositionwiseFFN(self.width, self.mlp_dim, self.dropout_rate,
                                   dtype=self.dtype,
                                   activation=lambda y: nn.gelu(y, approximate=False)
                                   )(h, deterministic=deterministic)


class ViTExtractor(nn.Module):
    """ViT-B/32 defaults; output dim lifted to d_vf for drop-in compatibility."""

    patch_size: int = 32
    width: int = 768
    num_layers: int = 12
    num_heads: int = 12
    mlp_dim: int = 3072
    d_vf: int = 2048
    max_patches: int = 256
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, images, train: bool = False) -> Tuple[jnp.ndarray, jnp.ndarray]:
        b = images.shape[0]
        x = nn.Conv(self.width, (self.patch_size, self.patch_size),
                    strides=(self.patch_size, self.patch_size), padding="VALID",
                    dtype=self.dtype, name="patchify")(images)
        x = x.reshape(b, -1, self.width)
        n = x.shape[1]
        cls = self.param("cls", nn.initializers.normal(0.02), (1, 1, self.width))
        x = jnp.concatenate([jnp.tile(cls.astype(self.dtype), (b, 1, 1)), x], axis=1)
        pos = self.param("pos_embed", nn.initializers.normal(0.02),
                         (1, self.max_patches + 1, self.width))
        x = x + pos[:, : n + 1].astype(self.dtype)
        for i in range(self.num_layers):
            x = ViTBlock(self.width, self.num_heads, self.mlp_dim, dtype=self.dtype,
                         name=f"block_{i}")(x, deterministic=not train)
        x = nn.LayerNorm(dtype=self.dtype, name="final_ln")(x)
        x = nn.Dense(self.d_vf, dtype=self.dtype, name="proj")(x)
        return x[:, 1:, :], x[:, 0, :]
