"""ResNet-101 visual extractor (Flax linen, NHWC, bfloat16-friendly).

Capability parity: EVOKE modules/visual_extractor.py — torchvision resnet101
minus fc/avgpool, returning (patch_feats [B, N, 2048], avg_feats [B, 2048]).
The reference's 224 path uses AvgPool2d(7) over the 7x7 C5 grid (== mean over
all patches at 224); its 384 path (ResNetTemp) mean-pools patches. We mean-pool
in both cases, which is exactly equivalent at 224 and matches ResNetTemp at 384.

TPU notes: convolutions run in NHWC (XLA's preferred layout); params stay
float32 with an optional bfloat16 compute dtype for the MXU.
"""

from __future__ import annotations

from typing import Any, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

Dtype = Any


class Bottleneck(nn.Module):
    """torchvision Bottleneck: 1x1 -> 3x3 (stride) -> 1x1(x4), BN+ReLU, projection shortcut."""

    features: int
    stride: int = 1
    project: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        norm = lambda name: nn.BatchNorm(use_running_average=not train, momentum=0.9,
                                         epsilon=1e-5, dtype=self.dtype, name=name)
        residual = x
        y = nn.Conv(self.features, (1, 1), use_bias=False, dtype=self.dtype, name="conv1")(x)
        y = nn.relu(norm("bn1")(y))
        y = nn.Conv(self.features, (3, 3), strides=(self.stride, self.stride),
                    padding=((1, 1), (1, 1)), use_bias=False, dtype=self.dtype, name="conv2")(y)
        y = nn.relu(norm("bn2")(y))
        y = nn.Conv(self.features * 4, (1, 1), use_bias=False, dtype=self.dtype, name="conv3")(y)
        y = norm("bn3")(y)
        if self.project:
            residual = nn.Conv(self.features * 4, (1, 1), strides=(self.stride, self.stride),
                               use_bias=False, dtype=self.dtype, name="downsample_conv")(x)
            residual = nn.BatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5,
                                    dtype=self.dtype, name="downsample_bn")(residual)
        return nn.relu(y + residual)


class ResNet101(nn.Module):
    """Backbone through C5. Input [B, H, W, 3] -> [B, H/32, W/32, 2048]."""

    stage_sizes: Sequence[int] = (3, 4, 23, 3)
    dtype: Dtype = jnp.float32
    # jax.checkpoint each Bottleneck: backward recomputes block activations
    # instead of keeping them alive — the activations are the train-step
    # memory ceiling (batch 96+96 @224 OOMs a v5e-1 without this), the
    # recompute is cheap conv FLOPs. Same math, same param tree.
    remat: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(64, (7, 7), strides=(2, 2), padding=((3, 3), (3, 3)), use_bias=False,
                    dtype=self.dtype, name="conv1")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5,
                         dtype=self.dtype, name="bn1")(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        # static_argnums=(2,): `train` (arg 2 after self, x) drives Python
        # control flow (BatchNorm mode) and must stay concrete under remat
        block_cls = (nn.remat(Bottleneck, static_argnums=(2,)) if self.remat
                     else Bottleneck)
        for stage, n_blocks in enumerate(self.stage_sizes):
            features = 64 * (2 ** stage)
            for i in range(n_blocks):
                stride = 2 if (stage > 0 and i == 0) else 1
                x = block_cls(features, stride=stride, project=(i == 0), dtype=self.dtype,
                              name=f"layer{stage + 1}_{i}")(x, train)
        return x


class VisualExtractor(nn.Module):
    """ResNet-101 -> (patch_feats [B, N, 2048], avg_feats [B, 2048])."""

    dtype: Dtype = jnp.float32
    remat: bool = False

    def setup(self):
        self.backbone = ResNet101(dtype=self.dtype, remat=self.remat)

    def __call__(self, images, train: bool = False) -> Tuple[jnp.ndarray, jnp.ndarray]:
        feats = self.backbone(images, train=train)
        b, h, w, c = feats.shape
        patches = feats.reshape(b, h * w, c)
        avg = jnp.mean(patches, axis=1)
        return patches, avg
