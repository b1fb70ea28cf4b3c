"""Stage-1 pretraining model: multi-view contrastive alignment.

Capability parity: EVOKE ``Pretrain``
(models/model_pretrain_finetune_v0425_ablation.py:232-428 and _ori:327-571):
ResNet-101 + BERT text encoder with projection heads; losses = multi-positive
image-image InfoNCE (on raw global feats) + multiview fusion + global image-text
alignment + local token alignment. ``pretrain_loss`` selects the ablation subset
('all' = the _ori full loss: multiview + instance + local).
"""

from __future__ import annotations

from typing import Any, Dict

import flax.linen as nn
import jax.numpy as jnp

from evoke_tpu.losses.contrastive import (global_alignment_loss, local_token_alignment_loss,
                                          multi_positive_image_loss,
                                          multi_positive_image_loss_avg)
from evoke_tpu.models.fusion import MultiviewFusion
from evoke_tpu.models.heads import ProjectionHead
from evoke_tpu.models.resnet import VisualExtractor
from evoke_tpu.models.text_encoder import TextEncoder

Dtype = Any


class PretrainModel(nn.Module):
    vocab_size: int
    d_vf: int = 2048
    output_dim: int = 2048
    encoder_hidden_size: int = 768
    encoder_num_layers: int = 6
    encoder_num_heads: int = 12
    encoder_intermediate_size: int = 3072
    proj_num_heads: int = 8
    fusion_wide_qkv: bool = True   # reference dimensioning (utils_v0511.py:210-281)
    # static bound on same-study partner rows per anchor: None = dense masked
    # fusion attention over the whole batch (exact for any multiplicity);
    # int G = grouped partner-gather attention over (1+G)*T keys (identical
    # output when every anchor has <= G partners; B/(1+G)x less MXU work)
    fusion_max_partners: Any = None
    instance_temp: float = 0.5
    region_temp: float = 0.5
    is_multiview_learning: bool = True
    pretrain_loss: str = "all"         # all | mpc | mpc+global | mpc+local | global+local
    # soft = v0401 soft-target rows (Pretrain); avg = PretrainNewMulPos's
    # averaged-positive-logit formulation (v0425_ori.py:573,665)
    mul_pos_formulation: str = "soft"
    mask_local_pad: bool = True
    # SciBERT-style encoder dropout (HF hidden/attention dropout default)
    encoder_dropout: float = 0.1
    # jax.checkpoint the ResNet bottlenecks (same math; backward recomputes
    # block activations — lifts the train-batch memory ceiling)
    remat_visual: bool = False
    dtype: Dtype = jnp.float32

    def setup(self):
        self.visual_extractor = VisualExtractor(dtype=self.dtype,
                                                remat=self.remat_visual)
        self.text_encoder = TextEncoder(
            self.vocab_size, self.encoder_hidden_size, self.encoder_num_layers,
            self.encoder_num_heads, self.encoder_intermediate_size,
            dropout_rate=self.encoder_dropout, dtype=self.dtype)
        # pretrain heads end WITHOUT the affine-free BN (utils_v0511.py:131-168)
        self.visual_head = ProjectionHead(self.output_dim, self.output_dim,
                                          final_bn=False, dtype=self.dtype)
        self.text_head = ProjectionHead(self.output_dim, self.output_dim,
                                        final_bn=False, dtype=self.dtype)
        self.fusion = MultiviewFusion(self.d_vf, self.proj_num_heads,
                                      wide_qkv=self.fusion_wide_qkv,
                                      max_partners=self.fusion_max_partners,
                                      dtype=self.dtype)

    def encode_images(self, images, pid_codes, valid, n_anchor: int, train=False):
        """images: [B, H, W, 3] (anchors first) ->
        (proj [n_anchor, 1+P, out], raw_global [B, d_vf])."""
        patches, avg = self.visual_extractor(images, train=train)
        image_embed = jnp.concatenate([avg[:, None, :], patches], axis=1)
        if self.is_multiview_learning:
            fused, _ = self.fusion(image_embed, pid_codes, valid, n_anchor,
                                   deterministic=not train)
        else:
            fused = self.fusion.norm_only(image_embed[:n_anchor])
        proj = self.visual_head(fused, train=train)
        return proj, avg

    def encode_text(self, input_ids, attention_mask, train=False):
        text = self.text_encoder(input_ids, attention_mask, deterministic=not train)
        return self.text_head(text, train=train)

    def __call__(self, images, text_ids, text_mask, pid_codes, valid, train=False
                 ) -> Dict[str, jnp.ndarray]:
        """Batch layout (reference contract, dataloaders_v0401.py:60-116):
        images [B, H, W, 3] = n_anchor study anchors first, then deduped auxiliary
        views; text_ids/text_mask [n_anchor, L] per-study texts; pid_codes/valid [B].

        Returns the loss dict {multiview_loss, instance_loss, sen_text_loss, all_loss}.
        """
        n_anchor = text_ids.shape[0]
        proj, raw_global = self.encode_images(images, pid_codes, valid, n_anchor, train=train)
        v_fc, v_att = proj[:, 0, :], proj[:, 1:, :]
        anchor_pids = pid_codes[:n_anchor]
        anchor_valid = valid[:n_anchor]

        zero = jnp.float32(0.0)
        mul_pos = zero
        if self.is_multiview_learning:
            # over ALL images (anchors + auxiliaries), on raw global feats (:374-377)
            mp_fn = (multi_positive_image_loss_avg if self.mul_pos_formulation == "avg"
                     else multi_positive_image_loss)
            mul_pos = mp_fn(raw_global, pid_codes, valid, self.region_temp)

        if self.pretrain_loss == "mpc":
            return {"multiview_loss": mul_pos, "instance_loss": zero,
                    "sen_text_loss": zero, "all_loss": mul_pos}

        tproj = self.encode_text(text_ids, text_mask, train=train)
        t_fc, t_att = tproj[:, 0, :], tproj[:, 1:, :]

        instance = zero
        local = zero
        if self.pretrain_loss in ("all", "mpc+global", "global+local"):
            instance = global_alignment_loss(v_fc, t_fc, anchor_pids, anchor_valid,
                                             self.instance_temp)
        if self.pretrain_loss in ("all", "mpc+local", "global+local"):
            local = local_token_alignment_loss(
                v_att, t_att, text_mask[:, 1:] if self.mask_local_pad else None,
                self.region_temp, valid=anchor_valid)
        if self.pretrain_loss == "global+local":
            mul_pos = zero

        all_loss = mul_pos + instance + local
        return {"multiview_loss": mul_pos, "instance_loss": instance,
                "sen_text_loss": local, "all_loss": all_loss}
