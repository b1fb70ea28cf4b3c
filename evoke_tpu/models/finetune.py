"""Stage-2 finetune model: knowledge-guided report generation.

Capability parity: EVOKE ``FineTune``
(models/model_pretrain_finetune_v0425_ablation.py:23-231): visual encoder ->
multiview fusion -> finetune projection heads (with trailing affine-free BN) ->
N x BertCrossLayer co-attention over the encoded clinical indication (or N x
BertLayer self-attention when no indication) -> R2Gen decoder. The decoder
consumes only the patch tokens (index 1:) of the fused sequence, exactly as the
reference's ``_forward`` splits them (encoder_decoder.py:375-383).
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import flax.linen as nn
import jax.numpy as jnp

from evoke_tpu.losses.lm import lm_loss
from evoke_tpu.models.fusion import MultiviewFusion
from evoke_tpu.models.heads import ProjectionHead
from evoke_tpu.models.layers import BertCrossLayer, BertLayer, make_cross_mask
from evoke_tpu.models.resnet import VisualExtractor
from evoke_tpu.models.rm_decoder import RMDecoder
from evoke_tpu.models.text_encoder import TextEncoder

Dtype = Any


class FinetuneModel(nn.Module):
    vocab_size: int
    d_vf: int = 2048
    output_dim: int = 2048
    encoder_hidden_size: int = 768
    encoder_num_layers: int = 6
    encoder_num_heads: int = 12
    encoder_intermediate_size: int = 3072
    fusion_num_heads: int = 8
    fusion_intermediate_size: int = 3072
    sk_fusion_num_layers: int = 1
    proj_num_heads: int = 8
    fusion_wide_qkv: bool = True   # reference dimensioning (utils_v0511.py:210-281)
    # static bound on same-study partner rows per anchor: None = dense masked
    # fusion attention over the whole batch (exact for any multiplicity);
    # int G = grouped partner-gather attention over (1+G)*T keys (identical
    # output when every anchor has <= G partners; B/(1+G)x less MXU work)
    fusion_max_partners: Any = None
    d_model: int = 512
    d_ff: int = 512
    num_heads: int = 8
    num_layers: int = 3
    dropout: float = 0.0
    drop_prob_lm: float = 0.5
    rm_num_slots: int = 3
    rm_num_heads: int = 8
    rm_d_model: int = 512
    max_seq_len: int = 100
    is_multiview_learning: bool = True
    decoder_kind: str = "r2gen"     # r2gen | cmn | causal | bertgen (ref: text_decoder)
    visual_encoder: str = "resnet101"   # resnet101 | vit_b32 (reference Inference :429)
    cmm_size: int = 2048
    cmm_dim: int = 512
    cmn_topk: int = 32
    # SciBERT-style encoder dropout (HF hidden/attention dropout default)
    encoder_dropout: float = 0.1
    # jax.checkpoint the ResNet bottlenecks (same math; backward recomputes
    # block activations — lifts the train-batch memory ceiling)
    remat_visual: bool = False
    dtype: Dtype = jnp.float32

    def setup(self):
        if self.visual_encoder == "vit_b32":
            from evoke_tpu.models.vit import ViTExtractor
            self.visual_extractor = ViTExtractor(d_vf=self.d_vf, dtype=self.dtype)
        else:
            self.visual_extractor = VisualExtractor(dtype=self.dtype,
                                                    remat=self.remat_visual)
        self.text_encoder = TextEncoder(
            self.vocab_size, self.encoder_hidden_size, self.encoder_num_layers,
            self.encoder_num_heads, self.encoder_intermediate_size,
            dropout_rate=self.encoder_dropout, dtype=self.dtype)
        # finetune heads end WITH the affine-free BN (utils_v0511.py:171-209)
        self.visual_head = ProjectionHead(self.output_dim, self.output_dim,
                                          final_bn=True, dtype=self.dtype)
        self.text_head = ProjectionHead(self.output_dim, self.output_dim,
                                        final_bn=True, dtype=self.dtype)
        self.fusion = MultiviewFusion(self.d_vf, self.proj_num_heads,
                                      wide_qkv=self.fusion_wide_qkv,
                                      max_partners=self.fusion_max_partners,
                                      dtype=self.dtype)
        # names match the reference's two-group optimizer split (optimizers.py:30)
        self.multimodal_fusion_layers = [
            BertCrossLayer(self.output_dim, self.fusion_num_heads,
                           self.fusion_intermediate_size, dtype=self.dtype,
                           name=f"multimodal_fusion_layers_{i}")
            for i in range(self.sk_fusion_num_layers)]
        self.visual_self_atten_layers = [
            BertLayer(self.output_dim, self.fusion_num_heads,
                      self.fusion_intermediate_size, dtype=self.dtype,
                      name=f"visual_self_atten_layers_{i}")
            for i in range(self.sk_fusion_num_layers)]
        if self.decoder_kind == "bertgen":
            from evoke_tpu.models.causal_decoder import BertGenerationDecoder
            self.text_decoder = BertGenerationDecoder(
                vocab_size=self.vocab_size, d_model=self.d_model,
                d_ff=max(self.d_ff, 4 * self.d_model), d_vf=self.output_dim,
                num_layers=self.num_layers, num_heads=self.num_heads,
                dropout_rate=self.dropout, drop_prob_lm=self.drop_prob_lm,
                max_seq_len=self.max_seq_len, dtype=self.dtype)
        elif self.decoder_kind == "causal":
            from evoke_tpu.models.causal_decoder import CausalDecoder
            self.text_decoder = CausalDecoder(
                vocab_size=self.vocab_size, d_model=self.d_model,
                d_ff=max(self.d_ff, 4 * self.d_model), d_vf=self.output_dim,
                num_layers=self.num_layers, num_heads=self.num_heads,
                dropout_rate=self.dropout, drop_prob_lm=self.drop_prob_lm,
                max_seq_len=self.max_seq_len, dtype=self.dtype)
        elif self.decoder_kind == "cmn":
            from evoke_tpu.models.cmn import CMNDecoder
            self.text_decoder = CMNDecoder(
                vocab_size=self.vocab_size, d_model=self.d_model, d_ff=self.d_ff,
                d_vf=self.output_dim, num_layers=self.num_layers,
                num_heads=self.num_heads, dropout_rate=self.dropout,
                drop_prob_lm=self.drop_prob_lm, cmm_size=self.cmm_size,
                cmm_dim=self.cmm_dim, topk=self.cmn_topk,
                max_seq_len=self.max_seq_len, dtype=self.dtype)
        else:
            self.text_decoder = RMDecoder(
                vocab_size=self.vocab_size, d_model=self.d_model, d_ff=self.d_ff,
                d_vf=self.output_dim, num_layers=self.num_layers,
                num_heads=self.num_heads, dropout_rate=self.dropout,
                drop_prob_lm=self.drop_prob_lm, rm_num_slots=self.rm_num_slots,
                rm_num_heads=self.rm_num_heads, rm_d_model=self.rm_d_model,
                max_seq_len=self.max_seq_len, dtype=self.dtype)

    # ---- encoding ----

    def encode(self, images, pid_codes, valid, n_anchor: int,
               inc_ids: Optional[jnp.ndarray] = None,
               inc_mask: Optional[jnp.ndarray] = None, train: bool = False) -> jnp.ndarray:
        """images [B, H, W, 3] (n_anchor study anchors first, then auxiliary views)
        -> encoder_hidden_states [n_anchor, 1+P, output_dim]."""
        patches, avg = self.visual_extractor(images, train=train)
        image_embed = jnp.concatenate([avg[:, None, :], patches], axis=1)
        if self.is_multiview_learning:
            fused, _ = self.fusion(image_embed, pid_codes, valid, n_anchor,
                                   deterministic=not train)
        else:
            fused = self.fusion.norm_only(image_embed[:n_anchor])
        x = self.visual_head(fused, train=train)

        if inc_ids is not None:
            inc_feats = self.text_encoder(inc_ids, inc_mask, deterministic=not train)
            inc_feats = self.text_head(inc_feats, train=train)
            cross_mask = make_cross_mask(inc_mask)
            for layer in self.multimodal_fusion_layers:
                x = layer(x, inc_feats, self_mask=None, cross_mask=cross_mask,
                          deterministic=not train)
        else:
            for layer in self.visual_self_atten_layers:
                x = layer(x, mask=None, deterministic=not train)
        return x

    # ---- training forward ----

    def __call__(self, images, report_ids, report_mask, pid_codes, valid,
                 inc_ids: Optional[jnp.ndarray] = None, inc_mask: Optional[jnp.ndarray] = None,
                 train: bool = False) -> Dict[str, jnp.ndarray]:
        n_anchor = report_ids.shape[0]
        hidden = self.encode(images, pid_codes, valid, n_anchor, inc_ids, inc_mask,
                             train=train)
        att_feats = hidden[:, 1:, :]
        att_mask = jnp.ones(att_feats.shape[:2], dtype=jnp.int32)
        log_probs = self.text_decoder(att_feats, att_mask, report_ids, report_mask,
                                      deterministic=not train)
        lm = lm_loss(log_probs, report_ids, report_mask, sample_mask=valid[:n_anchor])
        return {"lm": lm, "all_loss": lm}

    def warmup(self, images, report_ids, report_mask, pid_codes, valid, inc_ids, inc_mask):
        """Trace BOTH the indication and no-indication branches so ``init`` creates
        every parameter (flax only materializes params for traced modules)."""
        out_no_inc = self.__call__(images, report_ids, report_mask, pid_codes, valid)
        out_inc = self.__call__(images, report_ids, report_mask, pid_codes, valid,
                                inc_ids, inc_mask)
        return out_no_inc, out_inc

    # ---- generation support (used by decode/beam.py) ----

    def encode_for_decode(self, images, pid_codes, valid, n_anchor: int,
                          inc_ids: Optional[jnp.ndarray] = None,
                          inc_mask: Optional[jnp.ndarray] = None):
        """-> (enc [n_anchor, P, d_model], att_mask [n_anchor, P]) for decode steps."""
        hidden = self.encode(images, pid_codes, valid, n_anchor, inc_ids, inc_mask,
                             train=False)
        att_feats = hidden[:, 1:, :]
        att_mask = jnp.ones(att_feats.shape[:2], dtype=jnp.int32)
        enc = self.text_decoder.encode(att_feats, att_mask, deterministic=True)
        return enc, att_mask

    def init_decode_state(self, enc, batch: int, max_len: Optional[int] = None,
                          kv_dtype: Optional[str] = None):
        if kv_dtype:  # only RMDecoder implements quantized caches today
            return self.text_decoder.init_decode_state(enc, batch, max_len, kv_dtype)
        return self.text_decoder.init_decode_state(enc, batch, max_len)

    def decode_step(self, tok, pos, state, att_mask, return_logits=False, age=None,
                    return_topk=None, topk_suppress=()):
        extra = ({"return_topk": return_topk, "topk_suppress": topk_suppress}
                 if return_topk else {})
        if age is not None:  # ring-cache continuous serving (decode/continuous.py)
            return self.text_decoder.decode_step(tok, pos, state, att_mask,
                                                 return_logits=return_logits, age=age,
                                                 **extra)
        return self.text_decoder.decode_step(tok, pos, state, att_mask,
                                             return_logits=return_logits, **extra)
