"""Torch-checkpoint importers: torchvision ResNet-101, HF BERT (SciBERT), CheXbert.

Capability parity: the reference initializes its encoders from torch checkpoints
(EVOKE modules/visual_extractor.py:12-14 resnet101 state_dict; models/
language_encoder/language_model.py:120-151 AutoModel with overridden vocab/
hidden/layers + ignore_mismatched_sizes; modules/metrics/f1chexbert.py:119-158
chexbert.pth). These functions map those state_dicts onto our Flax trees.

Conventions: torch Conv2d OIHW -> flax HWIO (transpose 2,3,1,0); torch Linear
[out,in] -> flax kernel [in,out]; BatchNorm weight/bias -> scale/bias with
running stats into the 'batch_stats' collection. Shape-mismatched tensors are
skipped and reported (the reference's ignore_mismatched_sizes behavior — e.g.
token embeddings when the vocab is overridden).
"""

from __future__ import annotations

from typing import Any, Dict, List, Tuple

import numpy as np


def load_torch_state_dict(path: str) -> Dict[str, np.ndarray]:
    import torch

    blob = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(blob, dict) and "state_dict" in blob:
        blob = blob["state_dict"]
    if isinstance(blob, dict) and "model_state_dict" in blob:
        blob = blob["model_state_dict"]
    return {k: v.detach().cpu().numpy() for k, v in blob.items()
            if hasattr(v, "detach")}


def _assign(tree: Dict, path: List[str], value: np.ndarray,
            report: Dict[str, int], key: str) -> None:
    node = tree
    for p in path[:-1]:
        if p not in node:
            report.setdefault("missing", 0)
            report["missing"] += 1
            report.setdefault("missing_keys", []).append(f"{key} -> {'/'.join(path)}")
            return
        node = node[p]
    leaf = path[-1]
    if leaf not in node:
        report["missing"] += 1
        report.setdefault("missing_keys", []).append(f"{key} -> {'/'.join(path)}")
        return
    if tuple(np.shape(node[leaf])) != tuple(value.shape):
        report["mismatched"] += 1
        report.setdefault("mismatched_keys", []).append(
            f"{key} -> {'/'.join(path)}: {np.shape(node[leaf])} vs {value.shape}")
        return
    node[leaf] = value.astype(np.asarray(node[leaf]).dtype)
    report["loaded"] += 1


def _conv(w: np.ndarray) -> np.ndarray:
    return np.transpose(w, (2, 3, 1, 0))


def _dense(w: np.ndarray) -> np.ndarray:
    return np.transpose(w)


def import_resnet101(state_dict: Dict[str, np.ndarray], variables: Dict
                     ) -> Tuple[Dict, Dict[str, int]]:
    """Map a torchvision resnet101 state_dict onto VisualExtractor variables.

    Returns (new variables, report). ``variables`` = {'params': .., 'batch_stats': ..}
    with our tree rooted at backbone (params['backbone'][...]).
    """
    import jax

    variables = jax.tree_util.tree_map(np.asarray, jax.device_get(variables))
    params = variables["params"]["backbone"]
    stats = variables["batch_stats"]["backbone"]
    report = {"loaded": 0, "mismatched": 0, "missing": 0}

    def put_bn(src: str, dst: List[str]):
        _assign(params, dst + ["scale"], state_dict[f"{src}.weight"], report, src)
        _assign(params, dst + ["bias"], state_dict[f"{src}.bias"], report, src)
        _assign(stats, dst + ["mean"], state_dict[f"{src}.running_mean"], report, src)
        _assign(stats, dst + ["var"], state_dict[f"{src}.running_var"], report, src)

    _assign(params, ["conv1", "kernel"], _conv(state_dict["conv1.weight"]), report, "conv1")
    put_bn("bn1", ["bn1"])
    stage_sizes = (3, 4, 23, 3)
    for s, n_blocks in enumerate(stage_sizes, start=1):
        for i in range(n_blocks):
            src = f"layer{s}.{i}"
            dst = f"layer{s}_{i}"
            for c in ("conv1", "conv2", "conv3"):
                _assign(params, [dst, c, "kernel"], _conv(state_dict[f"{src}.{c}.weight"]),
                        report, src)
            for b in ("bn1", "bn2", "bn3"):
                put_bn(f"{src}.{b}", [dst, b])
            if f"{src}.downsample.0.weight" in state_dict:
                _assign(params, [dst, "downsample_conv", "kernel"],
                        _conv(state_dict[f"{src}.downsample.0.weight"]), report, src)
                put_bn(f"{src}.downsample.1", [dst, "downsample_bn"])
    return variables, report


def import_bert_encoder(state_dict: Dict[str, np.ndarray], variables: Dict,
                        prefix: str = "") -> Tuple[Dict, Dict[str, int]]:
    """Map an HF BertModel state_dict onto our TextEncoder params.

    Shape-mismatched tensors (e.g. word embeddings under an overridden vocab)
    are skipped, mirroring ignore_mismatched_sizes=True. Layers beyond our
    configured depth are ignored (the reference keeps the first N).
    """
    import jax

    variables = jax.tree_util.tree_map(np.asarray, jax.device_get(variables))
    params = variables["params"] if "params" in variables else variables
    report = {"loaded": 0, "mismatched": 0, "missing": 0}

    def sd(key: str):
        return state_dict.get(prefix + key)

    emb = params["embeddings"]
    pairs = [
        ("embeddings.word_embeddings.weight", ["word_embeddings", "embedding"], None),
        ("embeddings.position_embeddings.weight", ["position_embeddings", "embedding"], None),
        ("embeddings.token_type_embeddings.weight", ["token_type_embeddings", "embedding"],
         None),
        ("embeddings.LayerNorm.weight", ["LayerNorm_0", "scale"], None),
        ("embeddings.LayerNorm.bias", ["LayerNorm_0", "bias"], None),
    ]
    for src, dst, tf in pairs:
        v = sd(src)
        if v is not None:
            _assign(emb, dst, tf(v) if tf else v, report, src)

    n_layers = len([k for k in params if k.startswith("layer_")])
    for i in range(n_layers):
        if sd(f"encoder.layer.{i}.attention.self.query.weight") is None:
            continue
        lp = params[f"layer_{i}"]
        att = f"encoder.layer.{i}.attention"
        for name, dstk in (("query", "wq"), ("key", "wk"), ("value", "wv")):
            _assign(lp, ["attention", dstk, "kernel"],
                    _dense(sd(f"{att}.self.{name}.weight")), report, att)
            _assign(lp, ["attention", dstk, "bias"], sd(f"{att}.self.{name}.bias"),
                    report, att)
        _assign(lp, ["attention", "out", "Dense_0", "kernel"],
                _dense(sd(f"{att}.output.dense.weight")), report, att)
        _assign(lp, ["attention", "out", "Dense_0", "bias"],
                sd(f"{att}.output.dense.bias"), report, att)
        _assign(lp, ["attention", "out", "LayerNorm_0", "scale"],
                sd(f"{att}.output.LayerNorm.weight"), report, att)
        _assign(lp, ["attention", "out", "LayerNorm_0", "bias"],
                sd(f"{att}.output.LayerNorm.bias"), report, att)
        ff = f"encoder.layer.{i}"
        _assign(lp, ["ffn", "Dense_0", "kernel"],
                _dense(sd(f"{ff}.intermediate.dense.weight")), report, ff)
        _assign(lp, ["ffn", "Dense_0", "bias"], sd(f"{ff}.intermediate.dense.bias"),
                report, ff)
        _assign(lp, ["ffn", "BertSelfOutput_0", "Dense_0", "kernel"],
                _dense(sd(f"{ff}.output.dense.weight")), report, ff)
        _assign(lp, ["ffn", "BertSelfOutput_0", "Dense_0", "bias"],
                sd(f"{ff}.output.dense.bias"), report, ff)
        _assign(lp, ["ffn", "BertSelfOutput_0", "LayerNorm_0", "scale"],
                sd(f"{ff}.output.LayerNorm.weight"), report, ff)
        _assign(lp, ["ffn", "BertSelfOutput_0", "LayerNorm_0", "bias"],
                sd(f"{ff}.output.LayerNorm.bias"), report, ff)
    if "params" in variables:
        variables["params"] = params
        return variables, report
    return params, report


def detect_bert_prefix(state_dict: Dict[str, np.ndarray]) -> str:
    for cand in ("", "bert.", "bert_model.", "model.", "module.bert."):
        if f"{cand}embeddings.word_embeddings.weight" in state_dict:
            return cand
    return ""


# --------------------------------------------------------------------------
# Full FineTune tree import (released EVOKE model_best.pth format)
# --------------------------------------------------------------------------

def _strip_module(state_dict: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """Drop a DataParallel 'module.' prefix if every key carries it."""
    if state_dict and all(k.startswith("module.") for k in state_dict):
        return {k[len("module."):]: v for k, v in state_dict.items()}
    return state_dict


def _sub_dict(state_dict: Dict[str, np.ndarray], prefix: str) -> Dict[str, np.ndarray]:
    return {k[len(prefix):]: v for k, v in state_dict.items() if k.startswith(prefix)}


_RESNET_SEQ = {"0": "conv1", "1": "bn1", "4": "layer1", "5": "layer2",
               "6": "layer3", "7": "layer4"}


def _resnet_seq_to_named(sd: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """EVOKE wraps torchvision resnet children in nn.Sequential
    (modules/visual_extractor.py:15-16), so keys are 'model.0.weight' etc.
    Remap the Sequential indices back to torchvision names."""
    out = {}
    for k, v in sd.items():
        idx, _, rest = k.partition(".")
        name = _RESNET_SEQ.get(idx)
        if name is None:
            continue
        out[f"{name}.{rest}" if rest else name] = v
    return out


def _import_bert_hf_layer(lp: Dict, sd, at: str, report: Dict[str, int]) -> None:
    """One HF-format Bert(Cross)Layer attention block: sd keys rooted at
    '{at}.self.*' / '{at}.output.*' -> our BertAttentionBlock tree ``lp``."""
    for name, dstk in (("query", "wq"), ("key", "wk"), ("value", "wv")):
        w = sd(f"{at}.self.{name}.weight")
        if w is None:
            report["missing"] += 1
            continue
        _assign(lp, [dstk, "kernel"], _dense(w), report, at)
        _assign(lp, [dstk, "bias"], sd(f"{at}.self.{name}.bias"), report, at)
    if sd(f"{at}.output.dense.weight") is not None:
        _assign(lp, ["out", "Dense_0", "kernel"], _dense(sd(f"{at}.output.dense.weight")),
                report, at)
        _assign(lp, ["out", "Dense_0", "bias"], sd(f"{at}.output.dense.bias"), report, at)
        _assign(lp, ["out", "LayerNorm_0", "scale"], sd(f"{at}.output.LayerNorm.weight"),
                report, at)
        _assign(lp, ["out", "LayerNorm_0", "bias"], sd(f"{at}.output.LayerNorm.bias"),
                report, at)


def _import_fusion_block(lp: Dict, sd, report: Dict[str, int], cross: bool) -> None:
    """BertLayer / BertCrossLayer (reference bert_model.py:444,548) -> our tree."""
    _import_bert_hf_layer(lp["attention"], sd, "attention", report)
    if cross:
        _import_bert_hf_layer(lp["crossattention"], sd, "crossattention", report)
    _assign(lp, ["ffn", "Dense_0", "kernel"], _dense(sd("intermediate.dense.weight")),
            report, "intermediate")
    _assign(lp, ["ffn", "Dense_0", "bias"], sd("intermediate.dense.bias"),
            report, "intermediate")
    _assign(lp, ["ffn", "BertSelfOutput_0", "Dense_0", "kernel"],
            _dense(sd("output.dense.weight")), report, "output")
    _assign(lp, ["ffn", "BertSelfOutput_0", "Dense_0", "bias"], sd("output.dense.bias"),
            report, "output")
    _assign(lp, ["ffn", "BertSelfOutput_0", "LayerNorm_0", "scale"],
            sd("output.LayerNorm.weight"), report, "output")
    _assign(lp, ["ffn", "BertSelfOutput_0", "LayerNorm_0", "bias"],
            sd("output.LayerNorm.bias"), report, "output")


def _import_projection_head(params: Dict, stats: Dict, sd, report: Dict[str, int]) -> None:
    """VisualProjectionHeadFinetune / TextProjectionHeadFinetune
    (utils_v0511.py:171-209): Conv1d(k=1) -> BN -> ReLU -> Conv1d(k=1) -> BN(affine=False).
    Conv1d weight [out, in, 1] == Dense kernel [in, out] after squeeze+transpose."""
    def conv1d(w):
        return np.transpose(w[:, :, 0])

    _assign(params, ["Dense_0", "kernel"], conv1d(sd("head.0.weight")), report, "head.0")
    _assign(params, ["Dense_0", "bias"], sd("head.0.bias"), report, "head.0")
    _assign(params, ["SeqBatchNorm_0", "BatchNorm_0", "scale"], sd("head.1.weight"),
            report, "head.1")
    _assign(params, ["SeqBatchNorm_0", "BatchNorm_0", "bias"], sd("head.1.bias"),
            report, "head.1")
    _assign(stats, ["SeqBatchNorm_0", "BatchNorm_0", "mean"], sd("head.1.running_mean"),
            report, "head.1")
    _assign(stats, ["SeqBatchNorm_0", "BatchNorm_0", "var"], sd("head.1.running_var"),
            report, "head.1")
    _assign(params, ["Dense_1", "kernel"], conv1d(sd("head.3.weight")), report, "head.3")
    _assign(params, ["Dense_1", "bias"], sd("head.3.bias"), report, "head.3")
    # trailing BN is affine-free: running stats only
    _assign(stats, ["SeqBatchNorm_1", "BatchNorm_0", "mean"], sd("head.4.running_mean"),
            report, "head.4")
    _assign(stats, ["SeqBatchNorm_1", "BatchNorm_0", "var"], sd("head.4.running_var"),
            report, "head.4")


def _import_mha(lp: Dict, sd, prefix: str, report: Dict[str, int]) -> None:
    """Reference MultiHeadedAttention (encoder_decoder.py:182-207): linears.{0..3}
    = q, k, v, out -> our wq/wk/wv/wo."""
    for i, dst in enumerate(("wq", "wk", "wv", "wo")):
        _assign(lp, [dst, "kernel"], _dense(sd(f"{prefix}.linears.{i}.weight")),
                report, prefix)
        _assign(lp, [dst, "bias"], sd(f"{prefix}.linears.{i}.bias"), report, prefix)


def _import_cln(lp: Dict, sd, prefix: str, report: Dict[str, int]) -> None:
    """ConditionalLayerNorm (encoder_decoder.py:144-178): gamma/beta +
    mlp_gamma/mlp_beta Sequentials (indices 0 and 2 are the Linears)."""
    _assign(lp, ["gamma"], sd(f"{prefix}.gamma"), report, prefix)
    _assign(lp, ["beta"], sd(f"{prefix}.beta"), report, prefix)
    for mlp in ("mlp_gamma", "mlp_beta"):
        _assign(lp, [f"{mlp}_0", "kernel"], _dense(sd(f"{prefix}.{mlp}.0.weight")),
                report, prefix)
        _assign(lp, [f"{mlp}_0", "bias"], sd(f"{prefix}.{mlp}.0.bias"), report, prefix)
        _assign(lp, [f"{mlp}_1", "kernel"], _dense(sd(f"{prefix}.{mlp}.2.weight")),
                report, prefix)
        _assign(lp, [f"{mlp}_1", "bias"], sd(f"{prefix}.{mlp}.2.bias"), report, prefix)


def _import_rm_decoder(params: Dict, sd, report: Dict[str, int]) -> None:
    """EVOKE EncoderDecoder (encoder_decoder.py:303-404) -> our RMDecoder tree."""
    _assign(params, ["att_embed", "kernel"], _dense(sd("att_embed.0.weight")),
            report, "att_embed")
    _assign(params, ["att_embed", "bias"], sd("att_embed.0.bias"), report, "att_embed")

    n_enc = len([k for k in params if k.startswith("enc_") and k[4:].isdigit()])
    for i in range(n_enc):
        lp = params[f"enc_{i}"]
        base = f"model.encoder.layers.{i}"
        _import_mha(lp["self_attn"], sd, f"{base}.self_attn", report)
        for j, norm in ((0, "norm1"), (1, "norm2")):
            _assign(lp, [norm, "gamma"], sd(f"{base}.sublayer.{j}.norm.gamma"), report, base)
            _assign(lp, [norm, "beta"], sd(f"{base}.sublayer.{j}.norm.beta"), report, base)
        _assign(lp, ["ff", "Dense_0", "kernel"], _dense(sd(f"{base}.feed_forward.w_1.weight")),
                report, base)
        _assign(lp, ["ff", "Dense_0", "bias"], sd(f"{base}.feed_forward.w_1.bias"), report, base)
        _assign(lp, ["ff", "Dense_1", "kernel"], _dense(sd(f"{base}.feed_forward.w_2.weight")),
                report, base)
        _assign(lp, ["ff", "Dense_1", "bias"], sd(f"{base}.feed_forward.w_2.bias"), report, base)
    _assign(params, ["enc_norm", "gamma"], sd("model.encoder.norm.gamma"), report, "enc_norm")
    _assign(params, ["enc_norm", "beta"], sd("model.encoder.norm.beta"), report, "enc_norm")

    n_dec = len([k for k in params if k.startswith("dec_") and k[4:].isdigit()])
    for i in range(n_dec):
        lp = params[f"dec_{i}"]
        base = f"model.decoder.layers.{i}"
        _import_mha(lp["self_attn"], sd, f"{base}.self_attn", report)
        _import_mha(lp["src_attn"], sd, f"{base}.src_attn", report)
        for j, cln in ((0, "cln1"), (1, "cln2"), (2, "cln3")):
            _import_cln(lp[cln], sd, f"{base}.sublayer.{j}.norm", report)
        _assign(lp, ["ff", "Dense_0", "kernel"], _dense(sd(f"{base}.feed_forward.w_1.weight")),
                report, base)
        _assign(lp, ["ff", "Dense_0", "bias"], sd(f"{base}.feed_forward.w_1.bias"), report, base)
        _assign(lp, ["ff", "Dense_1", "kernel"], _dense(sd(f"{base}.feed_forward.w_2.weight")),
                report, base)
        _assign(lp, ["ff", "Dense_1", "bias"], sd(f"{base}.feed_forward.w_2.bias"), report, base)
    _assign(params, ["dec_norm", "gamma"], sd("model.decoder.norm.gamma"), report, "dec_norm")
    _assign(params, ["dec_norm", "beta"], sd("model.decoder.norm.beta"), report, "dec_norm")

    _assign(params, ["tgt_embed", "lut", "embedding"], sd("model.tgt_embed.0.lut.weight"),
            report, "tgt_embed")
    _import_mha(params["rm"]["attn"], sd, "model.rm.attn", report)
    _assign(params, ["rm", "mlp1", "kernel"], _dense(sd("model.rm.mlp.0.weight")), report, "rm")
    _assign(params, ["rm", "mlp1", "bias"], sd("model.rm.mlp.0.bias"), report, "rm")
    _assign(params, ["rm", "mlp2", "kernel"], _dense(sd("model.rm.mlp.2.weight")), report, "rm")
    _assign(params, ["rm", "mlp2", "bias"], sd("model.rm.mlp.2.bias"), report, "rm")
    _assign(params, ["rm", "W", "kernel"], _dense(sd("model.rm.W.weight")), report, "rm")
    _assign(params, ["rm", "W", "bias"], sd("model.rm.W.bias"), report, "rm")
    _assign(params, ["rm", "U", "kernel"], _dense(sd("model.rm.U.weight")), report, "rm")
    _assign(params, ["rm", "U", "bias"], sd("model.rm.U.bias"), report, "rm")
    _assign(params, ["logit", "kernel"], _dense(sd("logit.weight")), report, "logit")
    _assign(params, ["logit", "bias"], sd("logit.bias"), report, "logit")


def import_gpt2_decoder(state_dict: Dict[str, np.ndarray], variables: Dict
                        ) -> Tuple[Dict, Dict[str, int]]:
    """Map an HF GPT-2 (distilgpt2) state_dict onto CausalDecoder params.

    Mirrors the reference's DistilGPT2TextDecoderModel construction
    (language_model.py:161 — GPT2LMHeadModel inside an EncoderDecoderModel):
    the causal-LM stack loads from the checkpoint, cross-attention blocks stay
    freshly initialized (HF adds them randomly too). GPT-2 Conv1D weights are
    stored [in, out] (no transpose); c_attn is fused qkv, split here. The
    position table is sliced to our max_positions; token embeddings load when
    the vocab matches (ignore_mismatched_sizes semantics otherwise)."""
    import jax

    state_dict = _strip_module(state_dict)
    if any(k.startswith("transformer.") for k in state_dict):
        state_dict = _sub_dict(state_dict, "transformer.")
    variables = jax.tree_util.tree_map(np.asarray, jax.device_get(variables))
    params = variables["params"] if "params" in variables else variables
    report = {"loaded": 0, "mismatched": 0, "missing": 0}

    wte = state_dict.get("wte.weight")
    if wte is not None:
        _assign(params, ["tok_embed", "embedding"], wte, report, "wte")
        # tied LM head: logit kernel = wte^T (when the vocab matches)
        _assign(params, ["logit", "kernel"], np.transpose(wte), report, "lm_head")
    wpe = state_dict.get("wpe.weight")
    if wpe is not None:
        n_pos = np.shape(params["pos_embed"]["embedding"])[0]
        _assign(params, ["pos_embed", "embedding"], wpe[:n_pos], report, "wpe")

    n_layers = len([k for k in params if k.startswith("layer_")])
    for i in range(n_layers):
        if f"h.{i}.ln_1.weight" not in state_dict:
            continue
        lp = params[f"layer_{i}"]
        _assign(lp, ["ln1", "scale"], state_dict[f"h.{i}.ln_1.weight"], report, "ln_1")
        _assign(lp, ["ln1", "bias"], state_dict[f"h.{i}.ln_1.bias"], report, "ln_1")
        ca_w = state_dict[f"h.{i}.attn.c_attn.weight"]      # [d, 3d], already [in, out]
        ca_b = state_dict[f"h.{i}.attn.c_attn.bias"]
        d = ca_w.shape[0]
        for j, name in enumerate(("wq", "wk", "wv")):
            _assign(lp, ["self_attn", name, "kernel"], ca_w[:, j * d:(j + 1) * d],
                    report, "c_attn")
            _assign(lp, ["self_attn", name, "bias"], ca_b[j * d:(j + 1) * d],
                    report, "c_attn")
        _assign(lp, ["self_attn", "wo", "kernel"], state_dict[f"h.{i}.attn.c_proj.weight"],
                report, "c_proj")
        _assign(lp, ["self_attn", "wo", "bias"], state_dict[f"h.{i}.attn.c_proj.bias"],
                report, "c_proj")
        # GPT-2's pre-FFN norm maps to our ln3 (ln2 guards the added cross block)
        _assign(lp, ["ln3", "scale"], state_dict[f"h.{i}.ln_2.weight"], report, "ln_2")
        _assign(lp, ["ln3", "bias"], state_dict[f"h.{i}.ln_2.bias"], report, "ln_2")
        _assign(lp, ["ff", "Dense_0", "kernel"], state_dict[f"h.{i}.mlp.c_fc.weight"],
                report, "mlp")
        _assign(lp, ["ff", "Dense_0", "bias"], state_dict[f"h.{i}.mlp.c_fc.bias"],
                report, "mlp")
        _assign(lp, ["ff", "Dense_1", "kernel"], state_dict[f"h.{i}.mlp.c_proj.weight"],
                report, "mlp")
        _assign(lp, ["ff", "Dense_1", "bias"], state_dict[f"h.{i}.mlp.c_proj.bias"],
                report, "mlp")
    _assign(params, ["final_ln", "scale"], state_dict["ln_f.weight"], report, "ln_f")
    _assign(params, ["final_ln", "bias"], state_dict["ln_f.bias"], report, "ln_f")
    if "params" in variables:
        variables["params"] = params
        return variables, report
    return params, report


def import_bertgeneration_decoder(state_dict: Dict[str, np.ndarray], variables: Dict
                                  ) -> Tuple[Dict, Dict[str, int]]:
    """Map an HF BertGenerationDecoder (or plain BERT encoder) state_dict onto
    our ``BertGenerationDecoder`` params.

    Mirrors the reference's ``TextDecoderModel`` construction
    (models/language_encoder/language_model.py:24-37):
    ``AutoModelForCausalLM.from_pretrained(text_checkpoint, is_decoder=True,
    add_cross_attention=True, ignore_mismatched_sizes=True)``. Semantics:
    shape-mismatched tensors (e.g. word embeddings under an overridden vocab)
    are skipped; ``crossattention`` blocks and the LM head load when the
    checkpoint carries them (a saved BertGenerationDecoder) and stay freshly
    initialized when it is a plain encoder checkpoint; token-type embeddings
    are dropped (the bert_generation architecture has none)."""
    import jax

    state_dict = _strip_module(state_dict)
    prefix = detect_bert_prefix(state_dict)
    variables = jax.tree_util.tree_map(np.asarray, jax.device_get(variables))
    params = variables["params"] if "params" in variables else variables
    report = {"loaded": 0, "mismatched": 0, "missing": 0}

    def sd(key: str):
        return state_dict.get(prefix + key)

    emb = params["embeddings"]
    for src, dst in (("embeddings.word_embeddings.weight",
                      ["word_embeddings", "embedding"]),
                     ("embeddings.position_embeddings.weight",
                      ["position_embeddings", "embedding"]),
                     ("embeddings.LayerNorm.weight", ["LayerNorm_0", "scale"]),
                     ("embeddings.LayerNorm.bias", ["LayerNorm_0", "bias"])):
        v = sd(src)
        if v is not None:
            if dst[0] == "position_embeddings":
                v = v[:np.shape(emb["position_embeddings"]["embedding"])[0]]
            _assign(emb, dst, v, report, src)

    n_layers = len([k for k in params if k.startswith("layer_")])
    for i in range(n_layers):
        root = f"encoder.layer.{i}"
        if sd(f"{root}.attention.self.query.weight") is None:
            continue
        layer_sd = lambda key, r=root: sd(f"{r}.{key}")
        has_cross = sd(f"{root}.crossattention.self.query.weight") is not None
        lp = params[f"layer_{i}"]
        _import_bert_hf_layer(lp["attention"], layer_sd, "attention", report)
        if has_cross:
            _import_bert_hf_layer(lp["crossattention"], layer_sd, "crossattention",
                                  report)
        _assign(lp, ["ffn", "Dense_0", "kernel"],
                _dense(layer_sd("intermediate.dense.weight")), report, root)
        _assign(lp, ["ffn", "Dense_0", "bias"], layer_sd("intermediate.dense.bias"),
                report, root)
        _assign(lp, ["ffn", "BertSelfOutput_0", "Dense_0", "kernel"],
                _dense(layer_sd("output.dense.weight")), report, root)
        _assign(lp, ["ffn", "BertSelfOutput_0", "Dense_0", "bias"],
                layer_sd("output.dense.bias"), report, root)
        _assign(lp, ["ffn", "BertSelfOutput_0", "LayerNorm_0", "scale"],
                layer_sd("output.LayerNorm.weight"), report, root)
        _assign(lp, ["ffn", "BertSelfOutput_0", "LayerNorm_0", "bias"],
                layer_sd("output.LayerNorm.bias"), report, root)

    # BertGenerationOnlyLMHead: lm_head.decoder [vocab, hidden] + bias
    head_w = state_dict.get("lm_head.decoder.weight")
    if head_w is not None:
        _assign(params, ["lm_head", "kernel"], _dense(head_w), report, "lm_head")
        head_b = state_dict.get("lm_head.decoder.bias")
        if head_b is None:
            head_b = state_dict.get("lm_head.bias")
        if head_b is not None:
            _assign(params, ["lm_head", "bias"], head_b, report, "lm_head")
    if "params" in variables:
        variables["params"] = params
        return variables, report
    return params, report


def import_finetune_checkpoint(state_dict: Dict[str, np.ndarray], variables: Dict
                               ) -> Tuple[Dict, Dict[str, int]]:
    """Map a full EVOKE FineTune state_dict (the released ``model_best.pth``
    trees, models/model_pretrain_finetune_v0425_ablation.py:23-231) onto
    FinetuneModel variables. Requires the model to be built with
    ``fusion_wide_qkv=True`` (the reference's attention dimensioning,
    modules/utils_v0511.py:210-281) — mismatched shapes are skipped and counted.

    Returns (new variables, report {loaded, mismatched, missing}).
    """
    import jax

    state_dict = _strip_module(state_dict)
    variables = jax.tree_util.tree_map(np.asarray, jax.device_get(variables))
    params = variables["params"]
    stats = variables["batch_stats"]
    report = {"loaded": 0, "mismatched": 0, "missing": 0}

    # visual extractor (Sequential-index remap -> torchvision names)
    resnet_sd = _resnet_seq_to_named(_sub_dict(state_dict, "visual_extractor.model."))
    sub = {"params": {"backbone": params["visual_extractor"]["backbone"]},
           "batch_stats": {"backbone": stats["visual_extractor"]["backbone"]}}
    sub, r = import_resnet101(resnet_sd, sub)
    params["visual_extractor"]["backbone"] = sub["params"]["backbone"]
    stats["visual_extractor"]["backbone"] = sub["batch_stats"]["backbone"]
    for k in report:
        report[k] += r[k]

    # text encoder (HF BertModel under text_encoder.encoder.)
    params["text_encoder"], r = import_bert_encoder(
        state_dict, params["text_encoder"], prefix="text_encoder.encoder.")
    for k in report:
        report[k] += r[k]

    # multiview fusion: the two LayerNorms live on the top-level reference model
    fus = params["fusion"]
    _assign(fus, ["layer_norm_1", "scale"], state_dict["layer_norm_1.weight"],
            report, "layer_norm_1")
    _assign(fus, ["layer_norm_1", "bias"], state_dict["layer_norm_1.bias"],
            report, "layer_norm_1")
    _assign(fus, ["layer_norm_2", "scale"], state_dict["layer_norm_2.weight"],
            report, "layer_norm_2")
    _assign(fus, ["layer_norm_2", "bias"], state_dict["layer_norm_2.bias"],
            report, "layer_norm_2")
    for fc in ("fc_q", "fc_k", "fc_v", "fc_o"):
        _assign(fus, ["cross", fc, "kernel"],
                _dense(state_dict[f"multiview_cross_attention.{fc}.weight"]), report, fc)
        _assign(fus, ["cross", fc, "bias"],
                state_dict[f"multiview_cross_attention.{fc}.bias"], report, fc)

    # projection heads
    def sub_sd(prefix):
        d = _sub_dict(state_dict, prefix)
        return lambda k: d.get(k)

    _import_projection_head(params["visual_head"], stats["visual_head"],
                            sub_sd("visual_head."), report)
    _import_projection_head(params["text_head"], stats["text_head"],
                            sub_sd("text_head."), report)

    # indication co-attention / self-attention stacks
    i = 0
    while f"multimodal_fusion_layers_{i}" in params:
        _import_fusion_block(params[f"multimodal_fusion_layers_{i}"],
                             sub_sd(f"multimodal_fusion_layers.{i}."), report, cross=True)
        i += 1
    i = 0
    while f"visual_self_atten_layers_{i}" in params:
        _import_fusion_block(params[f"visual_self_atten_layers_{i}"],
                             sub_sd(f"visual_self_atten_layers.{i}."), report, cross=False)
        i += 1

    # R2Gen decoder
    _import_rm_decoder(params["text_decoder"], sub_sd("text_decoder."), report)

    return {"params": params, "batch_stats": stats}, report


def load_finetune_checkpoint(path: str, variables: Dict) -> Tuple[Dict, Dict[str, int]]:
    """Load a released EVOKE ``model_best.pth`` (README.md:22-27) into
    FinetuneModel variables. The .pth is a dict with a 'state_dict' entry
    (trainer_v0401.py:160-176)."""
    return import_finetune_checkpoint(load_torch_state_dict(path), variables)
