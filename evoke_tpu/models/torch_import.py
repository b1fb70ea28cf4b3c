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
            return
        node = node[p]
    leaf = path[-1]
    if leaf not in node:
        report["missing"] += 1
        return
    if tuple(np.shape(node[leaf])) != tuple(value.shape):
        report["mismatched"] += 1
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
