"""F1-CheXbert clinical-efficacy metric, ported to Flax (on-device batched scoring).

Capability parity: EVOKE modules/metrics/f1chexbert.py — a BERT encoder + 14
linear heads (13 conditions x 4 classes {blank, positive, negative, uncertain} +
'No Finding' x 2), CLS-pooled; per-report binary labels via the 'rrg' mapping
(positive/uncertain -> 1, else 0, :160-177); micro/macro F1 over all 14 and the
top-5 conditions via sklearn classification_report (:215-219).

TPU-first departure: the reference labels ONE report per forward call inside a
Python loop (:160-166, re-instantiated every eval epoch — SURVEY §2.6). Here
reports are tokenized host-side (WordPiece), padded to a static length, labeled
in jitted batches, and the labeler is built once and reused.

Weights: ``chexbert.pth`` ('model_state_dict' with 'module.'-prefixed bert.* +
linear_heads.*) imported via torch_import.import_bert_encoder.
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from evoke_tpu.data.tokenizer import WordTokenizer
from evoke_tpu.models.text_encoder import TextEncoder

CONDITIONS = [
    "Enlarged Cardiomediastinum", "Cardiomegaly", "Lung Opacity", "Lung Lesion", "Edema",
    "Consolidation", "Pneumonia", "Atelectasis", "Pneumothorax", "Pleural Effusion",
    "Pleural Other", "Fracture", "Support Devices", "No Finding"]
TOP5 = ["Cardiomegaly", "Edema", "Consolidation", "Atelectasis", "Pleural Effusion"]
TOP5_INDEX = [CONDITIONS.index(c) for c in TOP5]


class ChexbertLabeler(nn.Module):
    """BERT + 14 classification heads over the CLS embedding."""

    vocab_size: int = 30522
    hidden_size: int = 768
    num_layers: int = 12
    num_heads: int = 12
    intermediate_size: int = 3072
    max_positions: int = 512

    def setup(self):
        self.bert = TextEncoder(self.vocab_size, self.hidden_size, self.num_layers,
                                self.num_heads, self.intermediate_size,
                                max_positions=self.max_positions, dropout_rate=0.0)
        self.heads = [nn.Dense(4 if i < 13 else 2, name=f"head_{i}") for i in range(14)]

    def __call__(self, input_ids, attention_mask):
        """-> list of 14 logits arrays ([B, 4] x13 + [B, 2])."""
        hidden = self.bert(input_ids, attention_mask, deterministic=True)
        cls = hidden[:, 0, :]
        return [head(cls) for head in self.heads]


def _load_wordpiece_tokenizer(tokenizer_dir: str) -> WordTokenizer:
    """Build a WordPiece tokenizer from an HF vocab.txt (bert-base-uncased layout)."""
    vocab_path = os.path.join(tokenizer_dir, "vocab.txt")
    with open(vocab_path) as f:
        vocab = {line.rstrip("\n"): i for i, line in enumerate(f)}
    tok = WordTokenizer.__new__(WordTokenizer)
    tok.model = "wordpiece"
    tok.lowercase = True
    tok.vocab = vocab
    tok.id_to_token = {i: t for t, i in vocab.items()}
    tok.unk_id = vocab["[UNK]"]
    tok.pad_id = vocab["[PAD]"]
    tok.cls_id = vocab["[CLS]"]
    tok.sep_id = vocab["[SEP]"]
    tok.bos_id = tok.cls_id
    tok.eos_id = tok.sep_id
    tok._special_ids = {tok.unk_id, tok.pad_id, tok.cls_id, tok.sep_id}
    return tok


class F1CheXbert:
    """Instantiate ONCE; call on (hyps, refs) lists of report strings."""

    def __init__(self, chexbert_checkpoint: str, tokenizer_dir: str,
                 max_len: int = 512, batch_size: int = 64, **model_kw):
        from evoke_tpu.models.torch_import import (import_bert_encoder,
                                                   load_torch_state_dict)

        self.tokenizer = _load_wordpiece_tokenizer(tokenizer_dir)
        self.max_len = max_len
        self.batch_size = batch_size
        self.model = ChexbertLabeler(vocab_size=len(self.tokenizer.vocab), **model_kw)
        ids = jnp.zeros((1, 8), jnp.int32)
        variables = self.model.init(jax.random.key(0), ids, jnp.ones((1, 8), jnp.int32))

        sd = load_torch_state_dict(chexbert_checkpoint)
        sd = {k.replace("module.", ""): v for k, v in sd.items()}
        bert_sd = {k[len("bert."):]: v for k, v in sd.items() if k.startswith("bert.")}
        params = jax.device_get(variables["params"])
        bert_params, report = import_bert_encoder(bert_sd, {"params": params["bert"]})
        params["bert"] = bert_params["params"]
        for i in range(14):
            w = sd.get(f"linear_heads.{i}.weight")
            b = sd.get(f"linear_heads.{i}.bias")
            if w is not None:
                params[f"head_{i}"]["kernel"] = np.transpose(w).astype(np.float32)
                params[f"head_{i}"]["bias"] = b.astype(np.float32)
        self.variables = {"params": params}
        self.import_report = report

        @jax.jit
        def label_fn(variables, ids, mask):
            outs = self.model.apply(variables, ids, mask)
            return jnp.stack([jnp.argmax(o, -1) for o in outs], axis=1)  # [B, 14]

        self._label_fn = label_fn

    def _encode(self, report: str) -> np.ndarray:
        ids = [self.tokenizer.cls_id] + self.tokenizer.encode(" ".join(report.split()))
        ids = ids[: self.max_len - 1] + [self.tokenizer.sep_id]
        out = np.full((self.max_len,), self.tokenizer.pad_id, np.int32)
        out[: len(ids)] = ids
        return out

    def label(self, reports: Sequence[str]) -> np.ndarray:
        """-> [N, 14] binary labels ('rrg' mapping: positive/uncertain -> 1)."""
        all_cls = []
        for start in range(0, len(reports), self.batch_size):
            chunk = reports[start:start + self.batch_size]
            ids = np.stack([self._encode(r) for r in chunk])
            if len(chunk) < self.batch_size:  # pad to the compiled batch shape
                pad = np.tile(ids[-1:], (self.batch_size - len(chunk), 1))
                ids = np.concatenate([ids, pad])
            mask = (ids != self.tokenizer.pad_id).astype(np.int32)
            cls = np.asarray(self._label_fn(self.variables, jnp.asarray(ids),
                                            jnp.asarray(mask)))[: len(chunk)]
            all_cls.append(cls)
        cls = np.concatenate(all_cls)
        binary = ((cls == 1) | (cls == 3)).astype(np.int64)  # positive or uncertain
        return binary

    def __call__(self, hyps: Sequence[str], refs: Sequence[str]):
        from sklearn.metrics import accuracy_score, classification_report

        refs_l = self.label([r.strip() for r in refs])
        hyps_l = self.label([h.strip() for h in hyps])
        refs5, hyps5 = refs_l[:, TOP5_INDEX], hyps_l[:, TOP5_INDEX]
        accuracy = accuracy_score(refs5, hyps5)
        pe_accuracy = (np.count_nonzero(refs5 - hyps5, axis=1) == 0).astype(np.float32)
        cr = classification_report(refs_l, hyps_l, target_names=CONDITIONS,
                                   output_dict=True, zero_division=0)
        cr5 = classification_report(refs5, hyps5, target_names=TOP5,
                                    output_dict=True, zero_division=0)
        return accuracy, pe_accuracy, cr, cr5


def compute_chexbert_scores(gts: List[str], res: List[str], chexbert_checkpoint: str,
                            tokenizer_dir: Optional[str] = None) -> Dict[str, float]:
    """The reference's compute_ce_scores CheXbert subset (metrics.py:59-90)."""
    scorer = F1CheXbert(chexbert_checkpoint,
                        tokenizer_dir or os.path.dirname(chexbert_checkpoint))
    _, _, cr, cr5 = scorer(hyps=res, refs=gts)
    return {
        "chexbert_5_micro_f1": cr5["micro avg"]["f1-score"],
        "chexbert_all_micro_f1": cr["micro avg"]["f1-score"],
        "chexbert_5_macro_f1": cr5["macro avg"]["f1-score"],
        "chexbert_all_macro_f1": cr["macro avg"]["f1-score"],
    }
