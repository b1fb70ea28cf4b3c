import json

import numpy as np
import pytest

from evoke_tpu.tools.benchmark_builder import build_multiview_annotation
from evoke_tpu.tools.factual_serialization import (heuristic_core_findings,
                                                   serialize_annotation)
from evoke_tpu.tools.section_parser import extract_section, section_text

REPORT = """                                 FINAL REPORT
 EXAMINATION:  CHEST (PA AND LAT)

 INDICATION:  F with chest pain // Eval for pneumonia

 TECHNIQUE:  Chest PA and lateral

 COMPARISON:  None.

 FINDINGS:

 The lungs are clear. The cardiomediastinal silhouette is normal.

 IMPRESSION:

 No acute cardiopulmonary abnormality.
"""


class TestSectionParser:
    def test_splits_and_normalizes(self):
        sections, names, starts = section_text(REPORT)
        assert "findings" in names and "impression" in names and "indication" in names
        find = sections[names.index("findings")]
        assert "lungs are clear" in find.lower()
        assert starts == sorted(starts)

    def test_extract_section(self):
        assert "pneumonia" in extract_section(REPORT, "indication").lower()
        assert extract_section(REPORT, "nonexistent") == ""

    def test_headerless_report(self):
        sections, names, _ = section_text("the heart is normal .")
        assert names == ["full_report"]

    def test_empty(self):
        assert section_text("") == ([], [], [])


class TestFactualSerialization:
    def test_heuristic_keywords(self):
        kws = heuristic_core_findings(
            "The lungs are clear. No pleural effusion or pneumothorax. "
            "Mild cardiomegaly is present.")
        assert len(kws) == 3
        assert any("cardiomegaly" in k for k in kws)
        assert any(k.startswith("no ") for k in kws)  # negation preserved
        assert not any("the" in k.split() for k in kws)  # stopwords dropped

    def test_serialize_annotation_fills_fields(self):
        ann = {"train": [{"id": "a", "report": "the lungs are clear . no effusion .",
                          "raw_report": REPORT}]}
        out = serialize_annotation(ann)
        item = out["train"][0]
        assert item["core_findings"]
        assert "pneumonia" in item["indication_core_findings"]


class TestBenchmarkBuilder:
    def _ann(self):
        return {"train": [
            {"id": "s1", "report": "r1", "core_findings": ["x"],
             "image_path": ["a.jpg"], "multiview_image_path": ["b.jpg", "c.jpg"]},
            {"id": "s2", "report": "r2", "core_findings": ["y"],
             "image_path": ["d.jpg"], "multiview_image_path": []},
            {"id": "s3", "report": "r3", "core_findings": [],
             "image_path": ["e.jpg"], "multiview_image_path": ["f.jpg"]},
        ]}

    def test_anchor_aux_layout(self):
        out = build_multiview_annotation(self._ann(),
                                         view_positions={"a.jpg": "PA", "b.jpg": "LATERAL"})
        items = out["train"]
        assert len(items) == 1  # s2 single view, s3 empty findings
        assert items[0]["image_path"] == ["a.jpg"]
        assert items[0]["multiview_image_path"] == ["b.jpg", "c.jpg"]
        assert items[0]["view_position"][0] == "PA"

    def test_many_to_many(self):
        out = build_multiview_annotation(self._ann(), many_to_many=True)
        items = out["train"]
        assert len(items) == 3  # s1's three views each anchor once
        ids = {it["id"] for it in items}
        assert ids == {"s1_v0", "s1_v1", "s1_v2"}
        assert all(len(it["multiview_image_path"]) == 2 for it in items)


class TestAdapters:
    def test_radgraph_unavailable_raises(self):
        from evoke_tpu.evals.adapters import F1RadGraphAdapter, MetricUnavailable
        with pytest.raises(MetricUnavailable):
            F1RadGraphAdapter(model_path="/nonexistent")

    def test_green_parse(self):
        from evoke_tpu.evals.adapters import GreenAdapter
        resp = ("[Clinically Significant Errors]:\n"
                "(a) False report of a finding in the candidate: 1. effusion\n"
                "(b) Missing a finding present in the reference: 0.\n\n"
                "[Matched Findings]:\n3. heart; lungs; bones\n")
        assert GreenAdapter.parse_green(resp) == 3 / 4
        assert GreenAdapter.parse_green("[Matched Findings]:\n0. none\n") == 0.0

    def test_bertscore_native(self, tmp_path):
        transformers = pytest.importorskip("transformers")
        from transformers import BertConfig, BertModel, BertTokenizerFast
        from evoke_tpu.evals.adapters import bertscore

        cfg = BertConfig(vocab_size=30, hidden_size=16, num_hidden_layers=2,
                         num_attention_heads=2, intermediate_size=32)
        model = BertModel(cfg)
        d = str(tmp_path / "tinybert")
        model.save_pretrained(d)
        vocab = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]", "the", "heart",
                 "is", "normal", "lungs", "clear", "no", "effusion", "."]
        (tmp_path / "tinybert" / "vocab.txt").write_text("\n".join(vocab))
        tok = BertTokenizerFast(vocab_file=str(tmp_path / "tinybert" / "vocab.txt"),
                                do_lower_case=True)
        tok.save_pretrained(d)
        same = bertscore(["the heart is normal ."], ["the heart is normal ."], d,
                         num_layers=1)
        diff = bertscore(["no effusion ."], ["the heart is normal ."], d, num_layers=1)
        assert same > diff
        assert abs(same - 1.0) < 1e-5


class TestReportStats:
    def test_stats(self):
        from evoke_tpu.tools.report_stats import report_stats
        out = report_stats(["one two three .", "a b . c d ."])
        assert out["n_reports"] == 2
        assert out["tokens_mean"] == 5.0
        assert out["sentences_mean"] == 1.5


class TestComposite:
    def test_compute_all_scores_nlg_only(self):
        from evoke_tpu.core.config import MetricsConfig
        from evoke_tpu.evals.composite import compute_all_scores
        gts = ["the heart is normal .", "no effusion ."]
        res = ["the heart is normal .", "small effusion ."]
        out = compute_all_scores(gts, res, MetricsConfig())
        assert "BLEU_4" in out and "CIDer" in out
        # no CE checkpoints configured -> only NLG keys, no crash
        assert not any(k.startswith("chexbert") for k in out)


class TestGreenParseSections:
    def test_insignificant_errors_ignored(self):
        from evoke_tpu.evals.adapters import GreenAdapter
        resp = ("[Clinically Significant Errors]:\n"
                "(a) False report of a finding in the candidate: 1. extra effusion\n"
                "(b) Missing a finding present in the reference: 0.\n\n"
                "[Clinically Insignificant Errors]:\n"
                "(a) False report of a finding in the candidate: 5. styles\n\n"
                "[Matched Findings]:\n3. heart; lungs; bones\n")
        assert GreenAdapter.parse_green(resp) == 3 / 4  # 5 insignificant not counted


class TestNLIScorer:
    def test_entailment_probs(self, tmp_path):
        transformers = pytest.importorskip("transformers")
        import torch
        from transformers import BertConfig, BertForSequenceClassification, BertTokenizerFast
        from evoke_tpu.evals.adapters import NLIScorer

        cfg = BertConfig(vocab_size=30, hidden_size=16, num_hidden_layers=1,
                         num_attention_heads=2, intermediate_size=32, num_labels=3,
                         id2label={0: "contradiction", 1: "neutral", 2: "entailment"},
                         label2id={"contradiction": 0, "neutral": 1, "entailment": 2})
        model = BertForSequenceClassification(cfg)
        d = str(tmp_path / "nli")
        model.save_pretrained(d)
        vocab = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]", "the", "heart",
                 "is", "normal", "lungs", "clear", "no", "effusion", "."]
        (tmp_path / "nli" / "vocab.txt").write_text("\n".join(vocab))
        BertTokenizerFast(vocab_file=str(tmp_path / "nli" / "vocab.txt")).save_pretrained(d)
        scorer = NLIScorer(d, batch_size=2)
        assert scorer.entail_idx == 2  # found via id2label
        probs = scorer.entailment_probs(
            ["the heart is normal .", "no effusion ."],
            ["the heart is normal .", "lungs clear ."])
        assert len(probs) == 2 and all(0.0 <= p <= 1.0 for p in probs)
