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


class TestOrderedFactualSerialization:
    """The reference's entity-graph -> ordered core_findings pipeline
    (factual_serialization.py:197-286,577-608), testable without RadGraph."""

    def test_per_sentence_grouping_and_negation(self):
        from evoke_tpu.tools.factual_serialization import entities_to_core_findings
        tokens = ("the lungs are clear . no pleural effusion or pneumothorax . "
                  "possible mild edema .").split()
        ents = [
            (1, 1, "ANAT-DP"),      # lungs
            (3, 3, "OBS-DP"),       # clear
            (6, 7, "OBS-DA"),       # pleural effusion (definitely absent)
            (9, 9, "OBS-DA"),       # pneumothorax
            (12, 13, "OBS-U"),      # mild edema (uncertain)
        ]
        out = entities_to_core_findings(tokens, ents)
        assert out == ["lungs clear", "no pleural effusion pneumothorax",
                       "maybe mild edema"]

    def test_useless_single_finding_dropped(self):
        from evoke_tpu.tools.factual_serialization import entities_to_core_findings
        tokens = "It is unremarkable . heart normal .".split()
        ents = [(0, 0, "OBS-DP"), (4, 4, "ANAT-DP"), (5, 5, "OBS-DP")]
        assert entities_to_core_findings(tokens, ents) == ["heart normal"]

    def test_overlap_resolution_prefers_longer(self):
        from evoke_tpu.tools.factual_serialization import resolve_overlapping_entities
        tokens = "left lower lobe opacity .".split()
        ents = [(0, 1, "ANAT-DP"), (0, 2, "ANAT-DP")]
        assert resolve_overlapping_entities(ents, tokens) == [(0, 2, "ANAT-DP")]

    def test_jsonl_and_merge(self):
        import json as _json
        from evoke_tpu.tools.factual_serialization import (merge_core_findings,
                                                           radgraph_jsonl_to_entities)
        line = _json.dumps({
            "doc_key": "p1_s1",
            "sentences": [["no", "effusion", "."]],
            "predicted_ner": [[[1, 1, "OBS-DA"]]],
        })
        ents = radgraph_jsonl_to_entities([line])
        assert ents["p1_s1"]["core_findings"] == ["no effusion"]
        ann = {"train": [
            {"id": "a", "subject_id": "p1", "study_id": "s1", "report": "raw"},
            {"id": "b", "subject_id": "p2", "study_id": "s2",
             "report": "heart,normal."},
        ]}
        merged = merge_core_findings(ann, ents)
        assert merged["train"][0]["core_findings"] == ["no effusion"]
        assert merged["train"][0]["report"] == "no effusion ."
        # fallback: punctuation gets spaced, empty core_findings
        assert merged["train"][1]["core_findings"] == []
        assert merged["train"][1]["report"] == "heart , normal . "


class TestBenchmarkMetadataMerge:
    def test_view_positions_from_metadata_csv(self, tmp_path):
        from evoke_tpu.tools.benchmark_builder import (load_mimic_view_positions,
                                                       view_positions_for_item)
        csv_path = tmp_path / "meta.csv"
        csv_path.write_text(
            "dicom_id,subject_id,study_id,ViewPosition\n"
            "d1,10,100,PA\nd2,10,100,LATERAL\nd3,11,101,\n")
        meta = load_mimic_view_positions(str(csv_path))
        assert meta["10_100_d1"] == "PA"
        assert meta["11_101_d3"] == "unk"
        item = {"id": "10_100", "image_path": ["files/p10/s100/d1.jpg"],
                "multiview_image_path": ["files/p10/s100/d2.jpg"]}
        assert view_positions_for_item(item, meta) == ["PA", "LATERAL"]

    def test_merged_benchmark_mimic_plus_iu(self, tmp_path):
        from evoke_tpu.tools.benchmark_builder import build_benchmark_merged
        mimic = {"train": [
            {"id": "10_100", "report": "findings text", "core_findings": ["x"],
             "image_path": ["a/d1.jpg", "a/d2.jpg"],
             "indication_core_findings": "cough",
             "specific_knowledge": {"reports": ["r"]}},
            {"id": "10_101", "report": "single view", "core_findings": ["y"],
             "image_path": ["a/d3.jpg"]},                       # < 2 views: dropped
            {"id": "10_102", "report": "no findings", "core_findings": [],
             "image_path": ["a/d4.jpg", "a/d5.jpg"]},            # empty cf: dropped
        ], "val": [], "test": []}
        meta = {"10_100_d1": "PA", "10_100_d2": "AP"}
        iu = {"train": [
            {"id": "CXR7_IM-2263-1001", "report": "iu findings",
             "core_findings": ["z"], "image_path": ["CXR7_IM-2263/0.jpg",
                                                    "CXR7_IM-2263/1.jpg"],
             "indication_core_findings": "pain , ,, fever"},
        ], "val": [], "test": []}
        iu_meta = {"CXR7": {"image_path": ["CXR7_IM-2263/0.jpg",
                                           "CXR7_IM-2263/1.jpg"],
                            "comparison": "none ."}}
        out = build_benchmark_merged(mimic, meta, iu, iu_meta)
        assert len(out["train"]) == 2
        m = out["train"][0]
        assert m["view_position"] == ["PA", "AP"]
        assert m["findings_factual_serialization"] == ["x"]
        u = out["train"][1]
        assert u["id"] == "CXR7"
        assert u["image_path"] == ["NLMCXR_png/CXR7_IM-2263/0.png",
                                   "NLMCXR_png/CXR7_IM-2263/1.png"]
        assert u["view_position"] == ["unk", "unk"]
        assert u["comparison"] == "none ."
        assert ",," not in u["indication_pure"]


class TestSerializePredictions:
    def test_adds_gen_fs_column(self, tmp_path):
        import csv
        from evoke_tpu.tools.factual_serialization import serialize_predictions

        src = tmp_path / "test_prediction_temp.csv"
        with open(src, "w", newline="") as f:
            w = csv.DictWriter(f, fieldnames=["images_id", "ground_truth", "pred_report"])
            w.writeheader()
            w.writerow({"images_id": "a", "ground_truth": "gt",
                        "pred_report": "the lungs are clear . no pleural effusion ."})
        out = serialize_predictions(str(src), str(tmp_path / "out.csv"))
        with open(out, newline="") as f:
            rows = list(csv.DictReader(f))
        fs = json.loads(rows[0]["gen_fs"])
        assert fs and any("effusion" in k for k in fs)

    def test_trainer_column_fallback(self, tmp_path):
        import csv
        from evoke_tpu.tools.factual_serialization import serialize_predictions

        src = tmp_path / "test_prediction.csv"
        with open(src, "w", newline="") as f:
            w = csv.DictWriter(f, fieldnames=["images_id", "ground_truth", "pred_3"])
            w.writeheader()
            w.writerow({"images_id": "a", "ground_truth": "gt",
                        "pred_3": "mild cardiomegaly ."})
        out = serialize_predictions(str(src), str(tmp_path / "out.csv"))
        with open(out, newline="") as f:
            rows = list(csv.DictReader(f))
        assert "cardiomegaly" in rows[0]["gen_fs"]
