import json
import os

import numpy as np
import pytest

from evoke_tpu.data.tokenizer import WordTokenizer, build_tokenizer

REF_TOK = "/root/reference/config/tokenizer/iu_xray_wordlevel_uncased_tokenizer.json"

REPORTS = [
    "the heart is normal in size . the lungs are clear .",
    "no acute cardiopulmonary abnormality .",
    "there is no evidence of pulmonary edema , focal consolidation or pneumothorax .",
    "heart size within normal limits . no pleural effusion .",
]


class TestTrainEncodeDecode:
    def test_special_ids_layout(self):
        tok = WordTokenizer.train(REPORTS)
        assert tok.pad_id == 0 and tok.cls_id == 1 and tok.sep_id == 2
        assert tok.token_to_id("[MASK]") == 3 and tok.unk_id == 4
        assert tok.bos_id == tok.get_vocab_size() - 2
        assert tok.eos_id == tok.get_vocab_size() - 1

    def test_roundtrip(self):
        tok = WordTokenizer.train(REPORTS)
        text = "the heart is normal in size ."
        ids = tok.encode(text)
        assert tok.decode(ids) == text

    def test_unk(self):
        tok = WordTokenizer.train(REPORTS)
        ids = tok.encode("zebra lungs")
        assert ids[0] == tok.unk_id

    def test_specials_in_text(self):
        tok = WordTokenizer.train(REPORTS)
        ids = tok.encode("[CLS] heart [SEP] lungs")
        assert ids[0] == tok.cls_id and ids[2] == tok.sep_id
        # decode skips specials
        assert tok.decode(ids) == "heart lungs"

    def test_encode_padded_static_shape(self):
        tok = WordTokenizer.train(REPORTS)
        arr = tok.encode_padded("the heart is normal", max_len=10, add_bos_eos=True)
        assert arr.shape == (10,) and arr.dtype == np.int32
        assert arr[0] == tok.bos_id
        assert tok.eos_id in arr
        assert arr[-1] == tok.pad_id

    def test_truncation(self):
        tok = WordTokenizer.train(REPORTS)
        arr = tok.encode_padded(" ".join(["heart"] * 50), max_len=8, add_bos_eos=True)
        assert arr.shape == (8,) and (arr != tok.pad_id).all()

    def test_save_load_roundtrip(self, tmp_path):
        tok = WordTokenizer.train(REPORTS)
        p = str(tmp_path / "tok.json")
        tok.save(p)
        tok2 = WordTokenizer.from_file(p)
        assert tok2.vocab == tok.vocab
        text = "no acute cardiopulmonary abnormality ."
        assert tok2.encode(text) == tok.encode(text)


@pytest.mark.skipif(not os.path.exists(REF_TOK), reason="reference vocab unavailable")
class TestReferenceVocabCompat:
    """Load the reference-released vocab file and cross-check against the
    HF `tokenizers` Rust library as an oracle."""

    def test_load_reference_vocab(self):
        tok = WordTokenizer.from_file(REF_TOK)
        assert tok.pad_id == 0 and tok.unk_id == 4
        assert tok.get_vocab_size() > 1000

    def test_matches_rust_tokenizers(self):
        from tokenizers import Tokenizer

        ref = Tokenizer.from_file(REF_TOK)
        ref.add_special_tokens(["[BOS]", "[EOS]"])
        ours = WordTokenizer.from_file(REF_TOK)
        assert ours.bos_id == ref.token_to_id("[BOS]")
        assert ours.eos_id == ref.token_to_id("[EOS]")
        for text in [
            "the heart is normal in size .",
            "[CLS] no acute cardiopulmonary abnormality",
            "there is no pneumothorax or pleural effusion .",
            "stable appearance of the chest , with mild cardiomegaly .",
        ]:
            assert ours.encode(text) == ref.encode(text).ids, text
        ids = ours.encode("the heart is enlarged .")
        assert ours.decode(ids) == ref.decode(ids)


class TestBuildTokenizer:
    def test_train_from_annotation(self, tmp_path):
        ann = {"train": [{"id": f"r{i}", "report": r} for i, r in enumerate(REPORTS)],
               "val": [], "test": []}
        ann_path = tmp_path / "ann.json"
        ann_path.write_text(json.dumps(ann))
        tok = build_tokenizer(str(tmp_path), "mimic_cxr", ann_path=str(ann_path))
        assert os.path.exists(tmp_path / "mimic_cxr_wordlevel_uncased_tokenizer.json")
        # loads from file the second time
        tok2 = build_tokenizer(str(tmp_path), "mimic_cxr")
        assert tok2.vocab == tok.vocab
