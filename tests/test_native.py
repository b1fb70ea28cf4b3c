"""Native C++ component parity vs the Python implementations."""

import numpy as np
import pytest

from evoke_tpu.data.tokenizer import WordTokenizer
from evoke_tpu.data.synthetic import corpus_for_tokenizer
from evoke_tpu.native import NativeWordLevel, build_native, load_native, native_topk_ip


@pytest.fixture(scope="module")
def native_available():
    if load_native() is None:
        pytest.skip("g++/native build unavailable")
    return True


class TestNativeTokenizer:
    def test_encode_parity_with_python(self, native_available):
        tok = WordTokenizer.train(corpus_for_tokenizer())
        nat = NativeWordLevel(tok.vocab, tok.unk_id, lowercase=True)
        texts = [
            "the heart is NORMAL in size .",
            "no acute cardiopulmonary abnormality , really !",
            "unknownword123 and punctuation...here",
            "",
            "   whitespace   only -- sort. of",
        ]
        got = nat.encode_padded_batch(texts, max_len=16, pad_id=tok.pad_id)
        want = np.stack([tok.encode_padded(t, 16) for t in texts])
        np.testing.assert_array_equal(got, want)

    def test_token_id(self, native_available):
        tok = WordTokenizer.train(corpus_for_tokenizer())
        nat = NativeWordLevel(tok.vocab, tok.unk_id)
        assert nat.lib.wl_token_id(nat.handle, b"[PAD]") == tok.pad_id
        assert nat.lib.wl_token_id(nat.handle, b"notinthevocabatall") == -1

    def test_truncation(self, native_available):
        tok = WordTokenizer.train(corpus_for_tokenizer())
        nat = NativeWordLevel(tok.vocab, tok.unk_id)
        long = " ".join(["heart"] * 50)
        got = nat.encode_padded_batch([long], max_len=8, pad_id=tok.pad_id)
        assert got.shape == (1, 8)
        assert (got != tok.pad_id).all()


class TestNativeTopK:
    def test_matches_numpy(self, native_available, rng):
        n, d, q, k = 300, 24, 12, 7
        db = rng.normal(size=(n, d)).astype(np.float32)
        queries = rng.normal(size=(q, d)).astype(np.float32)
        db_codes = (np.arange(n) % 50).astype(np.int64)
        q_codes = (np.arange(q) + 1000).astype(np.int64)
        scores, idx = native_topk_ip(db, queries, db_codes, q_codes, k)
        sims = queries @ db.T
        want_idx = np.argsort(-sims, axis=1)[:, :k]
        np.testing.assert_allclose(scores, np.take_along_axis(sims, want_idx, axis=1),
                                   rtol=1e-5)
        np.testing.assert_array_equal(idx, want_idx)

    def test_same_study_excluded(self, native_available, rng):
        n, d, k = 40, 8, 5
        db = rng.normal(size=(n, d)).astype(np.float32)
        codes = np.zeros(n, np.int64)
        codes[:20] = 3
        scores, idx = native_topk_ip(db, db[:4], codes, np.full(4, 3, np.int64), k)
        assert (codes[idx] != 3).all()

    def test_matches_device_topk(self, native_available, rng):
        """C++ host path == on-device TopKIndex path."""
        from evoke_tpu.retrieval.topk import TopKIndex

        n, d, q, k = 128, 16, 6, 4
        db = rng.normal(size=(n, d)).astype(np.float32)
        queries = rng.normal(size=(q, d)).astype(np.float32)
        db_codes = (np.arange(n) % 30).astype(np.int64)
        q_codes = (np.arange(q) + 500).astype(np.int64)
        s_native, i_native = native_topk_ip(db, queries, db_codes, q_codes, k)
        index = TopKIndex(db, db_codes, [str(i) for i in range(n)], chunk_size=50)
        s_dev, i_dev = index.search(queries, q_codes, k)
        np.testing.assert_array_equal(i_native, i_dev)
        np.testing.assert_allclose(s_native, s_dev, rtol=1e-4)
