import numpy as np

from evoke_tpu.retrieval.topk import TopKIndex, build_knowledge_annotation


class TestTopKIndex:
    def test_exact_topk_matches_numpy(self, rng):
        n, d, q, k = 200, 32, 10, 5
        db = rng.normal(size=(n, d)).astype(np.float32)
        queries = rng.normal(size=(q, d)).astype(np.float32)
        db_codes = (np.arange(n) // 2).astype(np.int64)       # two entries per study
        q_codes = np.arange(q).astype(np.int64) + 10_000      # no same-study overlap
        idx = TopKIndex(db, db_codes, [f"id{i}" for i in range(n)], chunk_size=37)
        scores, indices = idx.search(queries, q_codes, k, query_chunk=3)
        sims = queries @ db.T
        want_idx = np.argsort(-sims, axis=1)[:, :k]
        want_scores = np.take_along_axis(sims, want_idx, axis=1)
        np.testing.assert_allclose(scores, want_scores, rtol=1e-4)
        np.testing.assert_array_equal(indices, want_idx)

    def test_same_study_excluded(self, rng):
        n, d, k = 50, 16, 5
        db = rng.normal(size=(n, d)).astype(np.float32)
        codes = np.zeros(n, np.int64)
        codes[:25] = 7                                        # half share study 7
        idx = TopKIndex(db, codes, [f"id{i}" for i in range(n)])
        queries = db[:3].copy()                               # identical to db rows 0-2
        q_codes = np.full(3, 7, np.int64)
        scores, indices = idx.search(queries, q_codes, k)
        # none of the hits may come from study 7 (including the query row itself)
        assert (codes[indices] != 7).all()

    def test_k_larger_than_db(self, rng):
        db = rng.normal(size=(3, 8)).astype(np.float32)
        idx = TopKIndex(db, np.arange(3, dtype=np.int64), ["a", "b", "c"])
        scores, indices = idx.search(db, np.arange(3, dtype=np.int64) + 100, k=10)
        assert indices.shape == (3, 3)


class TestKnowledgeAnnotation:
    def test_augmented_json_contract(self, tmp_path, rng):
        import json
        ann = {
            "train": [
                {"id": "t1", "report": "normal heart .", "core_findings": ["normal heart"]},
                {"id": "t2", "report": "effusion .", "core_findings": ["effusion"]},
            ],
            "val": [{"id": "v1", "report": "x", "core_findings": ["x"]}],
            "test": [],
        }
        ann_path = tmp_path / "ann.json"
        ann_path.write_text(json.dumps(ann))
        out = build_knowledge_annotation(
            str(ann_path), str(tmp_path / "aug.json"), ["train", "val"],
            {"train": {"t1": ["t2"], "t2": ["t1"]}, "val": {"v1": ["t1", "t2"]}},
            topk=2)
        aug = json.loads(open(out).read())
        sk = aug["val"][0]["specific_knowledge"]
        assert sk["sk_ids"] == ["t1", "t2"]
        assert sk["reports"] == ["normal heart .", "effusion ."]
        assert sk["sk_keywords"] == [["normal heart"], ["effusion"]]


class TestRetrievalQuality:
    def test_rescoring(self):
        from evoke_tpu.retrieval.topk import retrieval_quality
        ann = {"val": [
            {"id": "q1", "report": "the heart is normal .",
             "specific_knowledge": {"reports": ["the heart is normal .",
                                                "completely different text"]}},
            {"id": "q2", "report": "no effusion seen .",
             "specific_knowledge": {"reports": ["no effusion seen today ."]}},
        ]}
        out = retrieval_quality(ann, "val", {}, topk=2)
        assert out["n_scored"] == 2
        assert out["retrieved_top1_BLEU_4"] > 0.3
        assert out["retrieved_top1_ROUGE_L"] > out["retrieved_topk_mean_BLEU_4"] * 0  # finite


class TestStableCodes:
    """Study codes must be identical across processes (round-1 used salted
    Python hash(): saved embedding DBs would silently break same-study
    exclusion). Pinned value = sha1-based digest, PYTHONHASHSEED-independent."""

    def test_pinned_value(self):
        from evoke_tpu.retrieval.topk import stable_code
        assert stable_code("p1_s1") == 1126395983725305348

    def test_cross_process_identical(self):
        import subprocess
        import sys

        code = ("import sys; sys.path.insert(0, '/root/repo'); "
                "from evoke_tpu.retrieval.topk import stable_code; "
                "print(stable_code('p1_s1'))")
        outs = {subprocess.run([sys.executable, "-c", code],
                               env={"PYTHONHASHSEED": seed, "PATH": "/usr/bin:/bin",
                                    "JAX_PLATFORMS": "cpu"},
                               capture_output=True, text=True).stdout.strip()
                for seed in ("0", "42")}
        assert outs == {"1126395983725305348"}
