"""Round-2 metric stack: full GREEN scorer (subcategory counts, mean/std,
accuracies — green_score/green.py:188-260,418-468 contract), the assembled
RadEntityNLI metric (RadEntityNLI.py:48-127 algorithm, fake components), and
the METEOR 1.5 scorer (meteor.py)."""

import pytest

from evoke_tpu.evals.adapters import GreenAdapter, RadEntityNLIScorer
from evoke_tpu.evals.meteor import Meteor15

RESP_A = """ [Explanation]:
The candidate mostly matches.

[Clinically Significant Errors]:
(a) False report of a finding in the candidate: 2. pleural effusion; pneumothorax
(b) Missing a finding present in the reference: 1. cardiomegaly
(c) Misidentification of a finding's anatomic location/position: 0.
(d) Misassessment of the severity of a finding: 0.
(e) Mentioning a comparison that isn't in the reference: 0.
(f) Omitting a comparison detailing a change from a prior study: 0.

[Clinically Insignificant Errors]:
(a) False report of a finding in the candidate: 1. support devices

[Matched Findings]:
3. clear lungs; no edema; normal heart size
"""

RESP_CLEAN = """[Clinically Significant Errors]:
No significant errors.

[Clinically Insignificant Errors]:
No errors.

[Matched Findings]:
5. a; b; c; d; e
"""

RESP_NUMERIC = """[Clinically Significant Errors]:
(1) False report: 1. effusion
(2) Missing finding: 0.

[Matched Findings]:
4. w; x; y; z
"""


class TestGreenFull:
    def test_subcategory_counts(self):
        assert GreenAdapter.error_counts(RESP_A) == [2, 1, 0, 0, 0, 0, 3]
        assert GreenAdapter.error_counts(RESP_CLEAN) == [0, 0, 0, 0, 0, 0, 5]

    def test_green_scores(self):
        assert GreenAdapter.compute_green(RESP_A) == 3 / 6
        assert GreenAdapter.compute_green(RESP_CLEAN) == 1.0
        # gpt-style numeric subcategories (green.py:279-284 fallback)
        assert GreenAdapter.compute_green(RESP_NUMERIC) == 4 / 5

    def test_summarize_mean_std_accuracies(self):
        s = GreenAdapter.summarize([RESP_A, RESP_CLEAN])
        assert s["green_mean"] == pytest.approx(0.75)
        assert s["green_std"] == pytest.approx(0.25)
        a_key = GreenAdapter.SUB_CATEGORIES[0]
        c_key = GreenAdapter.SUB_CATEGORIES[2]
        assert s["accuracies"][a_key] == 0.5  # RESP_A has (a) errors
        assert s["accuracies"][c_key] == 1.0
        assert s["error_counts"][0][-1] == 3  # matched findings column
        assert "Green average" in s["summary"]

    def test_clean_response(self):
        raw = "<|system|>judge<|assistant|>[Explanation]:\nok\n\n[Matched Findings]:\n2. a; b</s>"
        cleaned = GreenAdapter.clean_response(raw)
        assert "</s>" not in cleaned and "<|assistant|>" not in cleaned
        assert GreenAdapter.compute_green(cleaned) == 1.0

    def test_parse_error_sentences(self):
        """Per-subcategory sentence lists (green.py:296-347 contract)."""
        d = GreenAdapter.parse_error_sentences(RESP_A, "Clinically Significant Errors")
        a_key, b_key, c_key = GreenAdapter.SUB_CATEGORIES[:3]
        assert d[a_key] == [" pleural effusion", " pneumothorax"]
        assert d[b_key] == [" cardiomegaly"]
        assert d[c_key] == [""]  # a 0-count row splits to one empty string,
        # exactly like the reference; representative_sentences filters blanks
        clean = GreenAdapter.parse_error_sentences(
            RESP_CLEAN, "Clinically Significant Errors")
        assert all(v == [] for v in clean.values())

    def test_representative_sentences_cluster_summary(self):
        """The k-means largest-cluster summary (utils.py:15-109): with an
        embedder that places 'effusion'-flavored sentences together, the
        representative sentence of the big cluster is one of them."""
        import numpy as np

        def embed(sentences):
            # deterministic toy embedding: effusion-sentences near (1, 0),
            # others near (0, 1), with a tiny per-index offset
            out = []
            for i, s in enumerate(sentences):
                base = [1.0, 0.0] if "effusion" in s else [0.0, 1.0]
                out.append([base[0] + 0.01 * i, base[1] + 0.013 * i])
            return np.asarray(out)

        resp = """[Clinically Significant Errors]:
(a) False report of a finding in the candidate: 4. left effusion; right effusion; small effusion; cardiomegaly

[Matched Findings]:
2. a; b
"""
        reps = GreenAdapter.representative_sentences([resp], embed)
        a_key = GreenAdapter.SUB_CATEGORIES[0]
        assert reps[a_key] is not None and "effusion" in reps[a_key]
        # subcategories with no sentences have no representative
        assert reps[GreenAdapter.SUB_CATEGORIES[2]] is None

    def test_summarize_with_embedder_extends_summary(self):
        import numpy as np

        embed = lambda ss: np.asarray([[1.0 + 0.01 * i, 0.5] for i in range(len(ss))])
        s = GreenAdapter.summarize([RESP_A, RESP_CLEAN], embed_fn=embed)
        assert "representative_sentences" in s
        assert "[Clinically Significant Errors Analyses]" in s["summary"]
        a_key = GreenAdapter.SUB_CATEGORIES[0]
        assert s["representative_sentences"][a_key] is not None

    def test_kmeans_silhouette_pure_numpy(self):
        import numpy as np

        rng = np.random.default_rng(0)
        a = rng.normal(size=(10, 2)) * 0.05 + [0, 0]
        b = rng.normal(size=(10, 2)) * 0.05 + [5, 5]
        data = np.concatenate([a, b])
        labels, centers = GreenAdapter._kmeans(data, 2)
        # the two blobs separate perfectly
        assert len(set(labels[:10])) == 1 and len(set(labels[10:])) == 1
        assert labels[0] != labels[10]
        assert GreenAdapter._silhouette(data, labels) > 0.9


class TestRadEntityNLI:
    """Algorithm test with injected NER/similarity/NLI components."""

    @staticmethod
    def _ner(text):
        # sentence -> entities: every word ending in '*' is an entity
        out = []
        for sent in text.split(". "):
            sent = sent.strip(". ")
            if not sent:
                continue
            words = sent.split()
            out.append((sent, [w.rstrip("*") for w in words if w.endswith("*")]))
        return out

    @staticmethod
    def _sim(hyp_sents, ref_sents):
        # most-similar = most shared words
        def overlap(a, b):
            return len(set(a.split()) & set(b.split()))
        return [[overlap(h, r) for r in ref_sents] for h in hyp_sents]

    def test_perfect_match(self):
        scorer = RadEntityNLIScorer(ner_fn=self._ner, sim_fn=self._sim,
                                    nli_fn=lambda p, h: "entailment")
        mean, scores = scorer(["effusion* in lung*"], ["effusion* in lung*"])
        # p = (1 sentence bonus + 2 entities) / 2 = 1.5 -> capped by formula? no cap:
        # reference counts can exceed totals; F1 of 1.5/1.5 = 1.5 -> harmonic of equal
        assert scores[0] == pytest.approx(1.5)

    def test_contradiction_blocks_entities(self):
        scorer = RadEntityNLIScorer(ner_fn=self._ner, sim_fn=self._sim,
                                    nli_fn=lambda p, h: "contradiction")
        mean, scores = scorer(["effusion* present"], ["effusion* present"])
        assert scores[0] == 0.0  # no entailment bonus, entities blocked

    def test_neutral_counts_entities_only(self):
        scorer = RadEntityNLIScorer(ner_fn=self._ner, sim_fn=self._sim,
                                    nli_fn=lambda p, h: "neutral")
        mean, scores = scorer(["effusion* seen"], ["effusion* seen"])
        # entities still match (1/1 each side), no sentence bonus
        assert scores[0] == pytest.approx(1.0)

    def test_missing_entity_lowers_recall(self):
        scorer = RadEntityNLIScorer(ner_fn=self._ner, sim_fn=self._sim,
                                    nli_fn=lambda p, h: "neutral")
        _, s_all = scorer(["effusion* edema*"], ["effusion* edema*"])
        _, s_half = scorer(["effusion* only"], ["effusion* edema*"])
        assert s_half[0] < s_all[0]

    def test_empty_reports_skipped(self):
        scorer = RadEntityNLIScorer(ner_fn=self._ner, sim_fn=self._sim,
                                    nli_fn=lambda p, h: "entailment")
        mean, scores = scorer([""], ["effusion*"])
        assert scores == []


class TestMeteor15:
    def test_ordering(self):
        m = Meteor15()
        gts = {"a": ["the lungs are clear with no effusion seen"]}
        good = {"a": ["the lungs are clear with no effusion"]}
        bad = {"a": ["completely unrelated words here now"]}
        assert m(gts, good)[0] > m(gts, bad)[0]
        assert m(gts, bad)[0] == 0.0

    def test_stem_stage_matches_morphology(self):
        m = Meteor15()
        base = m.score_pair("the lung is clear".split(), "the lung is clear".split())
        stem = m.score_pair("the lungs is clear".split(), "the lung is clear".split())
        assert 0 < stem < base

    def test_adjacency_preference_reduces_chunks(self):
        # repeated ref token: greedy-first matches hyp 'b' to ref[0] (2 chunks);
        # the opt-in adjacency preference continues the run (1 chunk)
        hyp, ref = ["a", "b"], ["b", "a", "b"]
        greedy = Meteor15()
        adj = Meteor15(chunk_preference=True)
        assert greedy._chunks(greedy._align(hyp, ref)) == 2
        assert adj._chunks(adj._align(hyp, ref)) == 1

    def test_paraphrase_table(self, tmp_path):
        p = tmp_path / "para.txt"
        p.write_text("heart ||| cardiac\n")
        m = Meteor15(paraphrase_path=str(p))
        assert ("paraphrase", 0.6) in m.stages
        with_para = m.score_pair("cardiac size normal".split(),
                                 "heart size normal".split())
        without = Meteor15().score_pair("cardiac size normal".split(),
                                        "heart size normal".split())
        assert with_para > without

    def test_paraphrase_table_gzip(self, tmp_path):
        """The jar ships paraphrase-en.gz; the loader reads gzip directly."""
        import gzip

        p = tmp_path / "paraphrase-en.gz"
        with gzip.open(p, "wt") as f:
            f.write("heart ||| cardiac\n")
        m = Meteor15(paraphrase_path=str(p))
        assert ("paraphrase", 0.6) in m.stages
        assert m.score_pair(["cardiac"], ["heart"]) > 0.0

    def test_default_paraphrase_path_env(self, tmp_path, monkeypatch):
        from evoke_tpu.evals.meteor import default_paraphrase_path

        monkeypatch.delenv("EVOKE_METEOR_PARAPHRASE", raising=False)
        monkeypatch.delenv("EVOKE_METEOR_DATA", raising=False)
        assert default_paraphrase_path() is None
        p = tmp_path / "paraphrase-en.txt"
        p.write_text("heart ||| cardiac\n")
        monkeypatch.setenv("EVOKE_METEOR_DATA", str(tmp_path))
        assert default_paraphrase_path() == str(p)
        direct = tmp_path / "table.txt"
        direct.write_text("a ||| b\n")
        monkeypatch.setenv("EVOKE_METEOR_PARAPHRASE", str(direct))
        assert default_paraphrase_path() == str(direct)

    def test_supplied_data_moves_toward_jar(self, tmp_path):
        """The exactness mechanism: pairs invisible to exact+stem become
        (fractional-weight) matches with data supplied, which is exactly the
        delta between the offline default and the jar's full-stage value."""
        gts = {"a": ["heart size is normal"], "b": ["lungs are clear"]}
        res = {"a": ["cardiac size is normal"], "b": ["lungs are clear"]}
        p = tmp_path / "para.txt"
        p.write_text("heart ||| cardiac\n")
        base, _ = Meteor15()(gts, res)
        with_data, _ = Meteor15(paraphrase_path=str(p))(gts, res)
        assert with_data > base

    def test_jar_adapter_gated(self, monkeypatch):
        """MeteorJar raises cleanly without java/jar; _meteor15 falls back."""
        from evoke_tpu.evals.meteor import MeteorJar

        with pytest.raises(RuntimeError):
            MeteorJar("/nonexistent/meteor-1.5.jar")

    def test_function_word_weighting(self):
        m = Meteor15()
        # content-word match should contribute more than function-word match
        content = m.score_pair(["effusion"], ["effusion"])
        function = m.score_pair(["the"], ["the"])
        assert content == function  # single-word: weights cancel in P and R
