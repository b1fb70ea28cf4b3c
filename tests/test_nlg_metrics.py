import math

import numpy as np
import pytest

from evoke_tpu.evals.nlg import bleu, cider_d, compute_nlg_scores, meteor_lite, rouge_l

GTS = [
    "the heart is normal in size . the lungs are clear .",
    "no acute cardiopulmonary abnormality is seen .",
    "there is a small left pleural effusion . no pneumothorax .",
    "stable cardiomegaly with mild pulmonary edema .",
]
GOOD = [
    "the heart is normal in size . the lungs are clear .",
    "no acute cardiopulmonary abnormality .",
    "small left pleural effusion without pneumothorax .",
    "cardiomegaly with mild edema .",
]
BAD = ["random words entirely unrelated"] * 4


class TestBLEU:
    def test_perfect_match_is_one(self):
        scores, _ = bleu(GTS, GTS)
        for s in scores:
            assert abs(s - 1.0) < 1e-6

    def test_good_beats_bad(self):
        g, _ = bleu(GTS, GOOD)
        b, _ = bleu(GTS, BAD)
        assert g[3] > b[3]
        assert g[0] > 0.5 and b[0] < 0.1

    def test_monotone_orders(self):
        s, _ = bleu(GTS, GOOD)
        assert s[0] >= s[1] >= s[2] >= s[3]

    def test_matches_nltk_corpus_bleu(self):
        nltk = pytest.importorskip("nltk")
        from nltk.translate.bleu_score import corpus_bleu
        refs = [[g.split()] for g in GTS]
        hyps = [h.split() for h in GOOD]
        want = corpus_bleu(refs, hyps, weights=(0.25, 0.25, 0.25, 0.25))
        got, _ = bleu(GTS, GOOD)
        # COCO cumulative BLEU_4 = geometric mean of p1..p4 with same BP
        assert abs(got[3] - want) < 1e-3, (got[3], want)

    def test_brevity_penalty(self):
        gts = ["a b c d e f g h"]
        res = ["a b c"]
        s, _ = bleu(gts, res, n=1)
        # p1 = 1, BP = exp(1 - 8/3)
        assert abs(s[0] - math.exp(1 - 8 / 3)) < 1e-6


class TestRougeL:
    def test_perfect(self):
        s, _ = rouge_l(GTS, GTS)
        assert abs(s - 1.0) < 1e-6

    def test_hand_computed(self):
        # hyp: "a b c", ref: "a x b": LCS=2, P=2/3, R=2/3, F=2/3
        s, _ = rouge_l(["a x b"], ["a b c"])
        assert abs(s - 2 / 3) < 1e-6

    def test_good_beats_bad(self):
        assert rouge_l(GTS, GOOD)[0] > rouge_l(GTS, BAD)[0]


class TestCider:
    def test_perfect_match_scores_ten(self):
        s, per = cider_d(GTS, GTS)
        assert abs(s - 10.0) < 1e-6

    def test_good_beats_bad(self):
        assert cider_d(GTS, GOOD)[0] > cider_d(GTS, BAD)[0]

    def test_length_penalty(self):
        gts = ["a b c d", "x y z w"]
        short = ["a b", "x y"]
        full = ["a b c d", "x y z w"]
        assert cider_d(gts, full)[0] > cider_d(gts, short)[0]


class TestMeteorLite:
    def test_perfect_beats_partial(self):
        # METEOR 1.5's fragmentation penalty (gamma=0.6, beta=0.2) caps even
        # perfect short matches well below 1.0 — matching the Java jar's scale
        # (validated against published values in test_golden_metrics.py).
        perfect, _ = meteor_lite(GTS, GTS)
        good, _ = meteor_lite(GTS, GOOD)
        assert perfect > good > 0.0

    def test_stem_matching_helps(self):
        with_stem, _ = meteor_lite(["the lung is clear"], ["the lungs is clear"])
        no_overlap, _ = meteor_lite(["the lung is clear"], ["entirely different words"])
        assert with_stem > no_overlap

    def test_good_beats_bad(self):
        assert meteor_lite(GTS, GOOD)[0] > meteor_lite(GTS, BAD)[0]


class TestAggregate:
    def test_reference_key_surface(self):
        out = compute_nlg_scores(GTS, GOOD)
        assert set(out) == {"BLEU_1", "BLEU_2", "BLEU_3", "BLEU_4",
                            "METEOR", "ROUGE_L", "CIDer"}
        assert all(0.0 <= v <= 10.0 for v in out.values())

    def test_dict_input_form(self):
        gts = {f"img{i}": [g] for i, g in enumerate(GTS)}
        res = {f"img{i}": [r] for i, r in enumerate(GOOD)}
        out = compute_nlg_scores(gts, res)
        out2 = compute_nlg_scores(GTS, GOOD)
        for k in out:
            assert abs(out[k] - out2[k]) < 1e-9
