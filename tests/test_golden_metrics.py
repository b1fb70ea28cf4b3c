"""Golden metric tests against the reference's released prediction CSVs
(SURVEY §6): our pure-Python NLG metrics must reproduce the pycocoevalcap
values stored as the leading metric rows of test_prediction.csv, computed over
the SAME 3852 report pairs."""

import os

import pandas as pd
import pytest

from evoke_tpu.evals.nlg import compute_nlg_scores

BASE = "/root/reference/generated_reports/MIMIC-CXR"
PATHS = {res: f"{BASE}/resolution-{res}/test_prediction.csv" for res in
         ("224x224", "384x384")}

pytestmark = pytest.mark.skipif(not os.path.exists(PATHS["224x224"]),
                                reason="reference CSVs unavailable")


def load(res):
    df = pd.read_csv(PATHS[res], dtype=str)
    metric_rows = df[df["ground_truth"].isna()]
    published = {r["images_id"]: float(r["generated_reports"])
                 for _, r in metric_rows.iterrows()}
    data = df[~df["ground_truth"].isna()]
    gts = {r["images_id"]: [str(r["ground_truth"])] for _, r in data.iterrows()}
    hyp = {r["images_id"]: [str(r["generated_reports"])] for _, r in data.iterrows()}
    return gts, hyp, published


@pytest.mark.parametrize("res", ["224x224", "384x384"])
class TestGoldenNLG:
    def test_exact_match_bleu_rouge_cider(self, res):
        gts, hyp, published = load(res)
        ours = compute_nlg_scores(gts, hyp)
        for key in ("BLEU_1", "BLEU_2", "BLEU_3", "BLEU_4", "ROUGE_L", "CIDer"):
            assert abs(ours[key] - published[key]) < 1e-6, (
                f"{key}: ours {ours[key]} vs published {published[key]}")

    def test_meteor_approximation_within_tolerance(self, res):
        gts, hyp, published = load(res)
        ours = compute_nlg_scores(gts, hyp)
        # METEOR-lite has no WordNet modules; validated to ~0.005 absolute
        assert abs(ours["METEOR"] - published["METEOR"]) < 0.01, (
            f"METEOR: ours {ours['METEOR']} vs published {published['METEOR']}")
