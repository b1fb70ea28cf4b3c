"""CheXbert port parity: our Flax labeler must reproduce a torch
bert_labeler's class predictions given the same (random) checkpoint."""

import os

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from evoke_tpu.evals.chexbert import CONDITIONS, F1CheXbert, TOP5_INDEX

VOCAB = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]", "the", "heart", "is", "normal",
         "lungs", "clear", "no", "acute", "effusion", "pleural", "edema", "##s", "card",
         "##iomegaly", "small", "left", "right", "there", "of", "with", "mild", "."]


@pytest.fixture(scope="module")
def fake_ckpt(tmp_path_factory):
    from transformers import BertConfig, BertModel

    root = tmp_path_factory.mktemp("chexbert")
    with open(root / "vocab.txt", "w") as f:
        f.write("\n".join(VOCAB) + "\n")
    cfg = BertConfig(vocab_size=len(VOCAB), hidden_size=32, num_hidden_layers=2,
                     num_attention_heads=4, intermediate_size=64,
                     max_position_embeddings=64, hidden_dropout_prob=0.0,
                     attention_probs_dropout_prob=0.0)
    bert = BertModel(cfg)
    bert.eval()
    heads = [torch.nn.Linear(32, 4 if i < 13 else 2) for i in range(14)]
    sd = {}
    for k, v in bert.state_dict().items():
        sd[f"module.bert.{k}"] = v
    for i, h in enumerate(heads):
        sd[f"module.linear_heads.{i}.weight"] = h.weight.detach()
        sd[f"module.linear_heads.{i}.bias"] = h.bias.detach()
    torch.save({"model_state_dict": sd}, root / "chexbert.pth")
    return str(root / "chexbert.pth"), str(root), bert, heads


REPORTS = [
    "the heart is normal . lungs clear .",
    "small left pleural effusion with mild cardiomegaly .",
    "no acute edema .",
]


class TestCheXbertPort:
    def _torch_labels(self, bert, heads, scorer, reports):
        out = []
        for rep in reports:
            ids = scorer._encode(rep)
            n = int((ids != scorer.tokenizer.pad_id).sum())
            t_ids = torch.tensor(ids[None, :n].astype(np.int64))
            with torch.no_grad():
                hidden = bert(input_ids=t_ids).last_hidden_state[:, 0, :]
                cls = [h(hidden).argmax(-1).item() for h in heads]
            out.append([1 if c in (1, 3) else 0 for c in cls])
        return np.asarray(out, np.int64)

    def test_label_parity_with_torch(self, fake_ckpt):
        path, root, bert, heads = fake_ckpt
        scorer = F1CheXbert(path, root, max_len=32, batch_size=2, hidden_size=32,
                            num_layers=2, num_heads=4, intermediate_size=64,
                            max_positions=64)
        assert scorer.import_report["mismatched"] == 0
        got = scorer.label(REPORTS)
        want = self._torch_labels(bert, heads, scorer, REPORTS)
        np.testing.assert_array_equal(got, want)

    def test_f1_surface(self, fake_ckpt):
        path, root, bert, heads = fake_ckpt
        scorer = F1CheXbert(path, root, max_len=32, batch_size=2, hidden_size=32,
                            num_layers=2, num_heads=4, intermediate_size=64,
                            max_positions=64)
        accuracy, pe, cr, cr5 = scorer(hyps=REPORTS, refs=REPORTS)
        # identical texts -> perfect agreement
        assert accuracy == 1.0
        assert cr["micro avg"]["f1-score"] in (0.0, 1.0)  # 1.0 unless all-zero labels
        assert set(TOP5_INDEX) < set(range(14))
        assert len(CONDITIONS) == 14

    def test_details_scores_table(self, fake_ckpt, monkeypatch):
        """compute_chexbert_details_scores (reference metrics.py:97-115
        contract): per-condition [prevalence (support), p, r, f1] rows plus
        '-'-led avg rows, weighted/samples averages dropped."""
        from evoke_tpu.core.config import MetricsConfig
        from evoke_tpu.evals import composite

        path, root, bert, heads = fake_ckpt
        cfg = MetricsConfig(chexbert_checkpoint=path,
                            chexbert_tokenizer_checkpoint=root)
        scorer = F1CheXbert(path, root, max_len=32, batch_size=2, hidden_size=32,
                            num_layers=2, num_heads=4, intermediate_size=64,
                            max_positions=64)
        monkeypatch.setitem(composite._SCORER_CACHE, f"chexbert:{path}", scorer)
        table = composite.compute_chexbert_details_scores(REPORTS, REPORTS, cfg)
        assert "micro avg" in table and "macro avg" in table
        assert "weighted avg" not in table and "samples avg" not in table
        assert table["micro avg"][0] == "-"
        for cond, row in table.items():
            assert len(row) == 4
            if "avg" not in cond:
                assert "(" in row[0]  # prevalence% (support)
