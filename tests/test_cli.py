import json
import os
import subprocess
import sys

import numpy as np
import pytest

from evoke_tpu.cli import main as cli_main
from evoke_tpu.data.synthetic import write_synthetic_dataset

TINY = [
    "--model.output_dim", "32", "--model.encoder_hidden_size", "32",
    "--model.encoder_num_hidden_layers", "1", "--model.encoder_num_heads", "2",
    "--model.encoder_intermediate_size", "64", "--model.d_model", "32",
    "--model.d_ff", "64", "--model.num_heads", "2", "--model.num_layers", "1",
    "--model.rm_num_slots", "2", "--model.rm_d_model", "32",
    "--model.fusion_num_heads", "2", "--model.fusion_intermediate_size", "64",
    "--model.image_size", "32", "--data.max_seq_len", "16",
    "--data.batch_size", "2", "--data.num_workers", "2",
    "--trainer.epochs", "1", "--trainer.log_interval", "1000",
    "--decode.beam_size", "2",
]


class TestScore:
    def test_score_json(self, tmp_path, capsys):
        blob = {"gts": {"a": "the heart is normal .", "b": "no effusion ."},
                "res": {"a": "the heart is normal .", "b": "small effusion ."}}
        p = tmp_path / "preds.json"
        p.write_text(json.dumps(blob))
        rc = cli_main(["score", "--data.ann_path", str(p)])
        assert rc == 0
        out = json.loads(capsys.readouterr().out)
        assert abs(out["BLEU_1"]) <= 1.0 and out["ROUGE_L"] > 0.5

    def test_score_prediction_csv(self, tmp_path, capsys):
        from evoke_tpu.core.loggers import PredictionCSV
        p = str(tmp_path / "test_prediction.csv")
        PredictionCSV(p).update("1", ["i1", "i2"], ["gt a", "gt b"], ["gt a", "x"],
                                {"BLEU_4": 0.5})
        rc = cli_main(["score", "--data.ann_path", p])
        assert rc == 0
        out = json.loads(capsys.readouterr().out)
        assert "BLEU_4" in out

    def test_help(self, capsys):
        assert cli_main([]) == 0
        assert "pretrain" in capsys.readouterr().out

    def test_unknown_task(self):
        assert cli_main(["frobnicate"]) == 2


@pytest.mark.slow
class TestEndToEndCLI:
    def test_pretrain_micro_run(self, tmp_path):
        root = str(tmp_path)
        ann = write_synthetic_dataset(root, n_train=4, n_val=2, n_test=2, image_size=32)
        rc = cli_main(["pretrain", "--data.ann_path", ann, "--data.image_dir", root,
                       "--data.tokenizer_dir", os.path.join(root, "tok"),
                       "--trainer.result_dir", os.path.join(root, "results"),
                       "--trainer.version", "cli_t"] + TINY)
        assert rc == 0
        rd = os.path.join(root, "results", "mimic_cxr", "pretrain", "cli_t")
        assert os.path.exists(os.path.join(rd, "pretrain.log"))
        assert os.path.isdir(os.path.join(rd, "checkpoint", "current"))


@pytest.mark.slow
class TestRetrieveCLI:
    def test_retrieve_writes_augmented_annotation(self, tmp_path):
        root = str(tmp_path)
        ann = write_synthetic_dataset(root, n_train=4, n_val=2, n_test=2, image_size=32)
        rc = cli_main(["retrieve", "--data.ann_path", ann, "--data.image_dir", root,
                       "--data.tokenizer_dir", os.path.join(root, "tok"),
                       "--trainer.result_dir", os.path.join(root, "results"),
                       "--trainer.version", "ret", "--data.retrieve_topk", "2",
                       "--data.retrieve_plot", "2"] + TINY)
        assert rc == 0
        out = ann.replace(".json", "_best_reports_keywords_2.json")
        assert os.path.exists(out)
        aug = json.loads(open(out).read())
        item = aug["val"][0]
        sk = item["specific_knowledge"]
        assert len(sk["sk_ids"]) <= 2 and sk["reports"]
        # retrieved ids come from the train split, never the query itself
        train_ids = {it["id"] for it in aug["train"]}
        assert set(sk["sk_ids"]) <= train_ids
        # retrieval-neighbor grids (reference show_topk_images/plot_images,
        # modules/utils.py:611-721): real PNGs per split in sk_analysis/
        import glob

        # the retrieve task derives its result dir under the pretrain task
        # (it runs on stage-1 weights, like the reference's PretrainTester)
        plot_dir = os.path.join(root, "results", "mimic_cxr", "pretrain", "ret",
                                "sk_analysis")
        pngs = glob.glob(os.path.join(plot_dir, "*_specific_knowledge.png"))
        assert pngs, plot_dir
        from PIL import Image

        im = Image.open(pngs[0])
        assert im.size == (512, 512) and im.getbbox() is not None


@pytest.mark.slow
class TestFullPipelineCLI:
    def test_pretrain_retrieve_finetune_test(self, tmp_path):
        """The complete EVOKE workflow through the CLI: stage 1 -> knowledge
        retrieval -> stage 2 (seeded from stage 1) -> test."""
        root = str(tmp_path)
        ann = write_synthetic_dataset(root, n_train=4, n_val=2, n_test=2, image_size=32)
        common = ["--data.image_dir", root,
                  "--data.tokenizer_dir", os.path.join(root, "tok"),
                  "--trainer.result_dir", os.path.join(root, "results")] + TINY
        assert cli_main(["pretrain", "--data.ann_path", ann,
                         "--trainer.version", "s1"] + common) == 0
        s1_ckpt = os.path.join(root, "results", "mimic_cxr", "pretrain", "s1",
                               "checkpoint", "current")
        assert os.path.isdir(s1_ckpt)
        assert cli_main(["retrieve", "--data.ann_path", ann,
                         "--trainer.version", "ret", "--data.retrieve_topk", "2",
                         "--trainer.load", s1_ckpt] + common) == 0
        aug = ann.replace(".json", "_best_reports_keywords_2.json")
        assert os.path.exists(aug)
        assert cli_main(["finetune", "--data.ann_path", aug,
                         "--trainer.version", "s2",
                         "--trainer.load", s1_ckpt] + common) == 0
        s2_dir = os.path.join(root, "results", "mimic_cxr", "finetune", "s2")
        assert os.path.exists(os.path.join(s2_dir, "test_prediction.csv"))
        s2_ckpt = os.path.join(s2_dir, "checkpoint", "current")
        assert cli_main(["test", "--data.ann_path", aug,
                         "--trainer.version", "s2t",
                         "--trainer.plot_heatmaps", "1",
                         "--trainer.load", s2_ckpt] + common) == 0
        t_dir = os.path.join(root, "results", "mimic_cxr", "test", "s2t")
        assert os.path.exists(os.path.join(t_dir, "test_prediction.csv"))
        import pandas as pd
        df = pd.read_csv(os.path.join(t_dir, "test_prediction.csv"), dtype=str)
        assert df.iloc[0]["images_id"].startswith("__metric__")
        # --trainer.plot_heatmaps renders per-token cross-attention PNGs
        # (reference Tester.plot surface)
        import glob
        pngs = glob.glob(os.path.join(t_dir, "attentions", "*", "layer_0", "*.png"))
        assert pngs, f"no heatmap PNGs under {t_dir}/attentions"
        from PIL import Image
        im = Image.open(pngs[0])
        assert im.size == (32, 32)


@pytest.mark.slow
class TestServeCLI:
    def test_serve_writes_predictions_and_stats(self, tmp_path, capsys):
        root = str(tmp_path)
        ann = write_synthetic_dataset(root, n_train=4, n_val=2, n_test=3, image_size=32)
        rc = cli_main(["serve", "--data.ann_path", ann, "--data.image_dir", root,
                       "--data.tokenizer_dir", os.path.join(root, "tok"),
                       "--trainer.result_dir", os.path.join(root, "results"),
                       "--trainer.version", "srv"] + TINY)
        assert rc == 0
        out_lines = [l for l in capsys.readouterr().out.splitlines() if l.startswith("{")]
        stats = json.loads(out_lines[-1])
        assert stats["reports"] == 3 and stats["reports_per_s"] > 0
        csv_path = stats["prediction_csv"]
        assert os.path.exists(csv_path)
        # serve keeps its own result dir — never shares with a test run (ADVICE r2)
        assert os.sep + "serve" + os.sep in csv_path
        import csv as _csv
        rows = list(_csv.reader(open(csv_path)))
        assert rows[0] == ["images_id", "generated_reports", "ground_truth"]
        assert len(rows) == 4  # header + 3 test studies
        assert all(r[1].strip() for r in rows[1:])  # every study got a report

    def test_serve_continuous_engine_matches_batch(self, tmp_path, capsys):
        """--decode.engine continuous serves every study through the
        ring-cache engine and produces the same reports as the batch engine
        (decode/continuous.py parity, exercised through the CLI surface)."""
        root = str(tmp_path)
        ann = write_synthetic_dataset(root, n_train=4, n_val=2, n_test=3, image_size=32)
        results = {}
        for engine, version in (("batch", "srvb"), ("continuous", "srvc")):
            rc = cli_main(["serve", "--data.ann_path", ann, "--data.image_dir", root,
                           "--data.tokenizer_dir", os.path.join(root, "tok"),
                           "--trainer.result_dir", os.path.join(root, "results"),
                           "--trainer.version", version,
                           "--decode.engine", engine,
                           "--decode.slots", "2", "--decode.seg_steps", "4",
                           "--trainer.seed", "7"] + TINY)
            assert rc == 0
            out_lines = [l for l in capsys.readouterr().out.splitlines()
                         if l.startswith("{")]
            stats = json.loads(out_lines[-1])
            assert stats["reports"] == 3 and stats["reports_per_s"] > 0
            import csv as _csv
            rows = list(_csv.reader(open(stats["prediction_csv"])))
            results[engine] = {r[0]: r[1] for r in rows[1:]}
        assert results["continuous"] == results["batch"]

    def test_serve_dp_mesh_matches_single_device(self, tmp_path, capsys):
        """--decode.serve_dp 2: the serving mesh shards slots/batches over
        'dp' (Pallas kernels ride shard_map on TPU; XLA fallback here on
        CPU) and serves the same reports as the single-device engine."""
        root = str(tmp_path)
        ann = write_synthetic_dataset(root, n_train=4, n_val=2, n_test=3, image_size=32)
        results = {}
        for dp, version in (("0", "srv1"), ("2", "srvdp")):
            rc = cli_main(["serve", "--data.ann_path", ann, "--data.image_dir", root,
                           "--data.tokenizer_dir", os.path.join(root, "tok"),
                           "--trainer.result_dir", os.path.join(root, "results"),
                           "--trainer.version", version,
                           "--decode.engine", "continuous",
                           "--decode.serve_dp", dp,
                           "--decode.slots", "2", "--decode.seg_steps", "4",
                           "--trainer.seed", "7"] + TINY)
            assert rc == 0
            out = capsys.readouterr().out
            if dp == "2":
                assert "serving mesh: dp=2" in out
            out_lines = [l for l in out.splitlines() if l.startswith("{")]
            stats = json.loads(out_lines[-1])
            assert stats["reports"] == 3
            import csv as _csv
            rows = list(_csv.reader(open(stats["prediction_csv"])))
            results[dp] = {r[0]: r[1] for r in rows[1:]}
        assert results["2"] == results["0"]
