"""End-to-end trainer integration on the synthetic dataset: epochs run, CSVs are
written in the reference's format, checkpoints save/resume, early-stop and the
stage-1 -> stage-2 partial load work."""

import os

import jax
import numpy as np
import pytest

from evoke_tpu.core.config import EvokeConfig
from evoke_tpu.data.batching import MultiviewBatcher
from evoke_tpu.data.datasets import load_annotation, parse_finetune, parse_pretrain
from evoke_tpu.data.synthetic import write_synthetic_dataset
from evoke_tpu.data.tokenizer import WordTokenizer
from evoke_tpu.data.transforms import make_transform
from evoke_tpu.evals.nlg import compute_nlg_scores
from evoke_tpu.models.finetune import FinetuneModel
from evoke_tpu.models.pretrain import PretrainModel
from evoke_tpu.train.optim import build_optimizer
from evoke_tpu.train.steps import create_train_state
from evoke_tpu.train.trainer import FinetuneTrainer, PretrainTrainer, Tester

pytestmark = pytest.mark.slow  # full-model CPU compiles: run via the slow lane


KEY = jax.random.key(0)
SMALL = dict(output_dim=32, encoder_hidden_size=32, encoder_num_layers=1,
             encoder_num_heads=2, encoder_intermediate_size=64)
DEC = dict(d_model=32, d_ff=64, num_heads=2, num_layers=1, rm_num_slots=2, rm_d_model=32,
           fusion_num_heads=2, fusion_intermediate_size=64, sk_fusion_num_layers=1,
           drop_prob_lm=0.0)


@pytest.fixture(scope="module")
def world(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("world"))
    ann_path = write_synthetic_dataset(root, n_train=8, n_val=4, n_test=4, image_size=32)
    ann = load_annotation(ann_path)
    tok = WordTokenizer.train([it["report"] for it in ann["train"]])
    return root, ann, tok


def make_cfg(root, task, tmpdir):
    cfg = EvokeConfig()
    cfg.trainer.task = task
    cfg.trainer.epochs = 2
    cfg.trainer.result_dir = os.path.join(tmpdir, "results")
    cfg.trainer.version = "t"
    cfg.trainer.log_interval = 1000
    cfg.data.max_seq_len = 16
    cfg.data.image_dir = root
    cfg.decode.beam_size = 2
    # finetune monitors an NLG metric we can compute without CheXbert/RadGraph
    cfg.trainer.ft_monitor_metric = "BLEU_4"
    cfg.trainer.ft_lr_monitor_metric = "BLEU_4"
    return cfg


def loaders_for(ann, tok, root, split, train):
    has_ind, no_ind = parse_finetune(ann, split)
    tf = make_transform(32, train=train)
    mk = lambda exs, with_ind: (MultiviewBatcher(
        exs, tok, tf, n_anchor=2, max_seq_len=16, image_dir=root, shuffle=train,
        with_indication=with_ind, text_field="report", add_bos_eos=True, num_workers=2)
        if exs else None)
    return mk(has_ind, True), mk(no_ind, False)


class TestFinetuneTrainer:
    def test_two_epochs_write_artifacts(self, world, tmp_path):
        root, ann, tok = world
        cfg = make_cfg(root, "finetune", str(tmp_path))
        model = FinetuneModel(vocab_size=tok.get_vocab_size(), max_seq_len=16,
                              **DEC, **SMALL)
        ex_inc, ex_noinc = loaders_for(ann, tok, root, "train", True)
        some = ex_inc or ex_noinc
        b0 = next(iter(some))
        init_args = [b0["images"], b0["ids"], b0["mask"], b0["pids"], b0["valid"],
                     b0.get("inc_ids", b0["ids"]), b0.get("inc_mask", b0["mask"])]
        variables = jax.jit(lambda *a: model.init(*a, method=model.warmup))(KEY, *init_args)
        tx = build_optimizer("RAdam", "finetune", variables["params"], pt_lr=1e-4,
                             ft_lr=1e-3, weight_decay=1e-4)
        state = create_train_state(variables, tx)
        trainer = FinetuneTrainer(
            cfg, model, tok, tx, state,
            train_loaders=loaders_for(ann, tok, root, "train", True),
            eval_loaders={"val": loaders_for(ann, tok, root, "val", False),
                          "test": loaders_for(ann, tok, root, "test", False)},
            metrics_fn=lambda g, r: compute_nlg_scores(g, r))
        log = trainer.train()
        assert "val_BLEU_4" in log and np.isfinite(log["val_BLEU_4"])
        rd = cfg.result_dir
        assert os.path.exists(os.path.join(rd, "val_prediction.csv"))
        assert os.path.exists(os.path.join(rd, "test_prediction.csv"))
        assert os.path.exists(os.path.join(rd, "finetune.log"))
        assert os.path.exists(os.path.join(rd, "metrics.jsonl"))
        assert os.path.exists(os.path.join(
            rd, "mimic_cxr_finetune_results_record.csv"))
        assert trainer.ckpt.exists("current")
        # prediction CSV has both epoch columns and metric rows first
        import pandas as pd
        df = pd.read_csv(os.path.join(rd, "test_prediction.csv"), dtype=str)
        assert {"pred_1", "pred_2"} <= set(df.columns)
        assert df.iloc[0]["images_id"].startswith("__metric__")

        # resume from the checkpoint continues at the right epoch.
        # NOTE: the jitted train step donates the old state's buffers, so the
        # original `variables` are dead after training — re-init fresh ones.
        variables2 = jax.jit(lambda *a: model.init(*a, method=model.warmup))(KEY, *init_args)
        cfg2 = make_cfg(root, "finetune", str(tmp_path))
        cfg2.trainer.resume = "current"
        trainer2 = FinetuneTrainer(
            cfg2, model, tok, tx, create_train_state(variables2, tx),
            train_loaders=loaders_for(ann, tok, root, "train", True),
            eval_loaders={"val": loaders_for(ann, tok, root, "val", False),
                          "test": loaders_for(ann, tok, root, "test", False)},
            metrics_fn=lambda g, r: compute_nlg_scores(g, r))
        assert trainer2.start_epoch == 3


class TestPretrainTrainer:
    def test_pretrain_then_partial_load_into_finetune(self, world, tmp_path):
        root, ann, tok = world
        cfg = make_cfg(root, "pretrain", str(tmp_path))
        cfg.trainer.epochs = 1
        pexs = parse_pretrain(ann, "train")
        tf_tr, tf_ev = make_transform(32, True), make_transform(32, False)
        mk = lambda exs, tf, sh: MultiviewBatcher(exs, tok, tf, n_anchor=2, max_seq_len=16,
                                                  image_dir=root, shuffle=sh, num_workers=2)
        model = PretrainModel(vocab_size=tok.get_vocab_size(), **SMALL)
        b0 = next(iter(mk(pexs, tf_tr, False)))
        variables = jax.jit(model.init)(KEY, b0["images"], b0["ids"], b0["mask"],
                                        b0["pids"], b0["valid"])
        tx = build_optimizer("AdamW", "pretrain", variables["params"], pt_lr=1e-4,
                             ft_lr=1e-4, weight_decay=1e-4)
        state = create_train_state(variables, tx)
        trainer = PretrainTrainer(
            cfg, model, tok, tx, state,
            train_loader=mk(pexs, tf_tr, True),
            val_loader=mk(parse_pretrain(ann, "val"), tf_ev, False),
            test_loader=None)
        log = trainer.train()
        assert "val_all_loss" in log and np.isfinite(log["val_all_loss"])
        assert trainer.ckpt.exists("current")

        # stage-2 partial load: shared encoder weights transfer
        fmodel = FinetuneModel(vocab_size=tok.get_vocab_size(), max_seq_len=16,
                               **DEC, **SMALL)
        fb = {"images": b0["images"], "ids": b0["ids"], "mask": b0["mask"],
              "pids": b0["pids"], "valid": b0["valid"]}
        fvars = jax.jit(lambda *a: fmodel.init(*a, method=fmodel.warmup))(
            KEY, fb["images"], fb["ids"], fb["mask"], fb["pids"], fb["valid"],
            fb["ids"], fb["mask"])
        ckpt_dir = os.path.join(cfg.result_dir, "checkpoint", "current")
        from evoke_tpu.core.checkpoint import CheckpointManager
        mgr = CheckpointManager(os.path.join(str(tmp_path), "x"))
        merged, report = mgr.partial_restore_from(ckpt_dir, fvars["params"])
        assert report["loaded"] > 50  # visual_extractor + text_encoder + fusion transfer
        got = jax.tree_util.tree_leaves(merged["visual_extractor"])[0]
        want = jax.tree_util.tree_leaves(
            trainer.state.params["visual_extractor"])[0]
        np.testing.assert_allclose(np.asarray(got), np.asarray(want))


class TestAutoResume:
    def test_auto_resume_preemption_recovery(self, world, tmp_path):
        """resume='auto' (SURVEY §5.3): first launch starts fresh; relaunching
        the SAME command after a kill resumes from the last saved epoch."""
        root, ann, tok = world
        cfg = make_cfg(root, "pretrain", str(tmp_path))
        cfg.trainer.epochs = 2
        cfg.trainer.resume = "auto"
        pexs = parse_pretrain(ann, "train")
        tf_tr, tf_ev = make_transform(32, True), make_transform(32, False)
        mk = lambda exs, tf, sh: MultiviewBatcher(exs, tok, tf, n_anchor=2,
                                                  max_seq_len=16, image_dir=root,
                                                  shuffle=sh, num_workers=2)
        model = PretrainModel(vocab_size=tok.get_vocab_size(), **SMALL)
        b0 = next(iter(mk(pexs, tf_tr, False)))
        variables = jax.jit(model.init)(KEY, b0["images"], b0["ids"], b0["mask"],
                                        b0["pids"], b0["valid"])
        tx = build_optimizer("AdamW", "pretrain", variables["params"], pt_lr=1e-4,
                             ft_lr=1e-4, weight_decay=1e-4)
        # the train step donates its state; launch each "process" from a host copy
        host_vars = jax.device_get(variables)

        def launch():
            fresh = jax.tree_util.tree_map(jax.numpy.asarray, host_vars)
            state = create_train_state(fresh, tx)
            return PretrainTrainer(
                cfg, model, tok, tx, state, train_loader=mk(pexs, tf_tr, True),
                val_loader=mk(parse_pretrain(ann, "val"), tf_ev, False),
                test_loader=None)

        t1 = launch()
        assert t1.start_epoch == 1  # no checkpoint yet: fresh start
        t1.train()
        t2 = launch()               # "relaunch after preemption"
        assert t2.start_epoch == 3  # resumes past the 2 completed epochs
        got = jax.tree_util.tree_leaves(t2.state.params)[0]
        want = jax.tree_util.tree_leaves(t1.state.params)[0]
        np.testing.assert_allclose(np.asarray(got), np.asarray(want))
