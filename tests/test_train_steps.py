"""End-to-end micro-runs on synthetic data (SURVEY.md §4 test plan, item 4):
jitted DP train steps must decrease the loss; generation must emit decodable
sequences; dp-sharded steps must match single-device math."""

from dataclasses import replace

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from evoke_tpu.core.config import DecodeConfig
from evoke_tpu.core.mesh import MeshSpec, create_mesh, shard_batch
from evoke_tpu.core import prng
from evoke_tpu.data.synthetic import corpus_for_tokenizer, synthetic_batch
from evoke_tpu.data.tokenizer import WordTokenizer
from evoke_tpu.models.finetune import FinetuneModel
from evoke_tpu.models.pretrain import PretrainModel
from evoke_tpu.train.optim import build_optimizer
from evoke_tpu.train.steps import (create_train_state, make_eval_step, make_generate_step,
                                   make_train_step)

pytestmark = pytest.mark.slow  # full-model CPU compiles: run via the slow lane

KEY = jax.random.key(42)

SMALL = dict(output_dim=32, encoder_hidden_size=32, encoder_num_layers=1,
             encoder_num_heads=2, encoder_intermediate_size=64)

DEC = dict(d_model=32, d_ff=64, num_heads=2, num_layers=2, rm_num_slots=3, rm_d_model=32,
           fusion_num_heads=2, fusion_intermediate_size=64, sk_fusion_num_layers=1,
           drop_prob_lm=0.0)


@pytest.fixture(scope="module")
def tok():
    return WordTokenizer.train(corpus_for_tokenizer())


@pytest.fixture(scope="module")
def batch(tok):
    rng = np.random.default_rng(0)
    return synthetic_batch(rng, tok, batch=8, image_size=32, max_seq_len=16)


class TestFinetuneTraining:
    def test_loss_decreases(self, tok, batch):
        model = FinetuneModel(vocab_size=tok.get_vocab_size(), max_seq_len=16, **DEC, **SMALL)
        variables = jax.jit(model.init)(KEY, batch["images"], batch["ids"], batch["mask"],
                                        batch["pids"], batch["valid"])
        # grad_clip_value=10: the reference's clip(0.1) + RAdam's ~25-step
        # unrectified warmup makes a short overfit test impossibly slow
        tx = build_optimizer("RAdam", "finetune", variables["params"],
                             pt_lr=1e-3, ft_lr=1e-3, weight_decay=0.0, grad_clip_value=10.0)
        state = create_train_state(variables, tx)
        step = make_train_step(model, tx, prng.root_key(0))
        losses = []
        for _ in range(20):
            state, metrics = step(state, batch)
            losses.append(float(metrics["lm"]))
        assert losses[-1] < losses[0] * 0.9, losses
        assert all(np.isfinite(losses))

    def test_generate_beam_and_greedy(self, tok, batch):
        model = FinetuneModel(vocab_size=tok.get_vocab_size(), max_seq_len=16, **DEC, **SMALL)
        variables = jax.jit(model.init)(KEY, batch["images"], batch["ids"], batch["mask"],
                                        batch["pids"], batch["valid"])
        tx = build_optimizer("RAdam", "finetune", variables["params"],
                             pt_lr=1e-3, ft_lr=1e-3, weight_decay=0.0)
        state = create_train_state(variables, tx)
        gen_beam = make_generate_step(model, tok, DecodeConfig(beam_size=3), 16)
        seqs = gen_beam(state, batch)
        assert seqs.shape == (8, 16)
        texts = tok.decode_batch(np.asarray(seqs).tolist())
        assert all(isinstance(t, str) for t in texts)
        gen_greedy = make_generate_step(model, tok, DecodeConfig(beam_size=1,
                                                                 sample_method="greedy"), 16)
        seqs_g = gen_greedy(state, batch)
        assert seqs_g.shape == (8, 16)

    def test_cache_phases_output_identical(self, tok, batch):
        """Phased KV-cache growth (DecodeConfig.cache_phases) must not change
        a single generated token, through the full model's decode_step."""
        model = FinetuneModel(vocab_size=tok.get_vocab_size(), max_seq_len=16, **DEC, **SMALL)
        variables = jax.jit(model.init)(KEY, batch["images"], batch["ids"], batch["mask"],
                                        batch["pids"], batch["valid"])
        tx = build_optimizer("RAdam", "finetune", variables["params"],
                             pt_lr=1e-3, ft_lr=1e-3, weight_decay=0.0)
        state = create_train_state(variables, tx)
        for cfg in (DecodeConfig(beam_size=3), DecodeConfig(beam_size=1, sample_method="greedy")):
            one = make_generate_step(model, tok, replace(cfg, cache_phases=1), 16)(state, batch)
            four = make_generate_step(model, tok, replace(cfg, cache_phases=4), 16)(state, batch)
            np.testing.assert_array_equal(np.asarray(one), np.asarray(four))

    def test_two_group_lrs_differ(self, tok, batch):
        model = FinetuneModel(vocab_size=tok.get_vocab_size(), max_seq_len=16, **DEC, **SMALL)
        inc_ids, inc_mask = batch["ids"][:, :6], batch["mask"][:, :6]
        variables = jax.jit(lambda *a: model.init(*a, method=model.warmup))(
            KEY, batch["images"], batch["ids"], batch["mask"], batch["pids"],
            batch["valid"], inc_ids, inc_mask)
        labels = {"fusion": "pt", "text_encoder": "pt", "visual_extractor": "pt",
                  "multimodal_fusion_layers_0": "ft", "visual_self_atten_layers_0": "ft",
                  "text_decoder": "ft", "text_head": "ft", "visual_head": "ft"}
        from evoke_tpu.train.optim import _param_labels
        got = _param_labels(variables["params"])
        for k, want in labels.items():
            assert set(jax.tree_util.tree_leaves(got[k])) == {want}, k
        tx = build_optimizer("RAdam", "finetune", variables["params"],
                             pt_lr=0.0, ft_lr=1e-3, weight_decay=0.0)
        state = create_train_state(variables, tx)
        # snapshot BEFORE stepping: the jitted step donates the old state's buffers
        before_vx = np.asarray(jax.tree_util.tree_leaves(state.params["visual_extractor"])[0])
        before_td = np.asarray(jax.tree_util.tree_leaves(state.params["text_decoder"])[0])
        step = make_train_step(model, tx, prng.root_key(0))
        new_state, _ = step(state, batch)
        # pt group (visual_extractor) frozen at lr=0; ft group (text_decoder) moves
        after_vx = np.asarray(jax.tree_util.tree_leaves(new_state.params["visual_extractor"])[0])
        after_td = np.asarray(jax.tree_util.tree_leaves(new_state.params["text_decoder"])[0])
        np.testing.assert_array_equal(before_vx, after_vx)
        assert not np.allclose(before_td, after_td)


class TestGradAccumulation:
    def test_k2_identical_grads_equal_one_full_step_optax_level(self):
        """MultiSteps(k=2) fed the SAME gradient twice == one k=1 step on it
        (averaged grad == the grad), bit-exact through the whole two-group
        RAdam chain. Optimizer-level on purpose: at the model level each
        micro-step draws a fresh dropout key (the reference's fusion/RM MHA
        dropout defaults are live in train), so per-micro-batch grads differ
        BY DESIGN and exact lane equality only holds below the model."""
        rng = np.random.default_rng(0)
        params = {"text_decoder": {"w": jnp.asarray(rng.normal(size=(8, 8)), jnp.float32)},
                  "backbone": {"b": jnp.asarray(rng.normal(size=(16,)), jnp.float32)}}
        g = jax.tree_util.tree_map(
            lambda p: jnp.asarray(rng.normal(size=p.shape), jnp.float32), params)
        kw = dict(pt_lr=1e-3, ft_lr=2e-3, weight_decay=1e-4, grad_clip_value=10.0)
        tx1 = build_optimizer("RAdam", "finetune", params, **kw)
        tx2 = build_optimizer("RAdam", "finetune", params, grad_accum_steps=2, **kw)
        s1, s2 = tx1.init(params), tx2.init(params)
        u_mid, s2 = tx2.update(g, s2, params)
        for leaf in jax.tree_util.tree_leaves(u_mid):  # micro-step: zero update
            np.testing.assert_array_equal(np.asarray(leaf), 0.0)
        u2, s2 = tx2.update(g, s2, params)
        v1, s1 = tx1.update(g, s1, params)
        for a, b in zip(jax.tree_util.tree_leaves(u2), jax.tree_util.tree_leaves(v1)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_microsteps_freeze_params_until_kth(self, tok, batch):
        """Model-level: micro-steps 1..k-1 leave params bit-untouched; the
        k-th fires a real update."""
        model = FinetuneModel(vocab_size=tok.get_vocab_size(), max_seq_len=16,
                              **DEC, **SMALL)
        variables = jax.jit(model.init)(KEY, batch["images"], batch["ids"],
                                        batch["mask"], batch["pids"], batch["valid"])
        tx = build_optimizer("RAdam", "finetune", variables["params"], pt_lr=1e-3,
                             ft_lr=2e-3, weight_decay=1e-4, grad_clip_value=10.0,
                             grad_accum_steps=2)
        state = create_train_state(variables, tx)
        step = make_train_step(model, tx, prng.root_key(0))

        p0 = jax.device_get(state.params)
        state, _ = step(state, batch)  # micro-step 1: accumulate only
        mid = jax.device_get(state.params)
        for a, b in zip(jax.tree_util.tree_leaves(p0), jax.tree_util.tree_leaves(mid)):
            np.testing.assert_array_equal(a, b)
        state, _ = step(state, batch)  # micro-step 2: averaged update fires
        end = jax.device_get(state.params)
        moved = any(
            np.abs(np.asarray(a) - np.asarray(b)).max() > 0
            for a, b in zip(jax.tree_util.tree_leaves(mid),
                            jax.tree_util.tree_leaves(end)))
        assert moved, "k-th micro-step applied no update"

    def test_set_lr_scale_reaches_through_multisteps(self, tok, batch):
        from evoke_tpu.train.optim import set_lr_scale

        model = FinetuneModel(vocab_size=tok.get_vocab_size(), max_seq_len=16,
                              **DEC, **SMALL)
        variables = jax.jit(model.init)(KEY, batch["images"], batch["ids"],
                                        batch["mask"], batch["pids"], batch["valid"])
        tx = build_optimizer("RAdam", "finetune", variables["params"], pt_lr=1e-3,
                             ft_lr=1e-3, weight_decay=0.0, grad_accum_steps=3)
        state = create_train_state(variables, tx)
        state = state.replace(opt_state=set_lr_scale(state.opt_state, 0.25))
        inner = state.opt_state.inner_opt_state
        assert float(inner.hyperparams["lr_scale"]) == 0.25


class TestPretrainTraining:
    def test_loss_decreases(self, tok, batch):
        model = PretrainModel(vocab_size=tok.get_vocab_size(), **SMALL)
        variables = jax.jit(model.init)(KEY, batch["images"], batch["ids"], batch["mask"],
                                        batch["pids"], batch["valid"])
        tx = build_optimizer("AdamW", "pretrain", variables["params"],
                             pt_lr=1e-3, ft_lr=1e-3, weight_decay=0.0, grad_clip_value=10.0)
        state = create_train_state(variables, tx)
        step = make_train_step(model, tx, prng.root_key(1), task="pretrain")
        losses = []
        for _ in range(8):
            state, metrics = step(state, batch)
            losses.append(float(metrics["all_loss"]))
        assert losses[-1] < losses[0], losses

    def test_eval_step_runs(self, tok, batch):
        model = PretrainModel(vocab_size=tok.get_vocab_size(), **SMALL)
        variables = jax.jit(model.init)(KEY, batch["images"], batch["ids"], batch["mask"],
                                        batch["pids"], batch["valid"])
        tx = build_optimizer("AdamW", "pretrain", variables["params"],
                             pt_lr=1e-3, ft_lr=1e-3, weight_decay=0.0)
        state = create_train_state(variables, tx)
        ev = make_eval_step(model)
        out = ev(state, batch)
        assert np.isfinite(float(out["all_loss"]))


class TestDPEquivalence:
    def test_sharded_step_matches_single_device(self, devices, tok, batch):
        """DP loss == single-device loss (SURVEY §4 item 3)."""
        mesh = create_mesh(MeshSpec(dp=8))
        model = PretrainModel(vocab_size=tok.get_vocab_size(), **SMALL)
        variables = jax.jit(model.init)(KEY, batch["images"], batch["ids"], batch["mask"],
                                        batch["pids"], batch["valid"])
        ev = make_eval_step(model)
        tx = build_optimizer("AdamW", "pretrain", variables["params"],
                             pt_lr=1e-3, ft_lr=1e-3, weight_decay=0.0)
        state = create_train_state(variables, tx)
        single = ev(state, batch)
        # this fixture's 12-row image leaf (8 anchors + 4 aux) is intentionally
        # not dp-divisible: replicate it explicitly, shard the anchor-leading
        # leaves — GSPMD still computes the identical global loss
        sharded_batch = shard_batch(batch, mesh, allow_replicate=True)
        sharded = ev(state, sharded_batch)
        np.testing.assert_allclose(float(sharded["all_loss"]), float(single["all_loss"]),
                                   rtol=2e-5)


class TestDiverseGenerate:
    def test_group_size_two_generates(self, tok, batch):
        model = FinetuneModel(vocab_size=tok.get_vocab_size(), max_seq_len=16, **DEC, **SMALL)
        variables = jax.jit(model.init)(KEY, batch["images"], batch["ids"], batch["mask"],
                                        batch["pids"], batch["valid"])
        tx = build_optimizer("RAdam", "finetune", variables["params"],
                             pt_lr=1e-3, ft_lr=1e-3, weight_decay=0.0)
        state = create_train_state(variables, tx)
        gen = make_generate_step(model, tok, DecodeConfig(beam_size=4, group_size=2,
                                                          diversity_lambda=0.5), 16)
        seqs = gen(state, batch)
        assert seqs.shape == (8, 16)
