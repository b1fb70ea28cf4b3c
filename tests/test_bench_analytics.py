"""The analytic roofline model in bench.py (VERDICT r2 weak #2): FLOPs/bytes
for a decode call derived from model dimensions, replacing XLA cost_analysis.
Fast lane: pure numpy over a real (tiny) parameter tree."""

import sys

import jax
import numpy as np
import pytest

sys.path.insert(0, __file__.rsplit("/tests/", 1)[0])

from bench import (_steps_executed, analytic_decode_model,  # noqa: E402
                   analytic_train_flops)


class TestStepsExecuted:
    def test_max_over_rows(self):
        EOS, L = 99, 10
        seqs = np.zeros((3, L), np.int32)
        seqs[0, 2] = EOS   # finishes at step 3
        seqs[1, 6] = EOS   # finishes at step 7 -> loop runs 7 steps
        seqs[2, 1] = EOS
        assert _steps_executed(seqs, EOS, L) == 7

    def test_no_eos_runs_full(self):
        seqs = np.ones((2, 8), np.int32)
        assert _steps_executed(seqs, 99, 8) == 8


@pytest.fixture(scope="module")
def tiny_setup():
    from __graft_entry__ import _example_batch, _flagship

    vocab = 64
    model = _flagship(vocab_size=vocab, tiny=True)
    rng = np.random.default_rng(0)
    batch = _example_batch(rng, 2, 2, 32, 16, vocab)
    variables = jax.jit(model.init)(
        jax.random.key(0), batch["images"], batch["ids"], batch["mask"],
        batch["pids"], batch["valid"], batch["inc_ids"], batch["inc_mask"])
    return model, variables, vocab


class TestAnalyticModel:
    def test_groups_cover_all_params(self, tiny_setup):
        model, variables, vocab = tiny_setup
        ana = analytic_decode_model(variables, model, 32, 4, 2, 3,
                                    steps=16, schedule=(16,), vocab=vocab)
        total = sum(int(np.prod(l.shape))
                    for l in jax.tree_util.tree_leaves(variables["params"]))
        assert sum(ana["groups"].values()) == total
        # nothing big lands in the unknown bucket
        assert ana["groups"]["other"] <= 0.01 * total
        assert ana["groups"]["dec_step"] > 0 and ana["groups"]["resnet"] > 0
        assert ana["groups"]["dec_embed"] > 0

    def test_bytes_scale_with_steps_and_cache(self, tiny_setup):
        model, variables, vocab = tiny_setup
        short = analytic_decode_model(variables, model, 32, 4, 2, 3,
                                      steps=4, schedule=(16,), vocab=vocab)
        full = analytic_decode_model(variables, model, 32, 4, 2, 3,
                                     steps=16, schedule=(16,), vocab=vocab)
        assert full["bytes_loop"] > short["bytes_loop"]
        assert full["flops_loop"] > short["flops_loop"]
        # a phased schedule strictly reduces cache traffic vs full-length
        phased = analytic_decode_model(variables, model, 32, 4, 2, 3,
                                       steps=16, schedule=(4, 8, 12, 16),
                                       vocab=vocab)
        assert phased["bytes_loop"] < full["bytes_loop"]

    def test_encoder_flops_scale_with_resolution(self, tiny_setup):
        model, variables, vocab = tiny_setup
        lo = analytic_decode_model(variables, model, 32, 4, 2, 3,
                                   steps=8, schedule=(16,), vocab=vocab)
        hi = analytic_decode_model(variables, model, 64, 4, 2, 3,
                                   steps=8, schedule=(16,), vocab=vocab)
        assert hi["flops_enc"] > lo["flops_enc"]


class TestAnalyticTrainFlops:
    def test_scales_with_batch_and_exceeds_forward(self, tiny_setup):
        model, variables, vocab = tiny_setup
        small = analytic_train_flops(variables, model, 32, 2, 4, 16, vocab)
        big = analytic_train_flops(variables, model, 32, 4, 8, 16, vocab)
        assert 0 < small < big
        # train (fwd+bwd) must exceed the decode call's one-shot encoder FLOPs
        enc = analytic_decode_model(variables, model, 32, 4, 2, 3,
                                    steps=16, schedule=(16,), vocab=vocab)
        assert small > enc["flops_enc"]

    def test_seq_len_term_matters(self, tiny_setup):
        model, variables, vocab = tiny_setup
        short = analytic_train_flops(variables, model, 32, 2, 4, 8, vocab)
        long = analytic_train_flops(variables, model, 32, 2, 4, 16, vocab)
        assert long > short
