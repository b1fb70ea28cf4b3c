"""Diverse sampling (decode/beam.py diverse_sample) and the sample_n knob.

Oracle: a literal numpy port of att_model.py:231-320 ``_diverse_sample`` in
greedy mode (deterministic), with the two documented departures (per-study
diversity penalty; PAD-freeze after EOS — see diverse_sample's docstring).
The e2e tests prove the knobs reach make_generate_step: sample_n yields
[B, n, L] distinct stochastic samples; group_size>1 with a sampling method
dispatches to diverse_sample.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from evoke_tpu.decode.beam import diverse_sample

from tests.test_decode import BOS, EOS, PAD, V, jax_step, make_tables, np_logp


def log_softmax_np(x):
    x = x - x.max(-1, keepdims=True)
    return x - np.log(np.exp(x).sum(-1, keepdims=True))


def reference_diverse_sample(M, batch, groups, L, lam=0.5, temperature=1.0,
                             block_trigrams=False, alpha=2.0):
    st = [dict(counts=np.zeros((batch, V), np.float32),
               tok=np.full((batch,), BOS, np.int64),
               seq=np.full((batch, L), PAD, np.int64),
               unfinished=np.ones(batch, bool),
               trigrams=[dict() for _ in range(batch)])
          for _ in range(groups)]
    for tt in range(L + groups - 1):
        for divm in range(groups):
            t = tt - divm
            if t < 0 or t >= L:
                continue
            s = st[divm]
            logp = np_logp(M, s["tok"], s["counts"])
            logp = log_softmax_np(logp / temperature)   # att_model.py:267
            for prev in range(divm):                    # per-study penalty
                chosen = st[prev]["seq"][:, t]
                for i in range(batch):
                    logp[i, chosen[i]] -= lam
            if block_trigrams and t >= 3:
                for i in range(batch):
                    prev_two = (s["seq"][i, t - 3], s["seq"][i, t - 2])
                    s["trigrams"][i].setdefault(prev_two, []).append(s["seq"][i, t - 1])
                for i in range(batch):
                    prev_two = (s["seq"][i, t - 2], s["seq"][i, t - 1])
                    for j in s["trigrams"][i].get(prev_two, []):
                        logp[i, j] += -0.693 * alpha
            nxt = logp.argmax(-1)
            nxt[~s["unfinished"]] = PAD
            s["unfinished"] &= nxt != EOS
            s["seq"][:, t] = nxt
            for i in range(batch):                      # jax_step counts fed toks
                s["counts"][i, nxt[i]] += 1
            s["tok"] = nxt
    return np.stack([s["seq"] for s in st], axis=1)     # [B, G, L]


class TestDiverseSample:
    @pytest.mark.parametrize("groups,lam,temp", [(2, 0.5, 1.0), (3, 2.0, 1.5)])
    def test_matches_reference_algorithm(self, groups, lam, temp):
        M = make_tables(3)
        batch, L = 3, 10
        step = jax_step(M)
        states = [{"counts": jnp.zeros((batch, V), jnp.float32)}
                  for _ in range(groups)]
        seqs, _ = jax.jit(lambda ss: diverse_sample(
            step, ss, batch, bos_id=BOS, eos_id=EOS, pad_id=PAD, vocab_size=V,
            group_size=groups, max_len=L, sample_method="greedy",
            temperature=temp, diversity_lambda=lam, block_trigrams=False))(states)
        want = reference_diverse_sample(M, batch, groups, L, lam=lam,
                                        temperature=temp)
        np.testing.assert_array_equal(np.asarray(seqs), want)

    def test_trigram_blocking_matches(self):
        M = make_tables(5)
        batch, L, groups = 2, 12, 2
        step = jax_step(M)
        states = [{"counts": jnp.zeros((batch, V), jnp.float32)}
                  for _ in range(groups)]
        seqs, _ = diverse_sample(
            step, states, batch, bos_id=BOS, eos_id=EOS, pad_id=PAD,
            vocab_size=V, group_size=groups, max_len=L, sample_method="greedy",
            diversity_lambda=0.5, block_trigrams=True)
        want = reference_diverse_sample(M, batch, groups, L, lam=0.5,
                                        block_trigrams=True)
        np.testing.assert_array_equal(np.asarray(seqs), want)

    def test_groups_diverge(self):
        """With a large lambda the groups must choose different tokens at the
        same local position (that's the point of the mode)."""
        M = make_tables(7)
        batch, L, groups = 2, 8, 2
        step = jax_step(M)
        states = [{"counts": jnp.zeros((batch, V), jnp.float32)}
                  for _ in range(groups)]
        seqs, _ = diverse_sample(
            step, states, batch, bos_id=BOS, eos_id=EOS, pad_id=PAD,
            vocab_size=V, group_size=groups, max_len=L, sample_method="greedy",
            diversity_lambda=100.0, block_trigrams=False)
        seqs = np.asarray(seqs)
        assert (seqs[:, 0, 0] != seqs[:, 1, 0]).all()


class TestSampleKnobsE2E:
    def test_sample_n_parallel_samples(self, tmp_path):
        """sample_n > 1 on the sampling path returns [B, n, L] with distinct
        stochastic samples per study (att_model.py:160-165)."""
        from evoke_tpu.core.config import DecodeConfig
        from evoke_tpu.train.steps import make_generate_step
        from tests.test_continuous import _tiny_setup

        model, tok, state, loader, _ = _tiny_setup(tmp_path, n_test=2)
        cfg = DecodeConfig(beam_size=1, sample_method="sample", sample_n=3,
                           temperature=1.3, block_trigrams=0)
        gen = make_generate_step(model, tok, cfg, 16, with_indication=False,
                                 all_samples=True)
        b = next(iter(loader))
        dev = {k: v for k, v in b.items() if not k.startswith("_")}
        seqs = np.asarray(gen(state, dev))
        assert seqs.shape == (dev["ids"].shape[0], 3, 16)
        # stochastic: at least one study's samples differ
        assert any((seqs[i, 0] != seqs[i, 1]).any() for i in range(seqs.shape[0]))
        # default surface returns the first sample
        gen1 = make_generate_step(model, tok, cfg, 16, with_indication=False)
        np.testing.assert_array_equal(np.asarray(gen1(state, dev)), seqs[:, 0])

    def test_diverse_sampling_dispatch(self, tmp_path):
        """group_size > 1 with a sampling method reaches diverse_sample."""
        from evoke_tpu.core.config import DecodeConfig
        from evoke_tpu.train.steps import make_generate_step
        from tests.test_continuous import _tiny_setup

        model, tok, state, loader, _ = _tiny_setup(tmp_path, n_test=2)
        cfg = DecodeConfig(beam_size=1, sample_method="greedy", group_size=2,
                           diversity_lambda=1000.0, block_trigrams=0)
        gen = make_generate_step(model, tok, cfg, 16, with_indication=False,
                                 all_samples=True)
        b = next(iter(loader))
        dev = {k: v for k, v in b.items() if not k.startswith("_")}
        seqs = np.asarray(gen(state, dev))
        assert seqs.shape == (dev["ids"].shape[0], 2, 16)
        assert (seqs[:, 0, 0] != seqs[:, 1, 0]).all()  # lambda forces divergence

    def test_beam_path_sample_n_gate(self, tmp_path):
        """The reference's att_model.py:103 assert becomes a loud ValueError."""
        from evoke_tpu.core.config import DecodeConfig
        from evoke_tpu.train.steps import make_generate_step
        from tests.test_continuous import _tiny_setup

        model, tok, state, loader, _ = _tiny_setup(tmp_path, n_test=2)
        with pytest.raises(ValueError, match="sample_n"):
            make_generate_step(model, tok,
                               DecodeConfig(beam_size=3, sample_n=2), 16)
        # sample_n == beam_size: each beam is a sample (all_samples=True)
        gen = make_generate_step(model, tok,
                                 DecodeConfig(beam_size=2, sample_n=2), 16,
                                 with_indication=False, all_samples=True)
        b = next(iter(loader))
        dev = {k: v for k, v in b.items() if not k.startswith("_")}
        seqs = np.asarray(gen(state, dev))
        assert seqs.shape == (dev["ids"].shape[0], 2, 16)
