"""Fused logit+top-k+logsumexp Pallas kernel (ops/fused_logit_topk.py).

Exactness strategy: the kernel must be a drop-in for the serving beam's
three-op XLA vocab tail (logit Dense -> logsumexp -> suppression -> stage-1
lax.top_k). The kernel tests replay that exact recipe on random data —
including bf16 rounding (which produces real ties) and lax.top_k's
lowest-index tie rule — and the e2e tests assert token-identical reports
through make_generate_step and ContinuousServer with the kernel forced on
(interpret mode on CPU) vs off.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from evoke_tpu.ops.fused_logit_topk import fused_logit_topk, use_fused_logit_topk

KEY = jax.random.key(0)


from functools import partial


@partial(jax.jit, static_argnames=("k", "suppress_ids"))
def xla_recipe(h, w, b, k, suppress_ids=()):
    """The unfused serving tail, verbatim (decode/beam.py raw_logits stage 1
    over rm_decoder's nn.Dense(dtype) logit head).

    JITTED on purpose: XLA CPU folds the f32->bf16 convert into the following
    add when compiled (measured: up to one bf16 ulp vs the eager op-by-op
    chain), and pallas interpret mode executes the kernel under the same
    compiled semantics — the oracle must go through the same folding. On a
    real TPU both the MXU output conversion and the kernel's explicit astype
    round RNE at the same boundary, verified by the on-chip token-parity A/B
    (DESIGN)."""
    acc = jax.lax.dot_general(h, w, (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)
    logits = acc.astype(h.dtype) + b
    lse = jax.scipy.special.logsumexp(logits.astype(jnp.float32), axis=-1)
    for sid in suppress_ids:
        logits = logits.at[:, sid].add(-1000.0)
    vals, idx = jax.lax.top_k(logits, k)
    return vals.astype(jnp.float32), idx, lse


class TestFusedKernel:
    @pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
    @pytest.mark.parametrize("vocab,tile", [(1003, 128), (257, 2048), (130, 128)])
    def test_matches_xla_recipe(self, dtype, vocab, tile):
        """Multi-tile merge, partial last tile, and single-partial-tile
        configs; bf16 rounding yields genuine value ties across the vocab, so
        exact index equality exercises the lowest-index tie rule."""
        n, d, k = 10, 32, 3
        k1, k2, k3 = jax.random.split(KEY, 3)
        h = jax.random.normal(k1, (n, d), jnp.float32).astype(dtype)
        w = jax.random.normal(k2, (d, vocab), jnp.float32).astype(dtype)
        b = (jax.random.normal(k3, (vocab,), jnp.float32) * 0.1).astype(dtype)
        want_v, want_i, want_lse = xla_recipe(h, w, b, k)
        got_v, got_i, got_lse = fused_logit_topk(h, w, b, k, tile=tile,
                                                 interpret=True)
        np.testing.assert_array_equal(np.asarray(got_i), np.asarray(want_i))
        np.testing.assert_array_equal(np.asarray(got_v), np.asarray(want_v))
        np.testing.assert_allclose(np.asarray(got_lse), np.asarray(want_lse),
                                   rtol=2e-6)

    def test_suppression_is_dtype_exact(self):
        """Suppressed columns get exactly bf16(logit + (-1000)) — the same
        arithmetic as logits.at[:, sid].add(-1000.0) — and the lse ignores
        suppression (the beam contract)."""
        n, d, vocab, k = 6, 32, 300, 3
        k1, k2 = jax.random.split(KEY)
        h = jax.random.normal(k1, (n, d), jnp.float32).astype(jnp.bfloat16)
        # push some suppressed columns to the top so suppression must bind
        w = jax.random.normal(k2, (d, vocab), jnp.float32).at[:, 7].mul(10.0)
        w = w.astype(jnp.bfloat16)
        b = jnp.zeros((vocab,), jnp.bfloat16)
        sup = (7, 0)
        want_v, want_i, want_lse = xla_recipe(h, w, b, k, sup)
        got_v, got_i, got_lse = fused_logit_topk(h, w, b, k, suppress_ids=sup,
                                                 tile=128, interpret=True)
        np.testing.assert_array_equal(np.asarray(got_i), np.asarray(want_i))
        assert not (np.asarray(got_i) == 7).any()
        np.testing.assert_array_equal(np.asarray(got_v), np.asarray(want_v))
        np.testing.assert_allclose(np.asarray(got_lse), np.asarray(want_lse),
                                   rtol=2e-6)

    def test_exact_ties_resolve_to_lowest_index(self):
        """Hand-built exact duplicates spanning tile boundaries: columns 5,
        150 and 260 are bit-identical (tile=128 puts them in three different
        tiles), so the carry-vs-tile merge must prefer the lower index."""
        n, d, vocab, k = 4, 16, 300, 3
        h = jnp.ones((n, d), jnp.float32)
        w = jax.random.normal(KEY, (d, vocab), jnp.float32) * 0.01
        w = w.at[:, 150].set(w[:, 5]).at[:, 260].set(w[:, 5])
        w = w.at[:, 5].add(0.0)  # columns 5 == 150 == 260 exactly
        b = jnp.zeros((vocab,), jnp.float32).at[5].set(5.0).at[150].set(5.0) \
            .at[260].set(5.0)
        want_v, want_i, want_lse = xla_recipe(h, w, b, k)
        got_v, got_i, got_lse = fused_logit_topk(h, w, b, k, tile=128,
                                                 interpret=True)
        np.testing.assert_array_equal(np.asarray(got_i), np.asarray(want_i))
        assert list(np.asarray(got_i)[0]) == [5, 150, 260]
        np.testing.assert_array_equal(np.asarray(got_v), np.asarray(want_v))

    def test_policy(self, monkeypatch):
        class M:
            decoder_kind = "r2gen"
            d_model = 512

        assert not use_fused_logit_topk(M(), serving=True, logits_hook=lambda: 0)
        assert not use_fused_logit_topk(M(), serving=True, decoding_constraint=True)
        monkeypatch.setenv("EVOKE_LOGIT_TOPK", "xla")
        assert not use_fused_logit_topk(M(), serving=True)
        monkeypatch.setenv("EVOKE_LOGIT_TOPK", "fused")
        assert use_fused_logit_topk(M(), serving=True)
        monkeypatch.setenv("EVOKE_LOGIT_TOPK", "bogus")
        with pytest.raises(ValueError):
            use_fused_logit_topk(M(), serving=True)
        monkeypatch.delenv("EVOKE_LOGIT_TOPK")
        # auto on CPU: off (serving kernel is TPU-only)
        assert not use_fused_logit_topk(M(), serving=True) or \
            jax.default_backend() == "tpu"

        class M2:
            decoder_kind = "cmn"
            d_model = 512

        monkeypatch.setenv("EVOKE_LOGIT_TOPK", "fused")
        assert not use_fused_logit_topk(M2(), serving=True)


def _tiny_setup(tmp_path, n_test=5):
    from tests.test_continuous import _tiny_setup as setup

    return setup(tmp_path, n_test=n_test)


class TestFusedBeamE2E:
    def test_generate_step_token_parity(self, tmp_path, monkeypatch):
        """make_generate_step with the fused vocab tail forced on (interpret
        mode on CPU) serves token-identical reports to the unfused path,
        including UNK suppression."""
        from evoke_tpu.core.config import DecodeConfig
        from evoke_tpu.train.steps import make_generate_step

        model, tok, state, loader, _ = _tiny_setup(tmp_path)
        cfg = DecodeConfig(beam_size=2, suppress_unk=True)
        batches = [{k: v for k, v in b.items() if not k.startswith("_")}
                   for b in loader]

        monkeypatch.setenv("EVOKE_LOGIT_TOPK", "xla")
        gen = make_generate_step(model, tok, cfg, 16, with_indication=False,
                                 serving=True)
        golden = [np.asarray(gen(state, b)) for b in batches]

        monkeypatch.setenv("EVOKE_LOGIT_TOPK", "fused")
        gen_f = make_generate_step(model, tok, cfg, 16, with_indication=False,
                                   serving=True)
        for want, b in zip(golden, batches):
            np.testing.assert_array_equal(np.asarray(gen_f(state, b)), want)

    def test_continuous_server_parity(self, tmp_path, monkeypatch):
        """ContinuousServer with the fused tail == unfused records."""
        from evoke_tpu.decode.continuous import ContinuousServer

        model, tok, state, loader, examples = _tiny_setup(tmp_path)
        monkeypatch.setenv("EVOKE_LOGIT_TOPK", "xla")
        base = ContinuousServer(model, tok, state, max_seq_len=16, slots=2,
                                beam_size=2, seg_steps=4, suppress_unk=True)
        golden = {r["id"]: r["report"] for r in base.serve(loader)[0]}
        assert len(golden) == len(examples)

        monkeypatch.setenv("EVOKE_LOGIT_TOPK", "fused")
        fused = ContinuousServer(model, tok, state, max_seq_len=16, slots=2,
                                 beam_size=2, seg_steps=4, suppress_unk=True)
        recs, _ = fused.serve(loader)
        assert {r["id"]: r["report"] for r in recs} == golden


class TestChainSplit:
    def test_split_chains_token_parity(self, tmp_path, monkeypatch):
        """EVOKE_SPLIT_CHAINS=2 (two independent half-batch model chains per
        loop body, DESIGN 5n) is output-exact vs the single-chain step, on
        both the fused and unfused vocab tails."""
        from evoke_tpu.core.config import DecodeConfig
        from evoke_tpu.train.steps import make_generate_step
        from tests.test_continuous import _tiny_setup

        model, tok, state, loader, _ = _tiny_setup(tmp_path)
        cfg = DecodeConfig(beam_size=2)
        b = next(iter(loader))
        dev = {k: v for k, v in b.items() if not k.startswith("_")}
        for mode in ("xla", "fused"):
            monkeypatch.setenv("EVOKE_LOGIT_TOPK", mode)
            monkeypatch.delenv("EVOKE_SPLIT_CHAINS", raising=False)
            gen1 = make_generate_step(model, tok, cfg, 16, with_indication=False,
                                      serving=True)
            want = np.asarray(gen1(state, dev))
            monkeypatch.setenv("EVOKE_SPLIT_CHAINS", "2")
            gen2 = make_generate_step(model, tok, cfg, 16, with_indication=False,
                                      serving=True)
            np.testing.assert_array_equal(np.asarray(gen2(state, dev)), want,
                                          err_msg=mode)
