"""Decode tests: the jitted lax.scan beam search must reproduce the reference
algorithm's outputs (caption_model.py:26-202 semantics) on a toy history-dependent
step function; the greedy path must match a literal Python port of _sample."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from evoke_tpu.decode.beam import beam_search, greedy_sample, penalty_fn

V = 12
EOS = 2
BOS = 10
PAD = 0


def make_tables(seed=0):
    rng = np.random.default_rng(seed)
    M = rng.normal(size=(V, V)).astype(np.float32)
    M = M - np.log(np.exp(M).sum(-1, keepdims=True))
    return M


def np_logp(M, tok, counts):
    """History-dependent toy model: logits = M[tok] - 0.7 * counts, log-softmaxed."""
    logits = M[tok] - 0.7 * counts
    logits = logits - logits.max(-1, keepdims=True)
    return logits - np.log(np.exp(logits).sum(-1, keepdims=True))


def jax_step(M):
    Mj = jnp.asarray(M)

    def step(tok, pos, state):
        # count the fed token first (BOS fed at pos 0 isn't "generated")
        counts = state["counts"].at[jnp.arange(tok.shape[0]), tok].add(
            jnp.where(pos > 0, 1.0, 0.0))
        logits = Mj[tok] - 0.7 * counts
        logp = jax.nn.log_softmax(logits, axis=-1)
        return logp, {"counts": counts}

    return step


def reference_beam(M, batch, k, L, length_penalty=""):
    """Literal numpy port of the reference beam loop (group_size=1)."""
    pen = penalty_fn(length_penalty)
    outs = []
    for b in range(batch):
        counts = np.zeros((1, V), np.float32)
        logprobs = np_logp(M, np.array([BOS]), counts)  # [1, V]
        beam_seq = np.zeros((1, 0), np.int64)
        beam_logprobs_sum = np.zeros((1,))
        beam_counts = counts
        done = []
        for t in range(L):
            cand = beam_logprobs_sum[:, None] + logprobs  # [nb, V]
            flat = cand.reshape(-1)
            order = np.argsort(-flat, kind="stable")[:k]
            beam_ix = order // V
            tok_ix = order % V
            beam_seq = np.concatenate([beam_seq[beam_ix], tok_ix[:, None]], axis=1)
            beam_logprobs_sum = flat[order]
            beam_counts = beam_counts[beam_ix].copy()
            is_end = tok_ix == EOS
            if t == L - 1:
                is_end[:] = True
            for vix in range(len(tok_ix)):
                if is_end[vix]:
                    done.append({"seq": beam_seq[vix].copy(),
                                 "p": float(pen(np.float64(t + 1),
                                                np.float64(beam_logprobs_sum[vix])))})
            beam_logprobs_sum = beam_logprobs_sum - 1000.0 * is_end
            # feed tokens, update per-beam counts
            for vix in range(len(tok_ix)):
                beam_counts[vix, tok_ix[vix]] += 1.0
            logprobs = np_logp(M, tok_ix, beam_counts)
        done.sort(key=lambda d: -d["p"])
        outs.append(done[0])
    return outs


class TestBeamSearch:
    @pytest.mark.parametrize("penalty", ["", "avg_1"])
    def test_matches_reference_algorithm(self, penalty):
        M = make_tables()
        batch, k, L = 3, 3, 8
        n = batch * k
        step = jax_step(M)
        state0 = {"counts": jnp.zeros((n, V), jnp.float32)}
        res = jax.jit(lambda s0: beam_search(
            step, s0, batch, bos_id=BOS, eos_id=EOS, pad_id=PAD, vocab_size=V,
            beam_size=k, max_len=L, length_penalty=penalty))(state0)
        ref = reference_beam(M, batch, k, L, length_penalty=penalty)
        for b in range(batch):
            got_seq = np.asarray(res.seqs[b, 0])
            want = ref[b]["seq"]
            got_trim = got_seq[: len(want)]
            np.testing.assert_array_equal(got_trim, want,
                                          err_msg=f"b={b} got {got_seq} want {want}")
            np.testing.assert_allclose(float(res.scores[b, 0]), ref[b]["p"], rtol=1e-4)

    def test_pads_after_eos(self):
        M = make_tables(3)
        batch, k, L = 2, 3, 10
        step = jax_step(M)
        state0 = {"counts": jnp.zeros((batch * k, V), jnp.float32)}
        res = beam_search(step, state0, batch, bos_id=BOS, eos_id=EOS, pad_id=PAD,
                          vocab_size=V, beam_size=k, max_len=L)
        seq = np.asarray(res.seqs[:, 0])
        for row in seq:
            if EOS in row:
                after = row[np.argmax(row == EOS) + 1:]
                assert (after == PAD).all()


def reference_greedy(M, batch, L, block_trigrams=True, alpha=2.0):
    """Literal numpy port of att_model._sample greedy + trigram blocking."""
    counts = np.zeros((batch, V), np.float32)
    tok = np.full((batch,), BOS, np.int64)
    seq = np.full((batch, L), PAD, np.int64)
    unfinished = np.ones(batch, bool)
    trigrams = [dict() for _ in range(batch)]
    for t in range(L):
        logp = np_logp(M, tok, counts)
        if block_trigrams and t >= 3:
            for i in range(batch):
                prev_two = (seq[i, t - 3], seq[i, t - 2])
                cur = seq[i, t - 1]
                trigrams[i].setdefault(prev_two, []).append(cur)
            mask = np.zeros((batch, V), np.float32)
            for i in range(batch):
                prev_two = (seq[i, t - 2], seq[i, t - 1])
                for j in trigrams[i].get(prev_two, []):
                    mask[i, j] += 1
            logp = logp + mask * -0.693 * alpha
        nxt = logp.argmax(-1)
        nxt[~unfinished] = PAD
        unfinished = unfinished & (nxt != EOS)
        seq[:, t] = nxt
        for i in range(batch):
            counts[i, nxt[i]] += 1
        tok = nxt
    return seq


class TestGreedy:
    def test_matches_reference_algorithm(self):
        M = make_tables(1)
        batch, L = 4, 12
        step = jax_step(M)
        state0 = {"counts": jnp.zeros((batch, V), jnp.float32)}
        seq, logp = jax.jit(lambda s0: greedy_sample(
            step, s0, batch, bos_id=BOS, eos_id=EOS, pad_id=PAD, vocab_size=V,
            max_len=L, block_trigrams=True))(state0)
        want = reference_greedy(M, batch, L, block_trigrams=True)
        np.testing.assert_array_equal(np.asarray(seq), want)

    def test_no_blocking_differs_when_repetitive(self):
        # a model that mildly prefers one token: the -0.693*alpha*count penalty
        # must eventually beat the preference gap (alpha=2 -> 1.386 per count)
        M = np.full((V, V), -0.5, np.float32)
        M[:, 5] = 0.0
        M[:, EOS] = -5.0  # keep it generating
        M = M - np.log(np.exp(M).sum(-1, keepdims=True))

        def step(tok, pos, state):
            return jnp.asarray(M)[tok], state

        state0 = {"d": jnp.zeros(())}
        seq_b, _ = greedy_sample(step, state0, 1, bos_id=BOS, eos_id=EOS, pad_id=PAD,
                                 vocab_size=V, max_len=10, block_trigrams=True)
        seq_n, _ = greedy_sample(step, state0, 1, bos_id=BOS, eos_id=EOS, pad_id=PAD,
                                 vocab_size=V, max_len=10, block_trigrams=False)
        assert (np.asarray(seq_n)[0] == 5).all()
        assert not (np.asarray(seq_b)[0] == 5).all()

    def test_stochastic_methods_run(self):
        M = make_tables(2)
        batch, L = 2, 6
        step = jax_step(M)
        for method, kw in [("sample", {}), ("top_k", {"top_k": 3}), ("top_p", {"top_p": 0.9})]:
            state0 = {"counts": jnp.zeros((batch, V), jnp.float32)}
            seq, _ = greedy_sample(step, state0, batch, bos_id=BOS, eos_id=EOS, pad_id=PAD,
                                   vocab_size=V, max_len=L, sample_method=method,
                                   block_trigrams=False, rng=jax.random.key(7), **kw)
            assert seq.shape == (batch, L)


def reference_diverse_beam(M, batch, beam, groups, L, diversity_lambda=0.5):
    """Literal numpy port of caption_model.beam_search with group_size > 1."""
    bdash = beam // groups
    outs = []
    for b in range(batch):
        # per-group state
        seqs = [np.zeros((1, 0), np.int64) for _ in range(groups)]
        sums = [np.zeros((1,)) for _ in range(groups)]
        counts = [np.zeros((1, V), np.float32) for _ in range(groups)]
        logprobs = [np_logp(M, np.array([BOS]), counts[g]) for g in range(groups)]
        done = [[] for _ in range(groups)]
        for t in range(L + groups - 1):
            for divm in range(groups):
                if not (divm <= t <= L + divm - 1):
                    continue
                local_time = t - divm
                lg = logprobs[divm].copy()
                # add_diversity from earlier groups' current tables
                change = np.zeros(V, np.float32)
                for prev in range(divm):
                    for tok in seqs[prev][:, local_time]:
                        change[tok] += 1
                lg = lg - change[None, :] * diversity_lambda
                cand = sums[divm][:, None] + lg
                flat = cand.reshape(-1)
                order = np.argsort(-flat, kind="stable")[:bdash]
                beam_ix, tok_ix = order // V, order % V
                seqs[divm] = np.concatenate([seqs[divm][beam_ix], tok_ix[:, None]], 1)
                # the reference keeps the AUGMENTED sums (beam_step asserts
                # beam_logprobs_sum == sorted candidate scores)
                sums[divm] = flat[order]
                counts[divm] = counts[divm][beam_ix].copy()
                is_end = tok_ix == EOS
                if t == L + divm - 1:
                    is_end[:] = True
                for vix in range(len(tok_ix)):
                    if is_end[vix]:
                        done[divm].append({"seq": seqs[divm][vix].copy(),
                                           "p": float(sums[divm][vix])})
                sums[divm] = sums[divm] - 1000.0 * is_end
                for vix in range(len(tok_ix)):
                    counts[divm][vix, tok_ix[vix]] += 1.0
                logprobs[divm] = np_logp(M, tok_ix, counts[divm])
        merged = sorted(sum(done, []), key=lambda d: -d["p"])
        outs.append(merged[0])
    return outs


class TestDiverseBeam:
    def test_matches_reference_two_groups(self):
        from evoke_tpu.decode.beam import diverse_beam_search

        M = make_tables(5)
        batch, beam, groups, L = 2, 4, 2, 7
        bdash = beam // groups
        step = jax_step(M)
        states = [{"counts": jnp.zeros((batch * bdash, V), jnp.float32)}
                  for _ in range(groups)]
        res = jax.jit(lambda ss: diverse_beam_search(
            step, ss, batch, bos_id=BOS, eos_id=EOS, pad_id=PAD, vocab_size=V,
            beam_size=beam, group_size=groups, max_len=L))(states)
        ref = reference_diverse_beam(M, batch, beam, groups, L)
        for b in range(batch):
            got = np.asarray(res.seqs[b, 0])
            want = ref[b]["seq"]
            np.testing.assert_array_equal(got[: len(want)], want,
                                          err_msg=f"b={b} got {got} want {want}")

    def test_groups_diverge(self):
        """With a strong diversity penalty, groups pick different tokens."""
        from evoke_tpu.decode.beam import diverse_beam_search

        M = np.full((V, V), -1.0, np.float32)
        M[:, 5] = 0.0
        M[:, 6] = -0.1
        M[:, EOS] = -8.0
        M = M - np.log(np.exp(M).sum(-1, keepdims=True))

        def step(tok, pos, state):
            return jnp.asarray(M)[tok], state

        states = [{"d": jnp.zeros(())} for _ in range(2)]
        res = diverse_beam_search(step, states, 1, bos_id=BOS, eos_id=EOS, pad_id=PAD,
                                  vocab_size=V, beam_size=2, group_size=2, max_len=4,
                                  diversity_lambda=5.0)
        toks = set(np.asarray(res.seqs[0, :, 0]).tolist())
        assert {5, 6} <= toks  # the second group was pushed off token 5


class TestEarlyStop:
    def test_early_stop_matches_full_scan(self):
        """A model that strongly favors EOS after a few tokens: while-loop early
        exit must produce the same output as the full-length scan."""
        M = make_tables(9)
        M[:, EOS] += 3.0  # EOS becomes likely quickly
        M = M - np.log(np.exp(M).sum(-1, keepdims=True))
        batch, k, L = 3, 3, 12
        step = jax_step(M)
        s0 = {"counts": jnp.zeros((batch * k, V), jnp.float32)}
        kw = dict(bos_id=BOS, eos_id=EOS, pad_id=PAD, vocab_size=V,
                  beam_size=k, max_len=L)
        fast = beam_search(step, s0, batch, early_stop=True, **kw)
        slow = beam_search(step, s0, batch, early_stop=False, **kw)
        np.testing.assert_array_equal(np.asarray(fast.seqs), np.asarray(slow.seqs))
        np.testing.assert_allclose(np.asarray(fast.scores), np.asarray(slow.scores),
                                   rtol=1e-5)

    def test_greedy_early_exit_matches_reference(self):
        M = make_tables(9)
        M[:, EOS] += 3.0
        M = M - np.log(np.exp(M).sum(-1, keepdims=True))
        batch, L = 4, 12
        step = jax_step(M)
        s0 = {"counts": jnp.zeros((batch, V), jnp.float32)}
        seq, _ = greedy_sample(step, s0, batch, bos_id=BOS, eos_id=EOS, pad_id=PAD,
                               vocab_size=V, max_len=L, block_trigrams=True)
        want = reference_greedy(M, batch, L, block_trigrams=True)
        np.testing.assert_array_equal(np.asarray(seq), want)


def kv_toy_step(seed=0, d=8, lmax=12):
    """A toy CAUSAL-ATTENTION step with real [N, L, D] KV caches, for testing
    cache layouts (beam reorder + mid-decode cache growth)."""
    rng = np.random.default_rng(seed)
    emb = jnp.asarray(rng.normal(size=(V, d)).astype(np.float32))
    proj = jnp.asarray(rng.normal(size=(d, V)).astype(np.float32))

    def step(tok, pos, state):
        x = emb[tok]                                           # [N, d]
        ck = jax.lax.dynamic_update_slice(state["cache_k"][0], x[:, None, :], (0, pos, 0))
        cv = jax.lax.dynamic_update_slice(state["cache_v"][0], x[:, None, :] * 0.5,
                                          (0, pos, 0))
        l = ck.shape[1]
        mask = (jnp.arange(l) <= pos)[None, :]
        scores = jnp.einsum("nd,nld->nl", x, ck) / np.sqrt(d)
        scores = jnp.where(mask, scores, -1e9)
        attn = jax.nn.softmax(scores, axis=-1)
        out = jnp.einsum("nl,nld->nd", attn, cv)
        logp = jax.nn.log_softmax(out @ proj, axis=-1)
        return logp, {"cache_k": (ck,), "cache_v": (cv,)}

    return step


def kv_state(n, lmax, d=8):
    return {"cache_k": (jnp.zeros((n, lmax, d), jnp.float32),),
            "cache_v": (jnp.zeros((n, lmax, d), jnp.float32),)}


class TestCacheSchedule:
    """Phased cache growth (grow_caches) must be output-identical to a single
    full-length cache, for beam search and the sampling path."""

    @pytest.mark.parametrize("schedule", [(6, 12), (4, 8, 12), (3, 5, 9, 12)])
    def test_beam_schedule_matches_single_phase(self, schedule):
        batch, k, L = 3, 3, 12
        step = kv_toy_step()
        base = beam_search(step, kv_state(batch * k, L), batch, bos_id=BOS, eos_id=EOS,
                           pad_id=PAD, vocab_size=V, beam_size=k, max_len=L)
        phased = beam_search(step, kv_state(batch * k, schedule[0]), batch, bos_id=BOS,
                             eos_id=EOS, pad_id=PAD, vocab_size=V, beam_size=k,
                             max_len=L, cache_schedule=schedule)
        np.testing.assert_array_equal(np.asarray(base.seqs), np.asarray(phased.seqs))
        np.testing.assert_allclose(np.asarray(base.scores), np.asarray(phased.scores),
                                   rtol=1e-6)

    def test_beam_schedule_matches_under_scan_path(self):
        batch, k, L = 2, 3, 12
        step = kv_toy_step(4)
        base = beam_search(step, kv_state(batch * k, L), batch, bos_id=BOS, eos_id=EOS,
                           pad_id=PAD, vocab_size=V, beam_size=k, max_len=L,
                           early_stop=False)
        phased = beam_search(step, kv_state(batch * k, 6), batch, bos_id=BOS,
                             eos_id=EOS, pad_id=PAD, vocab_size=V, beam_size=k,
                             max_len=L, early_stop=False, cache_schedule=(6, 12))
        np.testing.assert_array_equal(np.asarray(base.seqs), np.asarray(phased.seqs))

    def test_greedy_schedule_matches_single_phase(self):
        batch, L = 4, 12
        step = kv_toy_step(7)
        kw = dict(bos_id=BOS, eos_id=EOS, pad_id=PAD, vocab_size=V, max_len=L,
                  block_trigrams=True)
        base, base_lp = greedy_sample(step, kv_state(batch, L), batch, **kw)
        phased, ph_lp = greedy_sample(step, kv_state(batch, 6), batch,
                                      cache_schedule=(6, 12), **kw)
        np.testing.assert_array_equal(np.asarray(base), np.asarray(phased))
        np.testing.assert_allclose(np.asarray(base_lp), np.asarray(ph_lp), rtol=1e-6)

    def test_bad_schedule_rejected(self):
        step = kv_toy_step()
        with pytest.raises(AssertionError):
            beam_search(step, kv_state(3, 5), 1, bos_id=BOS, eos_id=EOS, pad_id=PAD,
                        vocab_size=V, beam_size=3, max_len=12, cache_schedule=(5, 10))

    def test_greedy_bad_schedule_rejected(self):
        """greedy_sample applies the same strict-ascent validation as beam_search
        (ADVICE r2: a (8, 6, 12) schedule silently skipped segments before)."""
        step = kv_toy_step()
        for bad in [(8, 6, 12), (6, 6, 12), (6, 10)]:
            with pytest.raises(AssertionError):
                greedy_sample(step, kv_state(2, bad[0]), 2, bos_id=BOS, eos_id=EOS,
                              pad_id=PAD, vocab_size=V, max_len=12,
                              cache_schedule=bad)

    def test_raw_logits_two_stage_topk_matches_logp_path(self):
        """raw_logits=True (per-beam top-k on unnormalized logits + exact f32
        scoring of the k*k winners) must be output-identical to the log-prob
        path — tokens AND length-penalized scores."""
        rng = np.random.default_rng(3)
        d = 8
        emb = jnp.asarray(rng.normal(size=(V, d)).astype(np.float32))
        proj = jnp.asarray(rng.normal(size=(d, V)).astype(np.float32))

        def mk_step(raw):
            def step(tok, pos, state):
                x = emb[tok]
                ck = jax.lax.dynamic_update_slice(state["cache_k"][0],
                                                  x[:, None, :], (0, pos, 0))
                cv = jax.lax.dynamic_update_slice(state["cache_v"][0],
                                                  x[:, None, :] * 0.5, (0, pos, 0))
                l = ck.shape[1]
                mask = (jnp.arange(l) <= pos)[None, :]
                scores = jnp.einsum("nd,nld->nl", x, ck) / np.sqrt(d)
                attn = jax.nn.softmax(jnp.where(mask, scores, -1e9), axis=-1)
                logits = jnp.einsum("nl,nld->nd", attn, cv) @ proj
                out = logits if raw else jax.nn.log_softmax(logits, axis=-1)
                return out, {"cache_k": (ck,), "cache_v": (cv,)}
            return step

        batch, k, L = 3, 3, 12
        kw = dict(bos_id=BOS, eos_id=EOS, pad_id=PAD, vocab_size=V, beam_size=k,
                  max_len=L, suppress_ids=(4,), length_penalty="wu_0.5")
        base = beam_search(mk_step(False), kv_state(batch * k, L), batch, **kw)
        two = beam_search(mk_step(True), kv_state(batch * k, L), batch,
                          raw_logits=True, **kw)
        np.testing.assert_array_equal(np.asarray(base.seqs), np.asarray(two.seqs))
        np.testing.assert_allclose(np.asarray(base.scores), np.asarray(two.scores),
                                   rtol=1e-5)
        # and through a phased cache schedule
        two_ph = beam_search(mk_step(True), kv_state(batch * k, 6), batch,
                             raw_logits=True, cache_schedule=(6, 12), **kw)
        np.testing.assert_array_equal(np.asarray(base.seqs), np.asarray(two_ph.seqs))

    def test_grow_caches_rejects_non_conforming_state(self):
        """A multi-phase schedule with a decode state lacking cache_k/cache_v
        must fail loudly instead of silently clamping writes (ADVICE r2)."""
        from evoke_tpu.decode.beam import grow_caches

        with pytest.raises(TypeError):
            grow_caches((jnp.zeros((2, 4, 8)),), 8)       # not a dict
        with pytest.raises(TypeError):
            grow_caches({"mem": jnp.zeros((2, 4, 8))}, 8)  # wrong keys
        # conforming state grows to exactly the target length
        grown = grow_caches(kv_state(2, 4), 9)
        assert grown["cache_k"][0].shape[1] == 9
        assert grown["cache_v"][0].shape[1] == 9


class TestIterativeTopK:
    """decode.beam.topk with EVOKE_TOPK=iter: k argmax passes, tie-order
    identical to lax.top_k.

    Measured NOT a serving win (the sort custom call stays the default; see
    the topk docstring), but the iter path remains selectable and must stay
    exact: same values AND indices as lax.top_k, including ties (argmax
    returns the first maximum; lax.top_k's sort is stable)."""

    @pytest.fixture(autouse=True)
    def _iter_mode(self, monkeypatch):
        monkeypatch.setenv("EVOKE_TOPK", "iter")

    @pytest.mark.parametrize("shape,k", [((7, 301), 3), ((4, 9), 3), ((4, 6), 3),
                                         ((2, 50), 1), ((3, 17), 8)])
    def test_matches_lax_top_k(self, shape, k):
        from evoke_tpu.decode.beam import topk

        x = jnp.asarray(np.random.default_rng(0).normal(size=shape), jnp.float32)
        v1, i1 = jax.lax.top_k(x, k)
        v2, i2 = topk(x, k)
        np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))
        np.testing.assert_array_equal(np.asarray(v1), np.asarray(v2))

    def test_ties_resolve_identically(self):
        from evoke_tpu.decode.beam import topk

        # bf16 quantization makes dense exact ties; also hand-built all-equal rows
        rng = np.random.default_rng(1)
        x = jnp.asarray(rng.normal(size=(16, 1000)), jnp.float32).astype(jnp.bfloat16)
        x = jnp.concatenate([x, jnp.zeros((16, 1000), jnp.bfloat16)], axis=0)
        v1, i1 = jax.lax.top_k(x, 3)
        v2, i2 = topk(x, 3)
        np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))

    def test_large_k_falls_back_to_sort(self):
        from evoke_tpu.decode.beam import topk

        x = jnp.asarray(np.random.default_rng(2).normal(size=(3, 40)), jnp.float32)
        v, i = topk(x, 11)
        v1, i1 = jax.lax.top_k(x, 11)
        np.testing.assert_array_equal(np.asarray(i), np.asarray(i1))


class TestSamplingCutoffs:
    """top-k / nucleus sampling: the config-level cutoffs (DecodeConfig.top_k/
    top_p and the reference's string-encoded "topN" forms,
    caption_model.py:381-394) must actually constrain the sampled tokens."""

    def _uniformish_step(self, batch, favored=(5, 6, 7)):
        # logits strongly favor `favored`; any token outside them in the
        # output proves the cutoff was not applied
        logp = np.full((V,), -12.0, np.float32)
        for tkn in favored:
            logp[tkn] = -0.1
        logp[EOS] = -30.0
        logp = logp - np.log(np.exp(logp).sum())
        row = jnp.asarray(logp)

        def step(tok, pos, state):
            return jnp.broadcast_to(row, (batch, V)), state
        return step

    def test_top_k_restricts_support(self):
        from evoke_tpu.decode.beam import greedy_sample

        batch, L = 8, 10
        seq, _ = greedy_sample(self._uniformish_step(batch), {}, batch,
                               bos_id=BOS, eos_id=EOS, pad_id=PAD, vocab_size=V,
                               max_len=L, sample_method="top_k", top_k=3,
                               block_trigrams=False)
        toks = set(np.asarray(seq).ravel().tolist()) - {PAD}
        assert toks <= {5, 6, 7}, toks

    def test_top_p_restricts_support(self):
        from evoke_tpu.decode.beam import greedy_sample

        batch, L = 8, 10
        seq, _ = greedy_sample(self._uniformish_step(batch), {}, batch,
                               bos_id=BOS, eos_id=EOS, pad_id=PAD, vocab_size=V,
                               max_len=L, sample_method="top_p", top_p=0.9,
                               block_trigrams=False)
        toks = set(np.asarray(seq).ravel().tolist()) - {PAD}
        assert toks <= {5, 6, 7}, toks

    def test_unset_cutoffs_fail_loudly(self):
        from evoke_tpu.decode.beam import greedy_sample

        with pytest.raises(AssertionError):
            greedy_sample(self._uniformish_step(2), {}, 2, bos_id=BOS, eos_id=EOS,
                          pad_id=PAD, vocab_size=V, max_len=4,
                          sample_method="top_k")
        with pytest.raises(AssertionError):
            greedy_sample(self._uniformish_step(2), {}, 2, bos_id=BOS, eos_id=EOS,
                          pad_id=PAD, vocab_size=V, max_len=4,
                          sample_method="top_p")

    def test_reference_topn_strings_parse(self):
        """make_generate_step accepts the reference's "top5"/"top0.9" method
        strings and routes them to top-k / nucleus sampling."""
        from evoke_tpu.core.config import DecodeConfig
        from evoke_tpu.models.rm_decoder import RMDecoder
        from evoke_tpu.train.steps import TrainState
        import evoke_tpu.train.steps as steps_mod

        captured = {}
        orig = steps_mod.greedy_sample

        def spy(*args, **kw):
            captured.update({k: kw.get(k) for k in ("sample_method", "top_k", "top_p")})
            return orig(*args, **kw)

        class Tok:
            bos_id, eos_id, pad_id, unk_id = V - 2, V - 1, 0, 4

            def get_vocab_size(self):
                return V - 1

        import flax.linen as nn

        class TinyWrap(nn.Module):
            dec: RMDecoder

            def encode_for_decode(self, feats, pids, valid, b):
                enc = self.dec.encode(feats, jnp.ones(feats.shape[:2], jnp.int32))
                return enc, jnp.ones(feats.shape[:2], jnp.int32)

            def init_decode_state(self, enc, batch, max_len, *extra):
                return self.dec.init_decode_state(enc, batch, max_len, *extra)

            def decode_step(self, tok, pos, state, att_mask, return_logits=False):
                return self.dec.decode_step(tok, pos, state, att_mask,
                                            return_logits=return_logits)

            def __call__(self, feats, pids, valid, b):  # init surface
                # full training forward so ALL decoder params exist post-init
                ids = jnp.ones((feats.shape[0], 8), jnp.int32)
                return self.dec(feats, jnp.ones(feats.shape[:2], jnp.int32),
                                ids, jnp.ones_like(ids))

        model = TinyWrap(RMDecoder(vocab_size=V - 1, d_model=16, d_ff=16,
                                   d_vf=8, num_layers=1, num_heads=2,
                                   rm_d_model=16, max_seq_len=8))
        feats = jnp.ones((2, 3, 8), jnp.float32)
        variables = model.init(jax.random.key(0), feats, None, None, 2)

        for method, want in (("top5", {"sample_method": "top_k", "top_k": 5}),
                             ("top0.9", {"sample_method": "top_p", "top_p": 0.9}),
                             ("gumbel", {"sample_method": "sample"})):
            captured.clear()
            steps_mod.greedy_sample = spy
            try:
                gen = steps_mod.make_generate_step(
                    model, Tok(), DecodeConfig(sample_method=method, beam_size=1), 8)
                batch = {"images": feats, "ids": jnp.ones((2, 8), jnp.int32),
                         "mask": jnp.ones((2, 8), jnp.int32),
                         "pids": jnp.arange(2, dtype=jnp.int32),
                         "valid": jnp.ones(2, bool)}
                state = TrainState(step=0, params=variables["params"],
                                   batch_stats=variables.get("batch_stats", {}),
                                   opt_state=None)
                gen(state, batch)
            finally:
                steps_mod.greedy_sample = orig
            for k, v in want.items():
                assert captured[k] == v, (method, captured)
