"""Pallas beam-lineage attention kernel (ops/lineage_attention.py).

The kernel is the TPU serving formulation of ancestor-mode decode attention
(layers.cached_self_attention's ``anc`` branch): one HBM pass over each
sample's un-permuted cache block instead of the reorder mode's three. These
tests pin it, in interpret mode on CPU, to the XLA masked-attention
formulation it replaces (which is itself pinned to reorder mode and, through
tests/test_reference_parity.py, to the reference implementation's own beam).
"""

import math
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from evoke_tpu.ops.lineage_attention import lineage_attention

KEY = jax.random.key(0)


@pytest.fixture
def rng():
    return np.random.default_rng(0)


def _xla_reference(q, ck, cv, anc, pos, num_heads):
    """The layers.cached_self_attention ancestor formulation, inlined."""
    b, kbeam, lmax = anc.shape
    n, d = q.shape
    dh = d // num_heads
    kf = ck.reshape(b, kbeam * lmax, d)
    vf = cv.reshape(b, kbeam * lmax, d)
    t = jnp.arange(lmax)
    hist = jax.nn.one_hot(anc, kbeam, dtype=bool) & (t < pos)[None, None, :, None]
    self_now = jnp.eye(kbeam, dtype=bool)[:, None, :] & (t == pos)[None, :, None]
    mask = (hist | self_now[None]).transpose(0, 1, 3, 2).reshape(
        b, 1, kbeam, kbeam * lmax)
    qh = q.reshape(b, kbeam, num_heads, dh).transpose(0, 2, 1, 3)
    kh = kf.reshape(b, kbeam * lmax, num_heads, dh).transpose(0, 2, 1, 3)
    vh = vf.reshape(b, kbeam * lmax, num_heads, dh).transpose(0, 2, 1, 3)
    s = jnp.einsum("bhqd,bhkd->bhqk", qh, kh) / math.sqrt(dh)
    s = jnp.where(mask, s, -1e9)
    p = jax.nn.softmax(s, axis=-1)
    out = jnp.einsum("bhqk,bhkd->bhqd", p, vh)
    return out.transpose(0, 2, 1, 3).reshape(n, d)


class TestLineageKernel:
    @pytest.mark.parametrize("pos", [0, 3, 11])
    def test_matches_xla_formulation(self, rng, pos):
        b, kbeam, lmax, d, heads = 4, 3, 12, 64, 8
        n = b * kbeam
        q = jnp.asarray(rng.normal(size=(n, d)), jnp.float32)
        ck = jnp.asarray(rng.normal(size=(n, lmax, d)), jnp.float32)
        cv = jnp.asarray(rng.normal(size=(n, lmax, d)), jnp.float32)
        anc = jnp.asarray(rng.integers(0, kbeam, size=(b, kbeam, lmax)), jnp.int32)
        out = lineage_attention(q, ck, cv, anc, pos, heads, interpret=True)
        ref = _xla_reference(q, ck, cv, anc, pos, heads)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-5, atol=1e-5)

    @pytest.mark.parametrize("pos", [0, 5, 11])
    def test_fused_heads_body_is_exact(self, rng, monkeypatch, pos):
        """The fused-heads kernel body (one block-diagonal dot pair for all
        heads) matches the per-head loop to f32 ULP level: the zeroed query
        lanes contribute exact zeros, but they shift the real terms across
        blocked-reduction accumulator lanes, so partial-sum rounding can
        differ by ~1e-7 (not bitwise on every backend)."""
        b, kbeam, lmax, d, heads = 4, 3, 12, 64, 8
        n = b * kbeam
        q = jnp.asarray(rng.normal(size=(n, d)), jnp.float32)
        ck = jnp.asarray(rng.normal(size=(n, lmax, d)), jnp.float32)
        cv = jnp.asarray(rng.normal(size=(n, lmax, d)), jnp.float32)
        anc = jnp.asarray(rng.integers(0, kbeam, size=(b, kbeam, lmax)), jnp.int32)
        # lineage_attention is an un-jitted dispatcher (ops/sharding.py): each
        # eager call re-executes Python and re-reads EVOKE_LINEAGE_HEADS, so
        # no jit cache needs clearing between variants
        monkeypatch.setenv("EVOKE_LINEAGE_HEADS", "loop")
        out_loop = np.asarray(lineage_attention(q, ck, cv, anc, pos, heads,
                                                interpret=True))
        monkeypatch.setenv("EVOKE_LINEAGE_HEADS", "fused")
        out_fused = np.asarray(lineage_attention(q, ck, cv, anc, pos, heads,
                                                 interpret=True))
        np.testing.assert_allclose(out_loop, out_fused, rtol=1e-5, atol=1e-6)

    def test_lineage_isolation(self, rng):
        """A query must see ONLY its own lineage: perturbing cache slots that
        belong to no lineage of beam 0 leaves beam 0's output unchanged."""
        b, kbeam, lmax, d, heads = 2, 3, 8, 32, 4
        n = b * kbeam
        pos = 5
        q = jnp.asarray(rng.normal(size=(n, d)), jnp.float32)
        ck = jnp.asarray(rng.normal(size=(n, lmax, d)), jnp.float32)
        cv = jnp.asarray(rng.normal(size=(n, lmax, d)), jnp.float32)
        # beam 0's lineage is physical row 1 everywhere; rows 0/2 are foreign
        anc = jnp.ones((b, kbeam, lmax), jnp.int32)
        anc = anc.at[:, 1:, :].set(2)
        out = lineage_attention(q, ck, cv, anc, pos, heads, interpret=True)
        ck2 = ck.at[0, :pos].add(100.0)   # sample 0, physical row 0 history
        cv2 = cv.at[0, :pos].add(100.0)
        out2 = lineage_attention(q, ck2, cv2, anc, pos, heads, interpret=True)
        np.testing.assert_allclose(np.asarray(out[0]), np.asarray(out2[0]),
                                   rtol=1e-6, atol=1e-6)
        # slots beyond pos are invisible to everyone
        ck3 = ck.at[:, pos + 1:].add(100.0)
        cv3 = cv.at[:, pos + 1:].add(100.0)
        out3 = lineage_attention(q, ck3, cv3, anc, pos, heads, interpret=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(out3),
                                   rtol=1e-6, atol=1e-6)

    def test_beam_search_parity_through_kernel(self, rng, monkeypatch):
        """Full beam search in ancestor mode with the Pallas kernel FORCED
        (interpret mode on CPU) must reproduce reorder-mode tokens and scores,
        including through a phased cache schedule."""
        monkeypatch.setenv("EVOKE_LINEAGE_KERNEL", "pallas")
        from evoke_tpu.decode.beam import beam_search
        from evoke_tpu.models.rm_decoder import RMDecoder

        vocab, b, t, p, beam = 30, 2, 7, 4, 3
        dec = RMDecoder(vocab_size=vocab, d_model=16, d_ff=32, d_vf=24,
                        num_layers=2, num_heads=2, rm_num_slots=3, rm_d_model=16,
                        max_seq_len=t, drop_prob_lm=0.0)
        att = jnp.asarray(rng.normal(size=(b, p, 24)), jnp.float32)
        att_mask = jnp.ones((b, p), jnp.int32)
        ids = jnp.asarray(rng.integers(1, vocab, size=(b, t)), jnp.int32)
        variables = dec.init(KEY, att, att_mask, ids, jnp.ones((b, t), jnp.int32))
        enc = dec.apply(variables, att, att_mask, method=dec.encode)

        def mk_state(lmax):
            return dec.apply(variables, enc, b * beam, lmax,
                             method=dec.init_decode_state)

        def step(tok, pos, dstate):
            return dec.apply(variables, tok, pos, dstate, att_mask,
                             method=dec.decode_step)

        kw = dict(bos_id=29, eos_id=30, pad_id=0, vocab_size=31, beam_size=beam,
                  max_len=t, cache_schedule=(3, 5, 7))
        monkeypatch.setenv("EVOKE_LINEAGE_KERNEL", "xla")
        base = beam_search(step, mk_state(3), b, ancestor_kv=True, **kw)
        monkeypatch.setenv("EVOKE_LINEAGE_KERNEL", "pallas")
        kern = beam_search(step, mk_state(3), b, ancestor_kv=True, **kw)
        np.testing.assert_array_equal(np.asarray(base.seqs), np.asarray(kern.seqs))
        np.testing.assert_allclose(np.asarray(base.scores), np.asarray(kern.scores),
                                   rtol=1e-5, atol=1e-6)

    def test_diverse_beam_ancestor_matches_reorder(self, rng, monkeypatch):
        """Diverse beam search (groups of bdash=2 beams) in ancestor mode,
        through both the XLA formulation and the forced Pallas kernel, must
        reproduce reorder-mode tokens."""
        from evoke_tpu.decode.beam import diverse_beam_search
        from evoke_tpu.models.rm_decoder import RMDecoder

        vocab, b, t, p = 30, 2, 7, 4
        beam, groups = 4, 2
        dec = RMDecoder(vocab_size=vocab, d_model=16, d_ff=32, d_vf=24,
                        num_layers=2, num_heads=2, rm_num_slots=3, rm_d_model=16,
                        max_seq_len=t, drop_prob_lm=0.0)
        att = jnp.asarray(rng.normal(size=(b, p, 24)), jnp.float32)
        att_mask = jnp.ones((b, p), jnp.int32)
        ids = jnp.asarray(rng.integers(1, vocab, size=(b, t)), jnp.int32)
        variables = dec.init(KEY, att, att_mask, ids, jnp.ones((b, t), jnp.int32))
        enc = dec.apply(variables, att, att_mask, method=dec.encode)
        bdash = beam // groups

        def mk_states():
            return [dec.apply(variables, enc, b * bdash, t,
                              method=dec.init_decode_state) for _ in range(groups)]

        def step(tok, pos, dstate):
            return dec.apply(variables, tok, pos, dstate, att_mask,
                             method=dec.decode_step)

        kw = dict(bos_id=29, eos_id=30, pad_id=0, vocab_size=31, beam_size=beam,
                  group_size=groups, diversity_lambda=0.5, max_len=t)
        base = diverse_beam_search(step, mk_states(), b, **kw)
        monkeypatch.setenv("EVOKE_LINEAGE_KERNEL", "xla")
        anc_x = diverse_beam_search(step, mk_states(), b, ancestor_kv=True, **kw)
        monkeypatch.setenv("EVOKE_LINEAGE_KERNEL", "pallas")
        anc_p = diverse_beam_search(step, mk_states(), b, ancestor_kv=True, **kw)
        np.testing.assert_array_equal(np.asarray(base.seqs), np.asarray(anc_x.seqs))
        np.testing.assert_array_equal(np.asarray(base.seqs), np.asarray(anc_p.seqs))


class TestDispatchGate:
    """use_pallas_lineage: narrow models must fall back to the XLA ancestor
    path on TPU — Mosaic rejects the kernel's sublane merge below one full
    128-lane tile (found on a real v5e at d_model=64 driving the library
    end-to-end; interpret-mode tests bypass Mosaic and cannot catch it)."""

    def test_narrow_d_falls_back_in_auto(self, monkeypatch):
        from evoke_tpu.ops import lineage_attention as la

        monkeypatch.delenv("EVOKE_LINEAGE_KERNEL", raising=False)
        monkeypatch.setattr(la.jax, "default_backend", lambda: "tpu")
        assert not la.use_pallas_lineage(jnp.zeros((6, 10, 64), jnp.bfloat16))
        assert not la.use_pallas_lineage(jnp.zeros((6, 10, 192), jnp.bfloat16))
        assert la.use_pallas_lineage(jnp.zeros((6, 10, 512), jnp.bfloat16))
        assert la.use_pallas_lineage(jnp.zeros((6, 10, 128), jnp.bfloat16))

    def test_forced_pallas_keeps_interpret_tests_running(self, monkeypatch):
        from evoke_tpu.ops import lineage_attention as la

        monkeypatch.setenv("EVOKE_LINEAGE_KERNEL", "pallas")
        assert la.use_pallas_lineage(jnp.zeros((6, 10, 64), jnp.bfloat16))

    def test_int8_cache_stays_on_xla(self, monkeypatch):
        from evoke_tpu.ops import lineage_attention as la

        monkeypatch.delenv("EVOKE_LINEAGE_KERNEL", raising=False)
        monkeypatch.setattr(la.jax, "default_backend", lambda: "tpu")
        assert not la.use_pallas_lineage(jnp.zeros((6, 10, 512), jnp.int8))


class TestVariantEnvelope:
    """_kernel_for: auto mode must select the fused-heads form ONLY inside the
    Mosaic-probed envelope (kbeam=3 with G in {4, 8} on a real v5e); every
    other shape takes the per-head loop, which compiles everywhere probed.
    Diverse beam (bdash groups -> kbeam=2) crashed Mosaic under the old
    unconditional-fused default."""

    def test_auto_selection(self, monkeypatch):
        from evoke_tpu.ops import lineage_attention as la

        monkeypatch.delenv("EVOKE_LINEAGE_HEADS", raising=False)
        assert la._kernel_for(4, 3) is la._kernel_fused_heads
        assert la._kernel_for(8, 3) is la._kernel_fused_heads
        for g, kbeam in ((1, 3), (2, 3), (4, 2), (4, 4), (8, 2)):
            assert la._kernel_for(g, kbeam) is la._kernel, (g, kbeam)

    def test_forced_modes(self, monkeypatch):
        from evoke_tpu.ops import lineage_attention as la

        monkeypatch.setenv("EVOKE_LINEAGE_HEADS", "loop")
        assert la._kernel_for(4, 3) is la._kernel
        monkeypatch.setenv("EVOKE_LINEAGE_HEADS", "fused")
        assert la._kernel_for(1, 2) is la._kernel_fused_heads
