import jax
import jax.numpy as jnp
import numpy as np
import pytest

from evoke_tpu.models.fusion import MultiviewFusion, same_study_matrix
from evoke_tpu.models.heads import ProjectionHead
from evoke_tpu.models.layers import TorchLayerNorm, MultiHeadAttention, make_self_mask
from evoke_tpu.models.resnet import VisualExtractor
from evoke_tpu.models.rm_decoder import RMDecoder, RelationalMemory
from evoke_tpu.models.text_encoder import TextEncoder

KEY = jax.random.key(0)


class TestTorchLayerNorm:
    def test_matches_torch_semantics(self, rng):
        # torch: gamma*(x-mean)/(std_unbiased+eps)+beta
        x = rng.normal(size=(2, 5, 16)).astype(np.float32)
        ln = TorchLayerNorm()
        params = ln.init(KEY, jnp.asarray(x))
        y = ln.apply(params, jnp.asarray(x))
        mean = x.mean(-1, keepdims=True)
        std = x.std(-1, ddof=1, keepdims=True)
        expected = (x - mean) / (std + 1e-6)
        np.testing.assert_allclose(np.asarray(y), expected, rtol=1e-5, atol=1e-5)


class TestMHA:
    def test_mask_blocks_attention(self, rng):
        mha = MultiHeadAttention(num_heads=2, d_model=8)
        x = jnp.asarray(rng.normal(size=(1, 4, 8)), jnp.float32)
        params = mha.init(KEY, x, x, x)
        mask_full = make_self_mask(jnp.ones((1, 4), jnp.int32))
        # key 3 masked out: output must not depend on x[3]
        pad = jnp.array([[1, 1, 1, 0]], jnp.int32)
        mask_pad = make_self_mask(pad)
        y1 = mha.apply(params, x, x, x, mask=mask_pad)
        x2 = x.at[0, 3].set(99.0)
        y2 = mha.apply(params, x2, x2, x2, mask=mask_pad)
        np.testing.assert_allclose(np.asarray(y1[0, :3]), np.asarray(y2[0, :3]), atol=1e-5)
        assert not np.allclose(np.asarray(mha.apply(params, x, x, x, mask=mask_full)[0, :3]),
                               np.asarray(y1[0, :3]))


class TestVisualExtractor:
    @pytest.mark.parametrize("size,n_patches", [(64, 4), (96, 9)])
    def test_patch_grid(self, size, n_patches, rng):
        # C5 stride is 32: 64 -> 2x2 grid, 96 -> 3x3
        vx = VisualExtractor()
        imgs = jnp.asarray(rng.normal(size=(2, size, size, 3)), jnp.float32)
        variables = vx.init(KEY, imgs)
        patches, avg = vx.apply(variables, imgs)
        assert patches.shape == (2, n_patches, 2048)
        assert avg.shape == (2, 2048)
        np.testing.assert_allclose(np.asarray(avg), np.asarray(patches.mean(1)), rtol=2e-5, atol=1e-4)

    def test_param_count_resnet101(self):
        vx = VisualExtractor()
        variables = vx.init(KEY, jnp.zeros((1, 64, 64, 3)))
        n = sum(np.prod(p.shape) for p in jax.tree_util.tree_leaves(variables["params"]))
        # torchvision resnet101 minus fc: ~42.5M
        assert 42e6 < n < 43.5e6, n

    def test_remat_same_math_same_tree(self, rng):
        """remat=True: identical params tree, forward, grads, batch_stats."""
        imgs = jnp.asarray(rng.normal(size=(2, 64, 64, 3)), jnp.float32)
        plain, remat = VisualExtractor(), VisualExtractor(remat=True)
        variables = plain.init(KEY, imgs)
        assert (jax.tree_util.tree_structure(remat.init(KEY, imgs))
                == jax.tree_util.tree_structure(variables))

        def loss(params, mod):
            (p, _), stats = mod.apply(
                {"params": params, "batch_stats": variables["batch_stats"]},
                imgs, train=True, mutable=["batch_stats"])
            return (p ** 2).mean(), stats["batch_stats"]

        (l0, s0), g0 = jax.value_and_grad(loss, has_aux=True)(variables["params"], plain)
        (l1, s1), g1 = jax.value_and_grad(loss, has_aux=True)(variables["params"], remat)
        np.testing.assert_allclose(float(l0), float(l1), rtol=1e-6)
        for a, b in zip(jax.tree_util.tree_leaves(g0), jax.tree_util.tree_leaves(g1)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6)
        for a, b in zip(jax.tree_util.tree_leaves(s0), jax.tree_util.tree_leaves(s1)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)


class TestTextEncoder:
    def test_shapes_and_mask(self, rng):
        enc = TextEncoder(vocab_size=50, hidden_size=32, num_layers=2, num_heads=4,
                          intermediate_size=64)
        ids = jnp.asarray(rng.integers(0, 50, size=(2, 10)), jnp.int32)
        mask = jnp.asarray([[1] * 10, [1] * 6 + [0] * 4], jnp.int32)
        variables = enc.init(KEY, ids, mask)
        out = enc.apply(variables, ids, mask)
        assert out.shape == (2, 10, 32)
        # masked positions don't affect real positions
        ids2 = ids.at[1, 8].set(7)
        out2 = enc.apply(variables, ids2, mask)
        np.testing.assert_allclose(np.asarray(out[1, :6]), np.asarray(out2[1, :6]), atol=1e-5)


class TestProjectionHead:
    def test_shapes_and_final_bn(self, rng):
        x = jnp.asarray(rng.normal(size=(4, 6, 16)), jnp.float32)
        head = ProjectionHead(hidden_dim=8, output_dim=8, final_bn=True)
        variables = head.init(KEY, x, train=False)
        y, mut = head.apply(variables, x, train=True, mutable=["batch_stats"])
        assert y.shape == (4, 6, 8)
        # affine-free final BN: output is standardized over (batch, token)
        flat = np.asarray(y).reshape(-1, 8)
        np.testing.assert_allclose(flat.mean(0), 0.0, atol=1e-4)
        np.testing.assert_allclose(flat.std(0), 1.0, atol=1e-2)

    def test_global_embed_2d(self, rng):
        x = jnp.asarray(rng.normal(size=(4, 16)), jnp.float32)
        head = ProjectionHead(hidden_dim=8, output_dim=8)
        variables = head.init(KEY, x, train=False)
        y = head.apply(variables, x, train=False)
        assert y.shape == (4, 8)


class TestMultiviewFusion:
    def _reference_loop(self, fusion, variables, x, pids, valid, n_anchor):
        """Per-anchor Python loop mirroring EVOKE's multiview_fusion for the test oracle."""
        b = x.shape[0]
        m = np.asarray(same_study_matrix(jnp.asarray(pids[:n_anchor]), jnp.asarray(pids),
                                         jnp.asarray(valid[:n_anchor]), jnp.asarray(valid)))
        ln1 = lambda a: fusion.apply(variables, a, method=lambda mod, a: mod.layer_norm_1(a))
        ln2 = lambda a: fusion.apply(variables, a, method=lambda mod, a: mod.layer_norm_2(a))
        xn = np.asarray(ln1(jnp.asarray(x)))
        outs = []
        for i in range(n_anchor):
            if m[i].sum() == 0:
                outs.append(xn[i])
                continue
            kv = np.concatenate([xn[j] for j in range(b) if m[i, j]], axis=0)
            att = fusion.apply(
                variables,
                jnp.asarray(xn[i])[None], jnp.asarray(kv)[None],
                method=lambda mod, q, kv: mod.cross.apply_plain(q, kv))
            out = np.asarray(ln2(jnp.asarray(att[0]) + jnp.asarray(xn[i])[None]))[0]
            outs.append(out)
        return np.stack(outs)

    def test_matches_per_sample_loop(self, rng):
        # 4 anchors (studies 0..3) + 2 aux views (of studies 0 and 2)
        b, t, d, n_anchor = 6, 3, 16, 4
        x = jnp.asarray(rng.normal(size=(b, t, d)), jnp.float32)
        pids = jnp.asarray([0, 1, 2, 3, 0, 2], jnp.int32)
        valid = jnp.ones(b, bool)
        fusion = MultiviewFusion(d_model=d, num_heads=4)
        variables = fusion.init(KEY, x, pids, valid, n_anchor)
        fused, has = fusion.apply(variables, x, pids, valid, n_anchor)
        assert fused.shape == (n_anchor, t, d)
        np.testing.assert_array_equal(np.asarray(has), [True, False, True, False])
        ref = self._reference_loop(fusion, variables, np.asarray(x), np.asarray(pids),
                                   np.asarray(valid), n_anchor)
        np.testing.assert_allclose(np.asarray(fused), ref, rtol=1e-4, atol=1e-4)

    def test_invalid_aux_ignored(self, rng):
        # aux slot shares the study but is padding-invalid -> anchor has no partner
        b, t, d, n_anchor = 3, 2, 8, 2
        x = jnp.asarray(rng.normal(size=(b, t, d)), jnp.float32)
        pids = jnp.asarray([0, 1, 0], jnp.int32)
        valid = jnp.asarray([True, True, False])
        fusion = MultiviewFusion(d_model=d, num_heads=2)
        variables = fusion.init(KEY, x, pids, valid, n_anchor)
        fused, has = fusion.apply(variables, x, pids, valid, n_anchor)
        np.testing.assert_array_equal(np.asarray(has), [False, False])

    def test_no_nan_gradients_when_no_partner(self, rng):
        b, t, d = 3, 2, 8
        x = jnp.asarray(rng.normal(size=(b, t, d)), jnp.float32)
        pids = jnp.asarray([0, 1, 2], jnp.int32)  # nobody has a partner
        valid = jnp.ones(b, bool)
        fusion = MultiviewFusion(d_model=d, num_heads=2)
        variables = fusion.init(KEY, x, pids, valid, 3)

        def loss_fn(v, xx):
            out, _ = fusion.apply(v, xx, pids, valid, 3)
            return jnp.sum(out ** 2)

        g = jax.grad(loss_fn, argnums=1)(variables, x)
        assert np.isfinite(np.asarray(g)).all()


class TestRelationalMemory:
    def test_roll_equals_steps(self, rng):
        rm = RelationalMemory(num_slots=3, d_model=16, num_heads=2)
        xs = jnp.asarray(rng.normal(size=(2, 5, 16)), jnp.float32)
        variables = rm.init(KEY, xs, method=rm.roll)
        rolled = rm.apply(variables, xs, method=rm.roll)
        assert rolled.shape == (2, 5, 48)
        mem = rm.apply(variables, 2, method=rm.init_memory)
        for t in range(5):
            mem = rm.apply(variables, xs[:, t], mem, method=rm.step)
            np.testing.assert_allclose(np.asarray(rolled[:, t]), np.asarray(mem),
                                       rtol=1e-5, atol=1e-5)


class TestRMDecoder:
    def _make(self, rng, vocab=30, b=2, t=7, p=4):
        dec = RMDecoder(vocab_size=vocab, d_model=16, d_ff=32, d_vf=24, num_layers=2,
                        num_heads=2, rm_num_slots=3, rm_d_model=16, max_seq_len=t,
                        drop_prob_lm=0.0)
        att = jnp.asarray(rng.normal(size=(b, p, 24)), jnp.float32)
        att_mask = jnp.ones((b, p), jnp.int32)
        ids = jnp.asarray(rng.integers(1, vocab, size=(b, t)), jnp.int32)
        tgt_mask = jnp.ones((b, t), jnp.int32)
        variables = dec.init(KEY, att, att_mask, ids, tgt_mask)
        return dec, variables, att, att_mask, ids, tgt_mask

    def test_train_forward_shape(self, rng):
        dec, variables, att, att_mask, ids, tgt_mask = self._make(rng)
        logp = dec.apply(variables, att, att_mask, ids, tgt_mask)
        assert logp.shape == (2, 7, 31)  # vocab + 1
        np.testing.assert_allclose(np.asarray(jnp.exp(logp).sum(-1)), 1.0, rtol=1e-4)

    def test_causality(self, rng):
        dec, variables, att, att_mask, ids, tgt_mask = self._make(rng)
        logp1 = dec.apply(variables, att, att_mask, ids, tgt_mask)
        ids2 = ids.at[:, 5].set((ids[:, 5] + 1) % 30)
        logp2 = dec.apply(variables, att, att_mask, ids2, tgt_mask)
        np.testing.assert_allclose(np.asarray(logp1[:, :5]), np.asarray(logp2[:, :5]),
                                   rtol=1e-4, atol=1e-5)

    def test_kv_cached_decode_matches_full_forward(self, rng):
        """The KV-cached incremental step must be EXACTLY the re-decode-the-prefix math."""
        dec, variables, att, att_mask, ids, tgt_mask = self._make(rng)
        full = dec.apply(variables, att, att_mask, ids, tgt_mask)  # [B, T, V+1]

        enc = dec.apply(variables, att, att_mask, method=dec.encode)
        state = dec.apply(variables, enc, 2, method=dec.init_decode_state)
        for t in range(ids.shape[1]):
            logp, state = dec.apply(variables, ids[:, t], t, state, att_mask,
                                    method=dec.decode_step)
            np.testing.assert_allclose(np.asarray(logp), np.asarray(full[:, t]),
                                       rtol=1e-4, atol=1e-5)

    def test_kv_cached_decode_bf16(self, rng):
        """The bf16 decode path (single-token QK^T contracts in bf16 — the
        layers.dot_attention Tq==1 branch, absent from the f32 tests above)
        must track the bf16 full forward within bf16 tolerance."""
        vocab, b, t, p = 30, 2, 7, 4
        dec = RMDecoder(vocab_size=vocab, d_model=16, d_ff=32, d_vf=24, num_layers=2,
                        num_heads=2, rm_num_slots=3, rm_d_model=16, max_seq_len=t,
                        drop_prob_lm=0.0, dtype=jnp.bfloat16)
        att = jnp.asarray(rng.normal(size=(b, p, 24)), jnp.float32)
        att_mask = jnp.ones((b, p), jnp.int32)
        ids = jnp.asarray(rng.integers(1, vocab, size=(b, t)), jnp.int32)
        tgt_mask = jnp.ones((b, t), jnp.int32)
        variables = dec.init(KEY, att, att_mask, ids, tgt_mask)
        full = dec.apply(variables, att, att_mask, ids, tgt_mask)
        enc = dec.apply(variables, att, att_mask, method=dec.encode)
        state = dec.apply(variables, enc, b, method=dec.init_decode_state)
        for step_t in range(t):
            logp, state = dec.apply(variables, ids[:, step_t], step_t, state, att_mask,
                                    method=dec.decode_step)
            # bf16 rounding of the score reduce: compare softmax-normalized
            # distributions loosely but meaningfully
            np.testing.assert_allclose(np.asarray(logp), np.asarray(full[:, step_t]),
                                       rtol=0.05, atol=0.05)


    def test_shared_cross_kv_matches_expanded(self, rng):
        """Beam decode with cross K/V kept at B rows (MultiHeadAttention.attend
        shared-KV path, layers.py) must equal the beam-expanded form: all beams
        of a sample attend identical encoder rows, so reading each sample's
        cross K/V once is the same attention with less HBM traffic."""
        beam = 3
        dec, variables, att, att_mask, ids, tgt_mask = self._make(rng)
        att_mask = att_mask.at[1, 2:].set(0)  # ragged patches: exercise the mask
        b, t = ids.shape
        enc = dec.apply(variables, att, att_mask, method=dec.encode)

        # expanded reference: repeat enc + mask per beam (rows [s0b0,s0b1,...])
        enc_b = jnp.repeat(enc, beam, axis=0)
        mask_b = jnp.repeat(att_mask, beam, axis=0)
        ids_b = jnp.repeat(ids, beam, axis=0)
        st_e = dec.apply(variables, enc_b, b * beam, method=dec.init_decode_state)
        st_s = dec.apply(variables, enc, b * beam, method=dec.init_decode_state)
        for step_t in range(t):
            lp_e, st_e = dec.apply(variables, ids_b[:, step_t], step_t, st_e, mask_b,
                                   method=dec.decode_step)
            lp_s, st_s = dec.apply(variables, ids_b[:, step_t], step_t, st_s, att_mask,
                                   method=dec.decode_step)
            np.testing.assert_allclose(np.asarray(lp_s), np.asarray(lp_e),
                                       rtol=1e-5, atol=1e-5)


    @pytest.mark.parametrize("schedule", [None, (3, 5, 7)])
    def test_ancestor_kv_matches_reorder(self, rng, schedule):
        """Beam search with ancestor_kv=True (un-permuted caches + lineage
        table, layers.cached_self_attention) must reproduce the reorder-mode
        tokens and scores: the attended set per query is identical, only the
        cache bookkeeping differs."""
        from evoke_tpu.decode.beam import beam_search

        beam, t = 3, 7
        dec, variables, att, att_mask, ids, tgt_mask = self._make(rng)
        att_mask = att_mask.at[1, 2:].set(0)
        b = att.shape[0]
        enc = dec.apply(variables, att, att_mask, method=dec.encode)

        def mk_state(lmax):
            return dec.apply(variables, enc, b * beam, lmax,
                             method=dec.init_decode_state)

        def step(tok, pos, dstate):
            return dec.apply(variables, tok, pos, dstate, att_mask,
                             method=dec.decode_step)

        kw = dict(bos_id=29, eos_id=30, pad_id=0, vocab_size=31, beam_size=beam,
                  max_len=t, cache_schedule=schedule)
        l0 = schedule[0] if schedule else t
        base = beam_search(step, mk_state(l0), b, **kw)
        anc = beam_search(step, mk_state(l0), b, ancestor_kv=True, **kw)
        np.testing.assert_array_equal(np.asarray(base.seqs), np.asarray(anc.seqs))
        np.testing.assert_allclose(np.asarray(base.scores), np.asarray(anc.scores),
                                   rtol=1e-5, atol=1e-6)


    def test_int8_kv_cache_tracks_exact_decode(self, rng):
        """kv_dtype='int8' stores caches 8-bit with per-slot absmax scales —
        quantized numerics must stay close to the exact f32 cache path (the
        only error source is one 8-bit rounding per written K/V vector)."""
        dec, variables, att, att_mask, ids, tgt_mask = self._make(rng)
        b, t = ids.shape
        enc = dec.apply(variables, att, att_mask, method=dec.encode)
        st = dec.apply(variables, enc, b, method=dec.init_decode_state)
        st_q = dec.apply(variables, enc, b, None, "int8",
                         method=dec.init_decode_state)
        assert st_q["cache_k"][0].dtype == jnp.int8
        assert st_q["cache_k_scale"][0].shape == (b, t)
        agree = 0
        for step_t in range(t):
            lp, st = dec.apply(variables, ids[:, step_t], step_t, st, att_mask,
                               method=dec.decode_step)
            lp_q, st_q = dec.apply(variables, ids[:, step_t], step_t, st_q, att_mask,
                                   method=dec.decode_step)
            np.testing.assert_allclose(np.asarray(lp_q), np.asarray(lp),
                                       atol=0.15, rtol=0.1)
            agree += int((np.asarray(lp_q).argmax(-1) == np.asarray(lp).argmax(-1)).all())
        assert agree >= t - 1, f"argmax agreed on only {agree}/{t} steps"

    def test_int8_kv_cache_beam_with_schedule(self, rng):
        """int8 caches must flow through beam search: scales are gathered with
        the beams and zero-padded by grow_caches; phased == single-phase (the
        per-step quantized writes are identical, only cache length differs)."""
        from evoke_tpu.decode.beam import beam_search

        beam, t = 3, 7
        dec, variables, att, att_mask, ids, tgt_mask = self._make(rng)
        b = att.shape[0]
        enc = dec.apply(variables, att, att_mask, method=dec.encode)

        def mk_state(lmax):
            return dec.apply(variables, enc, b * beam, lmax, "int8",
                             method=dec.init_decode_state)

        def step(tok, pos, dstate):
            return dec.apply(variables, tok, pos, dstate, att_mask,
                             method=dec.decode_step)

        kw = dict(bos_id=29, eos_id=30, pad_id=0, vocab_size=31, beam_size=beam,
                  max_len=t)
        single = beam_search(step, mk_state(t), b, **kw)
        phased = beam_search(step, mk_state(3), b, cache_schedule=(3, 5, 7), **kw)
        np.testing.assert_array_equal(np.asarray(single.seqs), np.asarray(phased.seqs))
        np.testing.assert_allclose(np.asarray(single.scores), np.asarray(phased.scores),
                                   rtol=1e-5, atol=1e-6)


class TestGroupedFusionAttention:
    """max_partners=G grouped partner-gather fusion == dense masked fusion
    whenever every anchor has <= G partners (same attended key set)."""

    def _case(self, rng, b, t, d, n_anchor, pids, valid):
        x = jnp.asarray(rng.normal(size=(b, t, d)), jnp.float32)
        pids = jnp.asarray(pids, jnp.int32)
        valid = jnp.asarray(valid, bool)
        dense = MultiviewFusion(d_model=d, num_heads=4)
        variables = dense.init(KEY, x, pids, valid, n_anchor)
        want, has_w = dense.apply(variables, x, pids, valid, n_anchor)
        return x, pids, valid, variables, np.asarray(want), np.asarray(has_w)

    def test_matches_dense_mixed_multiplicity(self, rng):
        # studies with 2, 0, 1, 0 partners; one invalid padding slot
        b, t, d, n_anchor = 8, 3, 16, 4
        pids = [0, 1, 2, 3, 0, 0, 2, 3]
        valid = [True] * 7 + [False]  # last slot: study-3 aux but padding
        x, p, v, variables, want, has_w = self._case(rng, b, t, d, n_anchor, pids, valid)
        for g in (2, 3, 5):
            grouped = MultiviewFusion(d_model=d, num_heads=4, max_partners=g)
            got, has_g = grouped.apply(variables, x, p, v, n_anchor)
            np.testing.assert_array_equal(has_w, np.asarray(has_g))
            np.testing.assert_allclose(np.asarray(got), want, rtol=2e-5, atol=2e-5), g

    def test_bound_larger_than_batch_clamps(self, rng):
        b, t, d, n_anchor = 4, 2, 8, 2
        pids = [0, 1, 0, 1]
        valid = [True] * 4
        x, p, v, variables, want, _ = self._case(rng, b, t, d, n_anchor, pids, valid)
        grouped = MultiviewFusion(d_model=d, num_heads=4, max_partners=64)
        got, _ = grouped.apply(variables, x, p, v, n_anchor)
        np.testing.assert_allclose(np.asarray(got), want, rtol=2e-5, atol=2e-5)

    def test_max_partners_in_helper(self):
        from evoke_tpu.models.fusion import max_partners_in

        pids = np.asarray([0, 1, 2, 0, 0, 2, -1])
        valid = np.asarray([True, True, True, True, True, True, False])
        assert max_partners_in(pids, valid, 3) == 2   # anchor 0 has two aux
        assert max_partners_in(pids, valid, 2) == 2
        assert max_partners_in(np.asarray([0, 1]), np.asarray([True, True]), 2) == 0
