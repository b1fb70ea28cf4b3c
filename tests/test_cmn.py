import pytest
import jax
import jax.numpy as jnp
import numpy as np

from evoke_tpu.models.cmn import CMNDecoder, MultiThreadMemory

pytestmark = pytest.mark.slow  # full-model CPU compiles: run via the slow lane


KEY = jax.random.key(0)


class TestMultiThreadMemory:
    def test_topk_selection_matches_naive(self, rng):
        """Top-k memory attention == full attention restricted to the top-k slots."""
        b, t, d, h, m, k = 2, 3, 16, 2, 20, 4
        mtm = MultiThreadMemory(num_heads=h, d_model=d, topk=k)
        q = jnp.asarray(rng.normal(size=(b, t, d)), jnp.float32)
        mem = jnp.asarray(rng.normal(size=(m, d)), jnp.float32)
        variables = mtm.init(KEY, q, mem)
        out = mtm.apply(variables, q, mem)
        assert out.shape == (b, t, d)

        # naive: project, per-head scores, mask all but top-k, softmax, weighted sum
        p = variables["params"]
        qq = (np.asarray(q) @ p["wq"]["kernel"] + p["wq"]["bias"])
        kk = (np.asarray(mem) @ p["wk"]["kernel"] + p["wk"]["bias"])
        vv = (np.asarray(mem) @ p["wv"]["kernel"] + p["wv"]["bias"])
        dk = d // h
        want = np.zeros((b, t, d), np.float32)
        for bi in range(b):
            for hi in range(h):
                qh = qq[bi, :, hi * dk:(hi + 1) * dk]
                kh = kk[:, hi * dk:(hi + 1) * dk]
                vh = vv[:, hi * dk:(hi + 1) * dk]
                scores = qh @ kh.T / np.sqrt(dk)
                for ti in range(t):
                    top = np.argsort(-scores[ti])[:k]
                    s = scores[ti, top]
                    w = np.exp(s - s.max())
                    w = w / w.sum()
                    want[bi, ti, hi * dk:(hi + 1) * dk] = w @ vh[top]
        want = want @ p["wo"]["kernel"] + p["wo"]["bias"]
        np.testing.assert_allclose(np.asarray(out), want, rtol=1e-4, atol=1e-4)


class TestCMNDecoder:
    def _make(self, rng, vocab=30, b=2, t=7, p=4):
        dec = CMNDecoder(vocab_size=vocab, d_model=16, d_ff=32, d_vf=24, num_layers=2,
                         num_heads=2, cmm_size=12, cmm_dim=16, topk=4, max_seq_len=t,
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
        assert logp.shape == (2, 7, 31)
        np.testing.assert_allclose(np.asarray(jnp.exp(logp).sum(-1)), 1.0, rtol=1e-4)

    def test_kv_cached_decode_matches_full_forward(self, rng):
        dec, variables, att, att_mask, ids, tgt_mask = self._make(rng)
        full = dec.apply(variables, att, att_mask, ids, tgt_mask)
        enc = dec.apply(variables, att, att_mask, method=dec.encode)
        state = dec.apply(variables, enc, 2, method=dec.init_decode_state)
        for t in range(ids.shape[1]):
            logp, state = dec.apply(variables, ids[:, t], t, state, att_mask,
                                    method=dec.decode_step)
            np.testing.assert_allclose(np.asarray(logp), np.asarray(full[:, t]),
                                       rtol=1e-4, atol=1e-5)


class TestFinetuneWithCMN:
    def test_finetune_model_cmn_decoder(self, rng):
        from evoke_tpu.models.finetune import FinetuneModel

        model = FinetuneModel(
            vocab_size=30, output_dim=32, encoder_hidden_size=32, encoder_num_layers=1,
            encoder_num_heads=2, encoder_intermediate_size=64, d_model=16, d_ff=32,
            num_heads=2, num_layers=1, fusion_num_heads=2, fusion_intermediate_size=64,
            sk_fusion_num_layers=1, max_seq_len=8, drop_prob_lm=0.0,
            decoder_kind="cmn", cmm_size=12, cmm_dim=16, cmn_topk=4)
        images = jnp.asarray(rng.normal(size=(3, 32, 32, 3)), jnp.float32)
        ids = jnp.asarray(rng.integers(1, 30, size=(3, 8)), jnp.int32)
        mask = jnp.ones((3, 8), jnp.int32)
        pids = jnp.asarray([0, 1, 0], jnp.int32)
        valid = jnp.ones(3, bool)
        variables = jax.jit(model.init)(KEY, images, ids, mask, pids, valid)
        out = model.apply(variables, images, ids, mask, pids, valid, train=False)
        assert np.isfinite(float(out["lm"]))
        # generation path compiles too
        enc, am = model.apply(variables, images, pids, valid, 3,
                              method=model.encode_for_decode)
        state = model.apply(variables, enc, 3, method=model.init_decode_state)
        logp, _ = model.apply(variables, jnp.zeros(3, jnp.int32), 0, state, am,
                              method=model.decode_step)
        assert logp.shape == (3, 31)
