"""Alternative encoders/decoders (the reference Inference model's selection
surface): ViT-B/32 visual encoder, causal-LM decoder — all through FinetuneModel."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from evoke_tpu.models.causal_decoder import CausalDecoder
from evoke_tpu.models.finetune import FinetuneModel
from evoke_tpu.models.vit import ViTExtractor

pytestmark = pytest.mark.slow  # full-model CPU compiles: run via the slow lane


KEY = jax.random.key(0)


class TestViT:
    def test_shapes(self, rng):
        vit = ViTExtractor(patch_size=8, width=32, num_layers=2, num_heads=4,
                           mlp_dim=64, d_vf=48, max_patches=64)
        imgs = jnp.asarray(rng.normal(size=(2, 32, 32, 3)), jnp.float32)
        variables = vit.init(KEY, imgs)
        patches, avg = vit.apply(variables, imgs)
        assert patches.shape == (2, 16, 48)  # 32/8=4 -> 4x4 patches
        assert avg.shape == (2, 48)

    def test_resolution_scaling(self, rng):
        vit = ViTExtractor(patch_size=8, width=32, num_layers=1, num_heads=4,
                           mlp_dim=64, d_vf=48, max_patches=100)
        variables = vit.init(KEY, jnp.zeros((1, 32, 32, 3)))
        patches, _ = vit.apply(variables, jnp.zeros((1, 64, 64, 3)))
        assert patches.shape == (1, 64, 48)  # same params, larger grid


class TestCausalDecoder:
    def _make(self, rng, vocab=30, b=2, t=6, p=4):
        dec = CausalDecoder(vocab_size=vocab, d_model=16, d_ff=32, d_vf=24,
                            num_layers=2, num_heads=2, max_seq_len=t,
                            dropout_rate=0.0, drop_prob_lm=0.0)
        att = jnp.asarray(rng.normal(size=(b, p, 24)), jnp.float32)
        att_mask = jnp.ones((b, p), jnp.int32)
        ids = jnp.asarray(rng.integers(1, vocab, size=(b, t)), jnp.int32)
        tgt_mask = jnp.ones((b, t), jnp.int32)
        variables = dec.init(KEY, att, att_mask, ids, tgt_mask)
        return dec, variables, att, att_mask, ids, tgt_mask

    def test_kv_cached_decode_matches_full(self, rng):
        dec, variables, att, att_mask, ids, tgt_mask = self._make(rng)
        full = dec.apply(variables, att, att_mask, ids, tgt_mask)
        enc = dec.apply(variables, att, att_mask, method=dec.encode)
        state = dec.apply(variables, enc, 2, method=dec.init_decode_state)
        for t in range(ids.shape[1]):
            logp, state = dec.apply(variables, ids[:, t], t, state, att_mask,
                                    method=dec.decode_step)
            np.testing.assert_allclose(np.asarray(logp), np.asarray(full[:, t]),
                                       rtol=1e-4, atol=1e-5)


class TestBertGenDecoder:
    def test_kv_cached_decode_matches_full(self, rng):
        from evoke_tpu.models.causal_decoder import BertGenerationDecoder

        vocab, b, t, p = 30, 2, 6, 4
        dec = BertGenerationDecoder(vocab_size=vocab, d_model=16, d_ff=32, d_vf=24,
                                    num_layers=2, num_heads=2, max_seq_len=t,
                                    dropout_rate=0.0, drop_prob_lm=0.0)
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
            np.testing.assert_allclose(np.asarray(logp), np.asarray(full[:, step_t]),
                                       rtol=1e-4, atol=1e-5)


class TestInferenceSelection:
    @pytest.mark.parametrize("encoder,decoder", [("vit_b32", "r2gen"),
                                                 ("resnet101", "causal"),
                                                 ("resnet101", "bertgen")])
    def test_combo_forward(self, encoder, decoder, rng):
        model = FinetuneModel(
            vocab_size=30, output_dim=32, encoder_hidden_size=32, encoder_num_layers=1,
            encoder_num_heads=2, encoder_intermediate_size=64, d_model=16, d_ff=32,
            num_heads=2, num_layers=1, rm_num_slots=2, rm_d_model=16,
            fusion_num_heads=2, fusion_intermediate_size=64, sk_fusion_num_layers=1,
            max_seq_len=8, drop_prob_lm=0.0, dropout=0.0,
            visual_encoder=encoder, decoder_kind=decoder)
        images = jnp.asarray(rng.normal(size=(2, 32, 32, 3)), jnp.float32)
        ids = jnp.asarray(rng.integers(1, 30, size=(2, 8)), jnp.int32)
        mask = jnp.ones((2, 8), jnp.int32)
        pids = jnp.asarray([0, 1], jnp.int32)
        valid = jnp.ones(2, bool)
        variables = jax.jit(model.init)(KEY, images, ids, mask, pids, valid)
        out = model.apply(variables, images, ids, mask, pids, valid, train=False)
        assert np.isfinite(float(out["lm"]))
        enc, am = model.apply(variables, images, pids, valid, 2,
                              method=model.encode_for_decode)
        state = model.apply(variables, enc, 2, method=model.init_decode_state)
        logp, _ = model.apply(variables, jnp.zeros(2, jnp.int32), 0, state, am,
                              method=model.decode_step)
        assert logp.shape == (2, 31)
