import jax
import jax.numpy as jnp
import numpy as np

from evoke_tpu.evals.heatmaps import (denormalize_image, generation_heatmaps,
                                      jet_colormap, token_heatmap)
from evoke_tpu.models.rm_decoder import RMDecoder
from evoke_tpu.train.optim import WarmupCosineScheduler, build_scheduler

KEY = jax.random.key(0)


class TestAttentionCapture:
    def test_cross_attention_sown(self, rng):
        dec = RMDecoder(vocab_size=20, d_model=16, d_ff=32, d_vf=24, num_layers=2,
                        num_heads=2, rm_num_slots=2, rm_d_model=16, max_seq_len=5,
                        drop_prob_lm=0.0)
        att = jnp.asarray(rng.normal(size=(2, 9, 24)), jnp.float32)  # 3x3 patch grid
        att_mask = jnp.ones((2, 9), jnp.int32)
        ids = jnp.asarray(rng.integers(1, 20, size=(2, 5)), jnp.int32)
        tgt_mask = jnp.ones((2, 5), jnp.int32)
        variables = dec.init(KEY, att, att_mask, ids, tgt_mask)
        _, inter = dec.apply(variables, att, att_mask, ids, tgt_mask,
                             mutable=["intermediates"])
        node = inter["intermediates"]["dec_0"]["src_attn"]["attn"][0]
        assert node.shape == (2, 2, 5, 9)  # [B, heads, Tq, patches]
        np.testing.assert_allclose(np.asarray(node.sum(-1)), 1.0, rtol=1e-4)


class TestHeatmaps:
    def test_token_heatmap_shape_and_range(self, rng):
        img = rng.normal(size=(32, 32, 3)).astype(np.float32)
        weights = rng.random(9).astype(np.float32)
        out = token_heatmap(img, weights)
        assert out.shape == (32, 32, 3)
        assert out.min() >= 0.0 and out.max() <= 1.0

    def test_jet_extremes(self):
        cold = jet_colormap(np.array(0.0))
        hot = jet_colormap(np.array(1.0))
        assert cold[2] > cold[0]  # blue end
        assert hot[0] > hot[2]    # red end

    def test_generation_heatmaps(self, rng):
        img = rng.normal(size=(16, 16, 3)).astype(np.float32)
        attn = rng.random((2, 5, 16)).astype(np.float32)  # heads x tokens x 4x4 patches
        maps = generation_heatmaps(img, attn, [0, 2, 4])
        assert len(maps) == 3 and maps[0].shape == (16, 16, 3)

    def test_render_generation_heatmaps_end_to_end(self, rng, tmp_path):
        """The runnable surface behind --trainer.plot_heatmaps: teacher-forced
        forward with sown attention -> one PNG per (layer, generated token),
        in the reference's attentions/{study}/layer_{l}/ layout."""
        from evoke_tpu.data.synthetic import corpus_for_tokenizer, synthetic_batch
        from evoke_tpu.data.tokenizer import WordTokenizer
        from evoke_tpu.evals.heatmaps import render_generation_heatmaps
        from evoke_tpu.models.finetune import FinetuneModel
        from evoke_tpu.train.steps import TrainState

        tok = WordTokenizer.train(corpus_for_tokenizer())
        batch = synthetic_batch(np.random.default_rng(0), tok, batch=2,
                                image_size=32, max_seq_len=8, n_aux=2)
        model = FinetuneModel(
            vocab_size=tok.get_vocab_size(), output_dim=32, encoder_hidden_size=32,
            encoder_num_layers=1, encoder_num_heads=2, encoder_intermediate_size=64,
            d_model=16, d_ff=32, num_heads=2, num_layers=2, rm_num_slots=2,
            rm_d_model=16, fusion_num_heads=2, fusion_intermediate_size=64,
            sk_fusion_num_layers=1, max_seq_len=8, drop_prob_lm=0.0)
        variables = jax.jit(model.init)(KEY, batch["images"], batch["ids"],
                                        batch["mask"], batch["pids"], batch["valid"])
        state = TrainState(step=0, params=variables["params"],
                           batch_stats=variables["batch_stats"], opt_state=None)
        # 3 words then EOS for study 0; 2 words then EOS for study 1
        word = batch["ids"][0, 1]
        seqs = np.full((2, 8), tok.pad_id, np.int32)
        seqs[0, :3] = word
        seqs[0, 3] = tok.eos_id
        seqs[1, :2] = word
        seqs[1, 2] = tok.eos_id
        out = str(tmp_path / "attentions")
        written = render_generation_heatmaps(model, state, batch, seqs, tok, out,
                                             num_layers=2,
                                             study_ids=["s0", "s1"], max_studies=2)
        # (3 + 2) words x 2 layers
        assert len(written) == 10
        import os
        assert all(os.path.exists(p) for p in written)
        assert any(f"layer_1" in p for p in written)
        from PIL import Image
        assert Image.open(written[0]).size == (32, 32)


class TestWarmupCosine:
    def test_shape_of_schedule(self):
        s = WarmupCosineScheduler(warmup_epochs=5, max_epochs=20)
        vals = [s.update(e) for e in range(21)]
        assert vals[1] < vals[4] < vals[5]          # warmup rising
        assert abs(vals[5] - 1.0) < 1e-6            # peak after warmup
        assert vals[10] > vals[15] > vals[20]       # cosine falling
        assert abs(vals[20] - 0.0) < 1e-6

    def test_builder(self):
        s = build_scheduler("WarmupCosine", "max", warmup_epochs=2, max_epochs=10)
        assert isinstance(s, WarmupCosineScheduler)


class TestProfiling:
    def test_trace_capture_and_summary(self, tmp_path):
        """capture_trace + summarize_trace digest a real device trace: a jitted
        scan body shows up as loop ops, the one-shot matmul outside it doesn't."""
        import jax
        import jax.numpy as jnp

        from evoke_tpu.core.profiling import (capture_trace, format_summary,
                                              summarize_trace)

        @jax.jit
        def fn(x):
            y = x @ x  # one-shot op
            def body(c, _):
                return c @ x + 1.0, None
            out, _ = jax.lax.scan(body, y, None, length=16)
            return out

        x = jnp.eye(64) * 0.5
        np.asarray(fn(x))  # compile outside the trace
        outdir = capture_trace(lambda: np.asarray(fn(x)), str(tmp_path / "trace"))
        report = summarize_trace(outdir, loop_threshold=8)
        assert report["trace_file"].endswith(".trace.json.gz")
        assert report["loop_total_us"] >= 0
        text = format_summary(report)
        assert "loop ops:" in text and "one-shot" in text
