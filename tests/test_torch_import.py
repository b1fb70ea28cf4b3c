"""Weight-import parity: outputs of our Flax modules must match torch forwards
given the same imported checkpoint weights."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

from evoke_tpu.models.resnet import VisualExtractor
from evoke_tpu.models.text_encoder import TextEncoder
from evoke_tpu.models.torch_import import (detect_bert_prefix, import_bert_encoder,
                                           import_resnet101)

KEY = jax.random.key(0)


# ---------------------------------------------------------------- torch ResNet oracle

def _torch_resnet_state_dict(rng, stage_sizes=(3, 4, 23, 3)):
    """Random state_dict in torchvision resnet101 format (small init for stability)."""
    sd = {}

    def conv(name, o, i, k):
        sd[f"{name}.weight"] = torch.tensor(
            rng.normal(0, 0.05, size=(o, i, k, k)).astype(np.float32))

    def bn(name, c):
        sd[f"{name}.weight"] = torch.tensor(rng.uniform(0.5, 1.5, c).astype(np.float32))
        sd[f"{name}.bias"] = torch.tensor(rng.normal(0, 0.1, c).astype(np.float32))
        sd[f"{name}.running_mean"] = torch.tensor(rng.normal(0, 0.1, c).astype(np.float32))
        sd[f"{name}.running_var"] = torch.tensor(rng.uniform(0.5, 1.5, c).astype(np.float32))

    conv("conv1", 64, 3, 7)
    bn("bn1", 64)
    in_c = 64
    for s, n in enumerate(stage_sizes, start=1):
        feats = 64 * (2 ** (s - 1))
        for i in range(n):
            p = f"layer{s}.{i}"
            conv(f"{p}.conv1", feats, in_c if i == 0 else feats * 4, 1)
            bn(f"{p}.bn1", feats)
            conv(f"{p}.conv2", feats, feats, 3)
            bn(f"{p}.bn2", feats)
            conv(f"{p}.conv3", feats * 4, feats, 1)
            bn(f"{p}.bn3", feats * 4)
            if i == 0:
                conv(f"{p}.downsample.0", feats * 4, in_c, 1)
                bn(f"{p}.downsample.1", feats * 4)
        in_c = feats * 4
    return sd


def _torch_resnet_forward(sd, x, stage_sizes=(3, 4, 23, 3)):
    """Minimal torchvision-semantics resnet forward from a raw state_dict."""
    import torch.nn.functional as F

    def bn(name, h):
        return F.batch_norm(h, sd[f"{name}.running_mean"], sd[f"{name}.running_var"],
                            sd[f"{name}.weight"], sd[f"{name}.bias"], False, 0.1, 1e-5)

    h = F.conv2d(x, sd["conv1.weight"], stride=2, padding=3)
    h = F.relu(bn("bn1", h))
    h = F.max_pool2d(h, 3, stride=2, padding=1)
    for s, n in enumerate(stage_sizes, start=1):
        for i in range(n):
            p = f"layer{s}.{i}"
            stride = 2 if (s > 1 and i == 0) else 1
            res = h
            y = F.relu(bn(f"{p}.bn1", F.conv2d(h, sd[f"{p}.conv1.weight"])))
            y = F.relu(bn(f"{p}.bn2", F.conv2d(y, sd[f"{p}.conv2.weight"],
                                               stride=stride, padding=1)))
            y = bn(f"{p}.bn3", F.conv2d(y, sd[f"{p}.conv3.weight"]))
            if f"{p}.downsample.0.weight" in sd:
                res = bn(f"{p}.downsample.1",
                         F.conv2d(h, sd[f"{p}.downsample.0.weight"], stride=stride))
            h = F.relu(y + res)
    return h


class TestResNetImport:
    def test_forward_parity_with_torch(self):
        rng = np.random.default_rng(0)
        stage_sizes = (2, 2, 2, 2)  # same block/downsample topology, test-sized
        sd = _torch_resnet_state_dict(rng, stage_sizes)

        from evoke_tpu.models.resnet import ResNet101

        class SmallVX(VisualExtractor):
            def setup(self):
                self.backbone = ResNet101(stage_sizes=stage_sizes)

        model = SmallVX()
        x = rng.normal(size=(2, 64, 64, 3)).astype(np.float32)
        variables = model.init(KEY, jnp.asarray(x))
        np_sd = {k: v.numpy() for k, v in sd.items()}
        # adapt the importer to the smaller stage sizes
        import evoke_tpu.models.torch_import as ti
        variables2, report = _import_with_sizes(ti, np_sd, variables, stage_sizes)
        assert report["mismatched"] == 0 and report["missing"] == 0
        patches, avg = model.apply(
            {"params": variables2["params"], "batch_stats": variables2["batch_stats"]},
            jnp.asarray(x), train=False)
        want = _torch_resnet_forward(sd, torch.tensor(x).permute(0, 3, 1, 2), stage_sizes)
        want = want.permute(0, 2, 3, 1).reshape(2, -1, want.shape[1]).numpy()
        np.testing.assert_allclose(np.asarray(patches), want, rtol=2e-3, atol=2e-3)

    def test_full_resnet101_import_structure(self):
        rng = np.random.default_rng(1)
        sd = {k: v.numpy() for k, v in _torch_resnet_state_dict(rng).items()}
        model = VisualExtractor()
        variables = jax.jit(model.init)(KEY, jnp.zeros((1, 32, 32, 3)))
        variables2, report = import_resnet101(sd, variables)
        assert report["mismatched"] == 0 and report["missing"] == 0
        # every torchvision tensor found a home
        assert report["loaded"] == len(sd)


def _import_with_sizes(ti, sd, variables, stage_sizes):
    """import_resnet101 generalized over stage sizes for the test."""
    import types

    orig = ti.import_resnet101.__globals__  # reuse helpers

    variables = jax.tree_util.tree_map(np.asarray, jax.device_get(variables))
    params = variables["params"]["backbone"]
    stats = variables["batch_stats"]["backbone"]
    report = {"loaded": 0, "mismatched": 0, "missing": 0}
    _assign, _conv = ti._assign, ti._conv

    def put_bn(src, dst):
        _assign(params, dst + ["scale"], sd[f"{src}.weight"], report, src)
        _assign(params, dst + ["bias"], sd[f"{src}.bias"], report, src)
        _assign(stats, dst + ["mean"], sd[f"{src}.running_mean"], report, src)
        _assign(stats, dst + ["var"], sd[f"{src}.running_var"], report, src)

    _assign(params, ["conv1", "kernel"], _conv(sd["conv1.weight"]), report, "conv1")
    put_bn("bn1", ["bn1"])
    for s, n_blocks in enumerate(stage_sizes, start=1):
        for i in range(n_blocks):
            src, dst = f"layer{s}.{i}", f"layer{s}_{i}"
            for c in ("conv1", "conv2", "conv3"):
                _assign(params, [dst, c, "kernel"], _conv(sd[f"{src}.{c}.weight"]),
                        report, src)
            for b in ("bn1", "bn2", "bn3"):
                put_bn(f"{src}.{b}", [dst, b])
            if f"{src}.downsample.0.weight" in sd:
                _assign(params, [dst, "downsample_conv", "kernel"],
                        _conv(sd[f"{src}.downsample.0.weight"]), report, src)
                put_bn(f"{src}.downsample.1", [dst, "downsample_bn"])
    return variables, report


class TestBertImport:
    def test_forward_parity_with_hf_bert(self):
        transformers = pytest.importorskip("transformers")
        from transformers import BertConfig, BertModel

        cfg = BertConfig(vocab_size=50, hidden_size=32, num_hidden_layers=2,
                         num_attention_heads=4, intermediate_size=64,
                         max_position_embeddings=64, hidden_dropout_prob=0.0,
                         attention_probs_dropout_prob=0.0)
        hf = BertModel(cfg)
        hf.eval()
        sd = {k: v.detach().numpy() for k, v in hf.state_dict().items()}

        ours = TextEncoder(vocab_size=50, hidden_size=32, num_layers=2, num_heads=4,
                           intermediate_size=64, max_positions=64, dropout_rate=0.0)
        ids = np.array([[2, 7, 9, 11, 4, 0, 0, 0], [5, 6, 8, 10, 12, 13, 14, 1]],
                       np.int64)
        mask = np.array([[1, 1, 1, 1, 1, 0, 0, 0], [1] * 8, ], np.int64)
        variables = ours.init(KEY, jnp.asarray(ids), jnp.asarray(mask))
        prefix = detect_bert_prefix(sd)
        imported, report = import_bert_encoder(sd, variables, prefix=prefix)
        assert report["mismatched"] == 0
        got = ours.apply(imported, jnp.asarray(ids), jnp.asarray(mask))
        with torch.no_grad():
            want = hf(input_ids=torch.tensor(ids),
                      attention_mask=torch.tensor(mask)).last_hidden_state.numpy()
        # masked positions diverge (we hard-mask, HF soft-masks); compare real tokens
        np.testing.assert_allclose(np.asarray(got)[0, :5], want[0, :5],
                                   rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(np.asarray(got)[1], want[1], rtol=1e-4, atol=1e-4)

    def test_vocab_mismatch_skipped(self):
        transformers = pytest.importorskip("transformers")
        from transformers import BertConfig, BertModel

        cfg = BertConfig(vocab_size=99, hidden_size=32, num_hidden_layers=1,
                         num_attention_heads=4, intermediate_size=64)
        sd = {k: v.detach().numpy() for k, v in BertModel(cfg).state_dict().items()}
        ours = TextEncoder(vocab_size=50, hidden_size=32, num_layers=1, num_heads=4,
                           intermediate_size=64)
        ids = np.zeros((1, 4), np.int64)
        variables = ours.init(KEY, jnp.asarray(ids), jnp.ones((1, 4), np.int64))
        imported, report = import_bert_encoder(sd, variables)
        assert report["mismatched"] >= 1  # word embeddings skipped
        assert report["loaded"] > 10


class TestGPT2DecoderImport:
    """distilgpt2-format import into CausalDecoder (language_model.py:161
    semantics: LM stack loads, cross-attention stays fresh)."""

    def _tiny_gpt2_sd(self, vocab=33, d=16, layers=2, positions=64):
        transformers = pytest.importorskip("transformers")
        from transformers import GPT2Config, GPT2LMHeadModel

        cfg = GPT2Config(vocab_size=vocab, n_embd=d, n_layer=layers, n_head=2,
                         n_positions=positions)
        torch.manual_seed(0)
        model = GPT2LMHeadModel(cfg)
        return {k: v.detach().numpy() for k, v in model.state_dict().items()}

    def test_import_counts_and_values(self):
        from evoke_tpu.models.causal_decoder import CausalDecoder
        from evoke_tpu.models.torch_import import import_gpt2_decoder

        vocab, d = 32, 16  # our tok_embed is vocab+1 = GPT2's 33
        dec = CausalDecoder(vocab_size=vocab, d_model=d, d_ff=4 * d, d_vf=8,
                            num_layers=2, num_heads=2, max_seq_len=8, max_positions=16)
        rng = np.random.default_rng(0)
        att = jnp.asarray(rng.normal(size=(2, 3, 8)), jnp.float32)
        mask = jnp.ones((2, 3), jnp.int32)
        ids = jnp.asarray(rng.integers(0, vocab, (2, 8)), jnp.int32)
        variables = dec.init(KEY, att, mask, ids, jnp.ones_like(ids))
        variables = jax.device_get(variables)

        sd = self._tiny_gpt2_sd(vocab=vocab + 1, d=d, layers=2, positions=64)
        new_vars, report = import_gpt2_decoder(sd, dict(variables))
        assert report["mismatched"] == 0, report
        # wte + lm_head + wpe + 2 layers x 16 + ln_f x 2 = 37 tensors
        assert report["loaded"] == 37, report
        p = new_vars["params"]
        np.testing.assert_allclose(np.asarray(p["tok_embed"]["embedding"]),
                                   sd["transformer.wte.weight"])
        # position table sliced to our max_positions
        np.testing.assert_allclose(np.asarray(p["pos_embed"]["embedding"]),
                                   sd["transformer.wpe.weight"][:16])
        # fused qkv split: wq == first third of c_attn
        np.testing.assert_allclose(
            np.asarray(p["layer_0"]["self_attn"]["wq"]["kernel"]),
            sd["transformer.h.0.attn.c_attn.weight"][:, :d])
        # forward still runs with imported weights
        out = dec.apply(new_vars, att, mask, ids, jnp.ones_like(ids))
        assert np.isfinite(np.asarray(out)).all()


class TestBertGenerationDecoderImport:
    """BertGenerationDecoder import (language_model.py:24-37 semantics:
    is_decoder + add_cross_attention, ignore_mismatched_sizes). A full decoder
    save loads everything incl. cross-attention + LM head; a plain BERT encoder
    checkpoint leaves those fresh."""

    def _tiny_hf_decoder(self, vocab=33, d=16, layers=2, positions=64):
        pytest.importorskip("transformers")
        from transformers.models.bert_generation import (BertGenerationConfig,
                                                         BertGenerationDecoder)

        cfg = BertGenerationConfig(
            vocab_size=vocab, hidden_size=d, num_hidden_layers=layers,
            num_attention_heads=2, intermediate_size=2 * d,
            max_position_embeddings=positions, is_decoder=True,
            add_cross_attention=True, hidden_dropout_prob=0.0,
            attention_probs_dropout_prob=0.0, bos_token_id=1, eos_token_id=2,
            pad_token_id=0)
        torch.manual_seed(0)
        model = BertGenerationDecoder(cfg)
        model.eval()
        return model

    def test_logit_parity_with_hf(self):
        from evoke_tpu.models.causal_decoder import BertGenerationDecoder as Ours
        from evoke_tpu.models.torch_import import import_bertgeneration_decoder

        vocab, d, t, s = 32, 16, 6, 5
        hf = self._tiny_hf_decoder(vocab=vocab + 1, d=d)
        sd = {k: v.detach().numpy() for k, v in hf.state_dict().items()}
        ours = Ours(vocab_size=vocab, d_model=d, d_ff=2 * d, d_vf=d, num_layers=2,
                    num_heads=2, dropout_rate=0.0, max_seq_len=t, max_positions=64)
        rng = np.random.default_rng(0)
        enc = rng.normal(size=(2, s, d)).astype(np.float32)
        att_mask = np.ones((2, s), np.int32)
        ids = rng.integers(1, vocab, (2, t)).astype(np.int32)
        tgt_mask = np.ones((2, t), np.int32)
        variables = ours.init(KEY, jnp.asarray(enc), jnp.asarray(att_mask),
                              jnp.asarray(ids), jnp.asarray(tgt_mask))
        new_vars, report = import_bertgeneration_decoder(sd, jax.device_get(variables))
        assert report["mismatched"] == 0, report

        # bypass att_embed (ours-only input projection): decode_train on the raw
        # encoder states IS the HF decoder stack
        got = ours.apply(new_vars, jnp.asarray(enc), jnp.asarray(att_mask),
                         jnp.asarray(ids), jnp.asarray(tgt_mask),
                         method=ours.decode_train)
        with torch.no_grad():
            logits = hf(input_ids=torch.tensor(ids, dtype=torch.long),
                        attention_mask=torch.tensor(tgt_mask, dtype=torch.long),
                        encoder_hidden_states=torch.tensor(enc),
                        encoder_attention_mask=torch.tensor(att_mask,
                                                            dtype=torch.long)).logits
            want = torch.log_softmax(logits, dim=-1).numpy()
        np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-4)

        # KV-cached step parity against the same imported weights
        state = ours.apply(new_vars, jnp.asarray(enc), 2,
                           method=ours.init_decode_state)
        for pos in range(t):
            logp, state = ours.apply(new_vars, jnp.asarray(ids[:, pos]), pos, state,
                                     jnp.asarray(att_mask), method=ours.decode_step)
            np.testing.assert_allclose(np.asarray(logp), want[:, pos], rtol=1e-4,
                                       atol=1e-4)

    def test_plain_encoder_checkpoint_leaves_cross_fresh(self):
        pytest.importorskip("transformers")
        from transformers import BertConfig, BertModel

        from evoke_tpu.models.causal_decoder import BertGenerationDecoder as Ours
        from evoke_tpu.models.torch_import import import_bertgeneration_decoder

        cfg = BertConfig(vocab_size=33, hidden_size=16, num_hidden_layers=2,
                         num_attention_heads=2, intermediate_size=32)
        torch.manual_seed(0)
        sd = {k: v.detach().numpy() for k, v in BertModel(cfg).state_dict().items()}
        ours = Ours(vocab_size=32, d_model=16, d_ff=32, d_vf=16, num_layers=2,
                    num_heads=2, max_seq_len=6, max_positions=64)
        rng = np.random.default_rng(0)
        enc = jnp.asarray(rng.normal(size=(1, 4, 16)), jnp.float32)
        ids = jnp.asarray(rng.integers(1, 32, (1, 6)), jnp.int32)
        variables = ours.init(KEY, enc, jnp.ones((1, 4), jnp.int32), ids,
                              jnp.ones((1, 6), jnp.int32))
        before = jax.device_get(variables)
        cross_before = np.asarray(
            before["params"]["layer_0"]["crossattention"]["wq"]["kernel"]).copy()
        head_before = np.asarray(before["params"]["lm_head"]["kernel"]).copy()
        new_vars, report = import_bertgeneration_decoder(sd, before)
        assert report["mismatched"] == 0, report
        p = new_vars["params"]
        # embeddings + self-attn + ffn loaded from the encoder checkpoint
        np.testing.assert_allclose(
            np.asarray(p["embeddings"]["word_embeddings"]["embedding"]),
            sd["embeddings.word_embeddings.weight"])
        np.testing.assert_allclose(
            np.asarray(p["layer_0"]["attention"]["wq"]["kernel"]),
            sd["encoder.layer.0.attention.self.query.weight"].T)
        # cross-attention + lm head stay freshly initialized
        np.testing.assert_allclose(
            np.asarray(p["layer_0"]["crossattention"]["wq"]["kernel"]), cross_before)
        np.testing.assert_allclose(np.asarray(p["lm_head"]["kernel"]), head_before)
