"""Pipelined serving surface: order preservation, record contract, stats."""

import jax
import numpy as np
import pytest

from evoke_tpu.core.config import DecodeConfig
from evoke_tpu.data.batching import MultiviewBatcher
from evoke_tpu.data.datasets import load_annotation, parse_finetune
from evoke_tpu.data.synthetic import write_synthetic_dataset
from evoke_tpu.data.tokenizer import WordTokenizer
from evoke_tpu.data.transforms import make_transform
from evoke_tpu.models.finetune import FinetuneModel
from evoke_tpu.serve import ReportServer, generate_stream

KEY = jax.random.key(0)


class TestGenerateStream:
    def test_order_and_depth(self):
        """Results come back in submission order with any in-flight depth."""
        calls = []

        def fake_gen(state, dev):
            calls.append(dev["n"])
            return np.full((2, 3), dev["n"])

        batches = [({"n": i}, {"_idx": i}) for i in range(7)]
        for depth in (1, 2, 4, 10):
            calls.clear()
            out = list(generate_stream(fake_gen, None, iter(batches), depth=depth))
            assert [h["_idx"] for h, _ in out] == list(range(7))
            assert [int(s[0, 0]) for _, s in out] == list(range(7))
            assert calls == list(range(7))


@pytest.mark.slow
class TestReportServer:
    def test_serve_synthetic(self, tmp_path):
        root = str(tmp_path)
        ann_path = write_synthetic_dataset(root, n_train=6, n_val=2, n_test=5,
                                           image_size=32)
        ann = load_annotation(ann_path)
        tok = WordTokenizer.train([it["report"] for it in ann["train"]])
        has_ind, no_ind = parse_finetune(ann, "test")
        examples = no_ind or has_ind
        tf = make_transform(32, train=False)
        loader = MultiviewBatcher(examples, tok, tf, n_anchor=2, max_seq_len=16,
                                  image_dir=root, shuffle=False,
                                  with_indication=False, text_field="report",
                                  add_bos_eos=True, num_workers=2)

        model = FinetuneModel(
            vocab_size=tok.get_vocab_size(), output_dim=32, encoder_hidden_size=32,
            encoder_num_layers=1, encoder_num_heads=2, encoder_intermediate_size=64,
            d_model=32, d_ff=64, num_heads=2, num_layers=1, rm_num_slots=2,
            rm_d_model=32, fusion_num_heads=2, fusion_intermediate_size=64,
            sk_fusion_num_layers=1, max_seq_len=16, drop_prob_lm=0.0)
        b0 = next(iter(loader))
        variables = jax.jit(model.init)(KEY, b0["images"], b0["ids"], b0["mask"],
                                        b0["pids"], b0["valid"])
        from evoke_tpu.train.steps import TrainState
        state = TrainState(step=0, params=variables["params"],
                           batch_stats=variables.get("batch_stats", {}),
                           opt_state=None)

        server = ReportServer(model, tok, state, DecodeConfig(beam_size=2),
                              max_seq_len=16, depth=3)
        records = server.serve(loader, with_indication=False)

        assert len(records) == len(examples)
        assert len({r["id"] for r in records}) == len(records)
        for r in records:
            assert isinstance(r["report"], str) and r["report"].strip()
            assert "gt" in r
        assert server.stats["reports"] == len(records)
        assert server.stats["reports_per_s"] > 0

        # pipelining must not change outputs: depth=1 == depth=3, same order
        server1 = ReportServer(model, tok, state, DecodeConfig(beam_size=2),
                               max_seq_len=16, depth=1)
        records1 = server1.serve(loader, with_indication=False)
        assert [r["id"] for r in records1] == [r["id"] for r in records]
        assert [r["report"] for r in records1] == [r["report"] for r in records]

        # dp-sharded serving (ReportServer mesh= -> shard_batch in
        # device_prefetch) must produce the identical records: batches shard
        # over the dp axis, params replicate, GSPMD inserts the collectives
        from evoke_tpu.core.mesh import MeshSpec, create_mesh

        mesh = create_mesh(MeshSpec(dp=2))
        server_dp = ReportServer(model, tok, state, DecodeConfig(beam_size=2),
                                 max_seq_len=16, depth=2, mesh=mesh)
        records_dp = server_dp.serve(loader, with_indication=False)
        assert [r["id"] for r in records_dp] == [r["id"] for r in records]
        assert [r["report"] for r in records_dp] == [r["report"] for r in records]
