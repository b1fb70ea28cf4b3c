"""Continuous-batching serving engine (decode/continuous.py).

Parity strategy: the engine's per-step beam math must be decode/beam.py's
exactly, with scalar time generalized to per-slot age over ring caches. The
synthetic-step tests drive the full slot lifecycle (admit -> decode -> freeze
-> harvest -> re-admit, with ring wrap-around) against per-study beam_search
goldens computed from the SAME deterministic logit function; the model tests
then prove the ring-cache decode path itself (per-row PE, ring masks, shared
physical DUS) against make_generate_step on a real tiny FinetuneModel.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from evoke_tpu.decode.beam import beam_search
from evoke_tpu.decode.continuous import (SegmentOutputs, init_carry,
                                         make_segment_fn)

KEY = jax.random.key(0)

V, EOS, BOS, PAD = 13, 2, 1, 0
K, L = 2, 10


def f_logits(code_rows, age_rows, tok):
    """Deterministic pseudo-random logits per (study code, age, prev token);
    EOS is forced at age == target_len(code) - 1 and forbidden before."""
    i = jnp.arange(V, dtype=jnp.float32)
    x = jnp.sin(code_rows[:, None] * 12.9898 + age_rows[:, None] * 78.233
                + tok[:, None] * 37.719 + i[None, :] * 3.141) * 4.0
    tlen = 3 + code_rows % 5                                  # lengths 3..7
    at_end = (age_rows[:, None] == (tlen - 1)[:, None])
    is_eos = (jnp.arange(V) == EOS)[None, :]
    x = jnp.where(at_end & is_eos, 100.0, x)
    x = jnp.where(~at_end & is_eos, -100.0, x)
    return x


def synth_dec(n_rows):
    """Minimal decode-state pytree honoring the engine's contracts
    (cross_* slot-level and skipped by the beam gather; memory row-level)."""
    return {"cross_k": (jnp.zeros((n_rows // K, 1, 1)),),
            "cross_v": (jnp.zeros((n_rows // K, 1, 1)),),
            "memory": jnp.zeros((n_rows, 1))}


def golden_for_code(code, length_penalty=""):
    def step(tok, t, dstate):
        rows = tok.shape[0]
        return (f_logits(jnp.full((rows,), code, jnp.int32),
                         jnp.full((rows,), t, jnp.int32), tok), dstate)

    res = beam_search(step, synth_dec(K), 1, bos_id=BOS, eos_id=EOS, pad_id=PAD,
                      vocab_size=V, beam_size=K, max_len=L, raw_logits=True,
                      length_penalty=length_penalty, early_stop=True)
    return np.asarray(res.seqs[0]), np.asarray(res.scores[0])


def engine_step_fn(tok, p, age_rows, dec, att_mask, aux):
    code_rows = jnp.repeat(aux, K)
    return f_logits(code_rows, age_rows, tok), dec


def run_engine(codes, slots=3, seg_steps=4, length_penalty="", pack_size=4):
    """Admit studies with the given codes through the engine; return
    {code: (seqs, scores)} harvested per ticket (ticket i <-> codes[i])."""
    seg = make_segment_fn(engine_step_fn, slots=slots, beam_size=K,
                          seg_steps=seg_steps, bos_id=BOS, eos_id=EOS,
                          pad_id=PAD, vocab_size=V, max_len=L,
                          length_penalty=length_penalty, jit=False)
    n = slots * K
    carry = init_carry(synth_dec(n), jnp.ones((slots, 1), jnp.int32),
                       slots, K, L, PAD, BOS)
    memory0 = carry["dec"]["memory"]

    packs = []
    for i in range(0, len(codes), pack_size):
        chunk = codes[i:i + pack_size]
        e = pack_size
        pk = {"cross_k": (jnp.zeros((e, 1, 1)),),
              "cross_v": (jnp.zeros((e, 1, 1)),),
              "att_mask": jnp.ones((e, 1), jnp.int32),
              "ticket": jnp.asarray(np.arange(i, i + e, dtype=np.int32)),
              "aux": jnp.asarray(np.pad(chunk, (0, e - len(chunk))).astype(np.int32))}
        packs.append([pk, 0, len(chunk)])

    results = {}
    guard = 0
    reset = True
    while len(results) < len(codes):
        guard += 1
        assert guard < 200, "engine failed to converge"
        if packs:
            pack, _, avail = packs[0]
        else:
            pack, avail = last_pack, 0
        carry, out = seg(carry, pack, jnp.int32(avail), jnp.asarray(reset),
                         memory0)
        reset = False
        last_pack = pack
        harvested = np.asarray(out.harvested)
        tickets = np.asarray(out.tickets)
        # host_meta mirrors (harvested, tickets) for the one-fetch driver
        meta_h = np.asarray(out.host_meta)
        np.testing.assert_array_equal(meta_h[:-1, 0].astype(bool), harvested)
        np.testing.assert_array_equal(meta_h[:-1, 1], tickets)
        assert meta_h[-1, 0] == int(out.n_admitted)
        for s in np.nonzero(harvested)[0]:
            t = int(tickets[s])
            results[codes[t]] = (np.asarray(out.seqs[s]), np.asarray(out.scores[s]))
            np.testing.assert_array_equal(np.asarray(out.best_seq[s]),
                                          np.asarray(out.seqs[s, 0]))
        pack_pos = int(meta_h[-1, 1])
        if packs and pack_pos >= packs[0][2]:
            packs.pop(0)
            reset = True
    return results


class TestEngineVsBeamSearch:
    def test_lifecycle_parity(self):
        """7 studies through 3 slots (re-admission + ring wrap): every study's
        tokens and scores equal per-study beam_search on the same logits."""
        codes = [0, 1, 2, 3, 4, 5, 6]
        results = run_engine(codes)
        assert sorted(results) == codes
        for c in codes:
            g_seq, g_score = golden_for_code(c)
            e_seq, e_score = results[c]
            np.testing.assert_array_equal(e_seq, g_seq, err_msg=f"code {c}")
            np.testing.assert_allclose(e_score, g_score, rtol=0, atol=1e-5,
                                       err_msg=f"code {c}")

    def test_length_penalty_parity(self):
        codes = [0, 3, 6, 2]
        results = run_engine(codes, slots=2, seg_steps=3,
                             length_penalty="avg_1")
        for c in codes:
            g_seq, g_score = golden_for_code(c, length_penalty="avg_1")
            e_seq, e_score = results[c]
            np.testing.assert_array_equal(e_seq, g_seq, err_msg=f"code {c}")
            np.testing.assert_allclose(e_score, g_score, rtol=0, atol=1e-5)

    def test_admission_accounting(self):
        """Free slots admit FIFO; totals match; inactive slots never harvest."""
        seg = make_segment_fn(engine_step_fn, slots=4, beam_size=K, seg_steps=2,
                              bos_id=BOS, eos_id=EOS, pad_id=PAD, vocab_size=V,
                              max_len=L, jit=False)
        carry = init_carry(synth_dec(8), jnp.ones((4, 1), jnp.int32), 4, K, L,
                           PAD, BOS)
        memory0 = carry["dec"]["memory"]
        pk = {"cross_k": (jnp.zeros((3, 1, 1)),),
              "cross_v": (jnp.zeros((3, 1, 1)),),
              "att_mask": jnp.ones((3, 1), jnp.int32),
              "ticket": jnp.asarray([10, 11, 12], jnp.int32),
              "aux": jnp.asarray([0, 1, 2], jnp.int32)}
        carry, out = seg(carry, pk, jnp.int32(2), jnp.asarray(True), memory0)
        assert int(out.n_admitted) == 2          # avail caps admission
        assert not np.asarray(out.harvested).any()
        assert np.asarray(carry["active"]).sum() == 2
        assert list(np.asarray(carry["ticket"])[:2]) == [10, 11]
        assert int(carry["pack_pos"]) == 2       # device-side consumption offset
        # no reset: the next segment resumes from the carry's pack_pos
        carry, out = seg(carry, pk, jnp.int32(3), jnp.asarray(False), memory0)
        assert int(out.n_admitted) == 1          # remaining row fills slot 2
        assert np.asarray(carry["active"]).sum() == 3
        assert int(np.asarray(out.host_meta)[-1, 1]) == 3


def _tiny_setup(tmp_path, n_test=5, beam=2):
    from evoke_tpu.data.batching import MultiviewBatcher
    from evoke_tpu.data.datasets import load_annotation, parse_finetune
    from evoke_tpu.data.synthetic import write_synthetic_dataset
    from evoke_tpu.data.tokenizer import WordTokenizer
    from evoke_tpu.data.transforms import make_transform
    from evoke_tpu.models.finetune import FinetuneModel
    from evoke_tpu.train.steps import TrainState

    root = str(tmp_path)
    ann_path = write_synthetic_dataset(root, n_train=6, n_val=2, n_test=n_test,
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
    state = TrainState(step=0, params=variables["params"],
                       batch_stats=variables.get("batch_stats", {}),
                       opt_state=None)
    return model, tok, state, loader, examples


@pytest.mark.slow
class TestContinuousServerModel:
    def test_matches_batched_generate(self, tmp_path):
        """ContinuousServer reports == make_generate_step reports per study:
        the ring-cache decode path (per-row PE, ring masks, shared DUS) is
        output-identical to the scalar-pos batch path, including for studies
        admitted at t > 0 (rotated rings)."""
        from evoke_tpu.core.config import DecodeConfig
        from evoke_tpu.decode.continuous import ContinuousServer
        from evoke_tpu.train.steps import make_generate_step

        model, tok, state, loader, examples = _tiny_setup(tmp_path)
        gen = make_generate_step(model, tok, DecodeConfig(beam_size=2), 16,
                                 with_indication=False)
        golden = {}
        for b in loader:
            dev = {k: v for k, v in b.items() if not k.startswith("_")}
            seqs = np.asarray(gen(state, dev))
            texts = tok.decode_batch(seqs.tolist())
            valid = np.asarray(b["valid"])
            for i, iid in enumerate(b["_image_ids"]):
                if valid[i]:
                    golden[iid] = texts[i]

        server = ContinuousServer(model, tok, state, max_seq_len=16, slots=2,
                                  beam_size=2, seg_steps=4)
        records, stats = server.serve(loader)
        assert len(records) == len(golden) == len(examples)
        for rec in records:
            assert rec["report"] == golden[rec["id"]], rec["id"]
            assert "gt" in rec
        assert stats["reports"] == len(records)
        assert stats["reports_per_s"] > 0
        # per-study submit->harvest latency (the serving p50 the bench reports)
        assert stats["study_p50_ms"] > 0
        assert stats["study_p90_ms"] >= stats["study_p50_ms"]

    def test_ancestor_mode_matches_reorder(self, tmp_path, monkeypatch):
        """beam_kv='ancestor' (ring lineage tables advanced at the physical
        write slot, anc+age combined masks) serves token-identical reports to
        the reorder engine — through both the XLA ancestor formulation and
        the Pallas ring kernel (interpret mode on CPU)."""
        from evoke_tpu.decode.continuous import ContinuousServer

        model, tok, state, loader, examples = _tiny_setup(tmp_path)
        base = ContinuousServer(model, tok, state, max_seq_len=16, slots=2,
                                beam_size=2, seg_steps=4)
        recs, _ = base.serve(loader)
        golden = {r["id"]: r["report"] for r in recs}
        assert len(golden) == len(examples)
        for kernel in ("xla", "pallas"):
            monkeypatch.setenv("EVOKE_LINEAGE_KERNEL", kernel)
            anc = ContinuousServer(model, tok, state, max_seq_len=16, slots=2,
                                   beam_size=2, seg_steps=4,
                                   beam_kv="ancestor")
            arecs, _ = anc.serve(loader)
            assert {r["id"]: r["report"] for r in arecs} == golden, kernel

    def test_retrace_on_new_loader_width(self, tmp_path):
        """A second serve() with a DIFFERENT loader batch width must cleanly
        re-trace the segment, not crash. The original design stored the
        weight-carrying tstate in a Python cell written at trace time
        (`cell[0] = tstate`); the first trace's tracer leaked into any
        re-trace and raised UnexpectedTracerError. The step closure is now
        built inside the traced function, capturing tstate lexically."""
        from evoke_tpu.data.batching import MultiviewBatcher
        from evoke_tpu.data.transforms import make_transform
        from evoke_tpu.decode.continuous import ContinuousServer

        model, tok, state, loader, examples = _tiny_setup(tmp_path)
        srv = ContinuousServer(model, tok, state, max_seq_len=16, slots=2,
                               beam_size=2, seg_steps=4)
        recs1, _ = srv.serve(loader)
        tf = make_transform(32, train=False)
        loader3 = MultiviewBatcher(examples, tok, tf, n_anchor=3,
                                   max_seq_len=16, image_dir=str(tmp_path),
                                   shuffle=False, with_indication=False,
                                   text_field="report", add_bos_eos=True,
                                   num_workers=2)
        recs2, _ = srv.serve(loader3)   # different pack width -> retrace
        assert ({r["id"]: r["report"] for r in recs1}
                == {r["id"]: r["report"] for r in recs2})

    def test_rotation_invariance(self, tmp_path):
        """The same study admitted at different ring offsets produces the
        same report (single-slot engine => every study after the first is
        rotated differently)."""
        from evoke_tpu.decode.continuous import ContinuousServer

        model, tok, state, loader, examples = _tiny_setup(tmp_path, n_test=3)
        a = ContinuousServer(model, tok, state, max_seq_len=16, slots=1,
                             beam_size=2, seg_steps=3)
        b = ContinuousServer(model, tok, state, max_seq_len=16, slots=2,
                             beam_size=2, seg_steps=5)
        ra, _ = a.serve(loader)
        rb, _ = b.serve(loader)
        assert {r["id"]: r["report"] for r in ra} == \
               {r["id"]: r["report"] for r in rb}

    def test_pack_fusion_invariance(self, tmp_path):
        """Fusing loader batches into wide admission packs (pack_batches>1,
        valid rows compacted over ragged tails, short tail group padded)
        changes nothing about the records — only how often the host switches
        the pack argument."""
        from evoke_tpu.decode.continuous import ContinuousServer

        model, tok, state, loader, examples = _tiny_setup(tmp_path)
        a = ContinuousServer(model, tok, state, max_seq_len=16, slots=2,
                             beam_size=2, seg_steps=4, dispatch_segs=1,
                             pack_batches=1)
        ra, _ = a.serve(loader)
        assert len(ra) == len(examples)
        b = ContinuousServer(model, tok, state, max_seq_len=16, slots=2,
                             beam_size=2, seg_steps=4, dispatch_segs=2,
                             pack_batches=3)
        rb, st = b.serve(loader)
        assert {r["id"]: r["report"] for r in ra} == \
               {r["id"]: r["report"] for r in rb}
        # every harvested study has an admit->harvest service measurement,
        # bounded by the queue-inclusive submit->harvest latency
        assert st["service_p50_ms"] > 0
        assert st["service_p50_ms"] <= st["study_p50_ms"] + 1e-6

    def test_forced_length_hooks_agree_across_engines(self, tmp_path):
        """The load-testing hooks (make_generate_step(logits_hook=...) and
        ContinuousServer(step_wrapper=...)) force per-study lengths, and the
        two engines decode the IDENTICAL workload to identical tokens — the
        contract bench.py's engine A/B rests on."""
        from evoke_tpu.core.config import DecodeConfig
        from evoke_tpu.decode.continuous import ContinuousServer
        from evoke_tpu.train.steps import make_generate_step

        model, tok, state, loader, examples = _tiny_setup(tmp_path, n_test=5)
        eos = tok.eos_id
        targets = {ex.id: 3 + (i % 4) for i, ex in enumerate(examples)}

        def force(scores, age_rows, tgt_rows):
            isv = jnp.arange(scores.shape[1]) == eos
            at_end = (age_rows == tgt_rows - 1)[:, None] & isv[None]
            before = (age_rows < tgt_rows - 1)[:, None] & isv[None]
            big = jnp.asarray(3e4, scores.dtype)
            return jnp.where(at_end, big, jnp.where(before, -big, scores))

        def hook(scores, tok_ids, pos, batch):
            tgt = jnp.repeat(batch["target_len"],
                             scores.shape[0] // batch["target_len"].shape[0])
            return force(scores, jnp.full(scores.shape[:1], pos, jnp.int32), tgt)

        gen = make_generate_step(model, tok, DecodeConfig(beam_size=2), 16,
                                 with_indication=False, logits_hook=hook)
        golden = {}
        for b in loader:
            dev = {k: v for k, v in b.items() if not k.startswith("_")}
            valid = np.asarray(b["valid"])
            tl = np.asarray([targets.get(iid, 5) for iid in b["_image_ids"]],
                            np.int32)
            seqs = np.asarray(gen(state, dict(dev, target_len=jnp.asarray(tl))))
            for i, iid in enumerate(b["_image_ids"]):
                if valid[i]:
                    row = seqs[i]
                    n = int((row == eos).argmax()) + 1
                    assert n == targets[iid], (iid, n, targets[iid])
                    golden[iid] = tok.decode(row.tolist())

        def step_wrapper(raw_step):
            def step(tok_ids, p, age_rows, dec, att_mask, aux, tstate):
                logits, dec = raw_step(tok_ids, p, age_rows, dec, att_mask,
                                       aux, tstate)
                return force(logits, age_rows, jnp.repeat(aux, 2)), dec
            return step

        class _AuxLoader:
            def __iter__(self):
                for b in loader:
                    yield dict(b, _aux=np.asarray(
                        [targets.get(iid, 5) for iid in b["_image_ids"]],
                        np.int32))

        srv = ContinuousServer(model, tok, state, max_seq_len=16, slots=2,
                               beam_size=2, seg_steps=3,
                               step_wrapper=step_wrapper)
        recs, _ = srv.serve(_AuxLoader())
        assert {r["id"]: r["report"] for r in recs} == golden

    def test_forced_length_topk_hooks_fused_tail(self, tmp_path, monkeypatch):
        """The FUSED-tail forcing surface (make_generate_step(topk_hook=...) /
        ContinuousServer(topk_wrapper=...)): per-study lengths are honored
        exactly and the two engines decode the identical forced workload to
        identical records, with the fused vocab tail forced on (interpret on
        CPU) — the contract the bench A/B's production-kernel mode rests on.
        (Token-level agreement with the logits_hook forcing is NOT asserted:
        the logits_hook changes the per-row normalizer, so the two forcing
        styles rank the forced-EOS candidates differently by construction.)"""
        from evoke_tpu.core.config import DecodeConfig
        from evoke_tpu.decode.continuous import ContinuousServer
        from evoke_tpu.train.steps import make_generate_step

        monkeypatch.setenv("EVOKE_LOGIT_TOPK", "fused")
        model, tok, state, loader, examples = _tiny_setup(tmp_path, n_test=5)
        eos = tok.eos_id
        targets = {ex.id: 3 + (i % 4) for i, ex in enumerate(examples)}

        def force_topk(vals, idx, age_rows, tgt_rows):
            at_end = (age_rows == tgt_rows - 1)[:, None]
            big = jnp.asarray(3e4, vals.dtype)
            vals = jnp.where((idx == eos) & ~at_end, -big, vals)
            col0 = jnp.arange(idx.shape[1])[None, :] == 0
            vals = jnp.where(at_end, jnp.where(col0, big, -big), vals)
            idx = jnp.where(at_end & col0, eos, idx)
            return vals, idx

        def topk_hook(vals, idx, lse, tok_ids, pos, batch):
            tgt = jnp.repeat(batch["target_len"],
                             vals.shape[0] // batch["target_len"].shape[0])
            return force_topk(vals, idx,
                              jnp.full(vals.shape[:1], pos, jnp.int32), tgt)

        gen = make_generate_step(model, tok, DecodeConfig(beam_size=2), 16,
                                 with_indication=False, topk_hook=topk_hook)
        golden = {}
        for b in loader:
            dev = {k: v for k, v in b.items() if not k.startswith("_")}
            valid = np.asarray(b["valid"])
            tl = np.asarray([targets.get(iid, 5) for iid in b["_image_ids"]],
                            np.int32)
            seqs = np.asarray(gen(state, dict(dev, target_len=jnp.asarray(tl))))
            for i, iid in enumerate(b["_image_ids"]):
                if valid[i]:
                    row = seqs[i]
                    n = int((row == eos).argmax()) + 1
                    assert n == targets[iid], (iid, n, targets[iid])
                    golden[iid] = tok.decode(row.tolist())

        def topk_wrapper(vals, idx, lse, age_rows, aux):
            return force_topk(vals, idx, age_rows, jnp.repeat(aux, 2))

        class _AuxLoader:
            def __iter__(self):
                for b in loader:
                    yield dict(b, _aux=np.asarray(
                        [targets.get(iid, 5) for iid in b["_image_ids"]],
                        np.int32))

        # a step_wrapper is ALSO passed (as bench.py does) — the fused path
        # must pick topk_wrapper and ignore it, not fall back to unfused
        def boom(raw_step):  # pragma: no cover - must never be called
            def step(*a):
                raise AssertionError("unfused step_wrapper used on fused path")
            return step

        srv = ContinuousServer(model, tok, state, max_seq_len=16, slots=2,
                               beam_size=2, seg_steps=3,
                               step_wrapper=boom, topk_wrapper=topk_wrapper)
        recs, _ = srv.serve(_AuxLoader())
        got = {r["id"]: r["report"] for r in recs}
        assert got == golden
