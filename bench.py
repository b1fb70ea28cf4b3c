"""Throughput benchmark: the full BASELINE.json metric on one chip.

Measures, on the flagship FinetuneModel (ResNet-101 + wide multiview fusion +
indication co-attention + KV-cached relational-memory beam decoder, bfloat16),
ALL FIVE metric families in one budgeted run (VERDICT r2 weak #1):

1. 224 decode: per-call reports/s + p50 batch latency;
2. 224 steady-state (pipelined) reports/s + p50 PER-STUDY latency at the
   serving depth (submit->result-ready, depth-2 in flight — the latency a
   study actually experiences, not the bare batch compute time);
3. 384 decode, same measurements;
4. train-step studies/sec;
5. an ANALYTIC roofline per decode config: FLOPs + HBM bytes from the model
   dimensions (no re-trace, no cost_analysis undercount), reported as % of
   v5e peak (197 TFLOP/s bf16, 819 GB/s HBM) next to the measured times;
6. a serving-engine A/B on a MIMIC-like length mix (batch engine pays
   max-of-batch, the continuous engine pays ~mean occupancy) with forced
   per-study lengths — identical workload, full model compute per step.

Prints one JSON line PER measurement; the LAST line is the headline 224
number with ``vs_baseline`` pinned to round 1's 235.216 reports/s.
``bench.py --pipeline`` instead benchmarks the real input pipeline
end-to-end; ``--profile`` / ``--profile-train`` emit device-trace digests.

Timing is per call with a host sync: async-loop timing over-reports through
the remote TPU runtime (measured round 1: artifacts up to 20x).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

# Round-1 headline (reports/sec/chip @224 beam=3 batch 32, TPU v5e-1, BENCH_r01.json).
BASELINE_RPS = 235.216
# TPU v5e (v5 lite) peak bf16 matmul throughput / HBM bandwidth per chip.
PEAK_FLOPS = 197e12
PEAK_HBM = 819e9

GEN_LEN = 100
# Real-vocab default (VERDICT r2 weak #8): the reference trains its WordLevel
# tokenizer with the tokenizers library's default 30000 vocab cap and NO
# minimum frequency (reference modules/tokenizers_new.py:36-41); MIMIC-CXR's
# raw unique-word count exceeds that, so the cap binds. Rounds 1-2 modeled
# vocab=4000 (an R2Gen-style thresholded vocab the reference does not use).
# Override with BENCH_VOCAB when a measured corpus size is available.
VOCAB = int(os.environ.get("BENCH_VOCAB", 30000))


def _emit(metric, value, unit, vs=None):
    # `is not None`, not truthiness: a degraded round legitimately reports
    # vs_baseline 0.0 (a falsy test silently rewrote it to 1.0)
    print(json.dumps({"metric": metric, "value": round(value, 3), "unit": unit,
                      "vs_baseline": round(vs, 3) if vs is not None else 1.0}),
          flush=True)


def _p50(fn, iters):
    lats = []
    for _ in range(iters):
        t0 = time.perf_counter()
        fn()
        lats.append(time.perf_counter() - t0)
    return float(np.percentile(np.asarray(lats), 50))


def _tree_params(tree) -> int:
    import jax

    return int(sum(int(np.prod(l.shape)) for l in jax.tree_util.tree_leaves(tree)))


def analytic_decode_model(variables, model, image_size, n_images, n_anchor, beam,
                          steps, schedule, vocab, inc_len=GEN_LEN,
                          beam_kv="reorder"):
    """Analytic FLOPs + HBM bytes for ONE decode call (VERDICT r2 weak #2).

    Replaces XLA cost_analysis (a re-trace that also counts while-loop bodies
    once). Two parts:

    - **loop** (exact up to XLA scheduling): per step t with allocated cache
      length L_t (the phased schedule), N = batch x beam rows, d = d_model,
      Ld = decoder layers:
        FLOPs = 2*N*step_params + 4*N*L_t*d (self-attn dots) + 4*N*P*d (cross)
        bytes = 4*step_params_f32 + 2*step_params_bf16
                                     (batch-shared weight reads; XLA hoists the
                                      promote_dtype f32->bf16 cast of the
                                      loop-invariant dtype-consumed weights out
                                      of the while-loop — verified empirically:
                                      a storage-only bf16 cast of those weights
                                      changed throughput by 0.0%, DESIGN 5c —
                                      so the loop reads them at 2 bytes; only
                                      f32-MATH weights (CLN MLPs, RM) are read
                                      at 4)
              + c * [4*Ld*N*L_t*d]   (bf16 K+V; c = cache passes per step:
                                      reorder mode 3 — attention read 1x,
                                      beam reorder gather read+write 2x;
                                      ancestor mode 1 — the Pallas lineage
                                      kernel reads each sample's block once
                                      and nothing is rewritten, plus the
                                      int32 anc-table read per layer)
              + 4*Ld*N*P*d           (bf16 cross K/V read)
              + 3*N*vocab*2          (bf16 logits write + logsumexp read +
                                      per-beam top-k read; the raw-logits
                                      two-stage beam never materializes f32
                                      log-probs — decode/beam.py)
      where step_params = decoder params minus the token embedding (a gather)
      and minus the patch-encoder stack (runs once, not per step).

    - **encoder** (documented estimate): torchvision resnet101 = 7.80 GMACs
      at 224 scaled by spatial area, plus 2 * params * tokens for each dense
      submodule (fusion q/o over anchor tokens, k/v over all view tokens,
      heads/co-attention over anchor tokens, text encoder over indication
      tokens, decoder patch-encoder over patches).
    """
    p = variables["params"]
    P = (image_size // 32) ** 2
    d = model.d_model
    layers = model.num_layers
    N = n_anchor * beam
    T_anchor = n_anchor * (1 + P)
    T_all = n_images * (1 + P)

    groups = {"resnet": 0, "text_encoder": 0, "fusion_qo": 0, "fusion_kv": 0,
              "heads": 0, "coattn": 0, "dec_encoder": 0, "dec_embed": 0,
              "dec_step": 0, "dec_step_bf16": 0, "other": 0}
    # per-step weights XLA reads at 2 bytes: consumed through a hoisted
    # promote_dtype cast (nn.Dense/MHA/FFN built WITH dtype=bfloat16); the
    # f32-MATH weights (RM, CLN offset MLPs, LNs) stay 4-byte reads — the
    # CLN-MLPs-at-bf16 variant measured NEUTRAL and was rejected (DESIGN 5n;
    # EVOKE_CLN_MLP=dtype opts in)
    bf16_consumed = ("/wq/", "/wk/", "/wv/", "/wo/", "/ff/", "/logit/")
    if os.environ.get("EVOKE_CLN_MLP", "f32") == "dtype":
        bf16_consumed += ("/mlp_gamma_", "/mlp_beta_")
    import jax
    import jax.numpy as jnp

    model_bf16 = getattr(model, "dtype", None) == jnp.bfloat16

    for path, leaf in jax.tree_util.tree_flatten_with_path(p)[0]:
        keys = [str(getattr(k, "key", k)) for k in path]
        joined = "/".join(keys)
        size = int(np.prod(leaf.shape))
        if "visual_extractor" in joined:
            groups["resnet"] += size
        elif "text_encoder" in joined:
            groups["text_encoder"] += size
        elif "fusion" in joined and ("fc_q" in joined or "fc_o" in joined):
            groups["fusion_qo"] += size
        elif "fusion" in joined and ("fc_k" in joined or "fc_v" in joined):
            groups["fusion_kv"] += size
        elif "visual_head" in joined or "text_head" in joined:
            groups["heads"] += size
        elif "multimodal_fusion_layers" in joined or "visual_self_atten" in joined:
            groups["coattn"] += size
        elif "text_decoder" in joined:
            if "embed" in joined and leaf.ndim == 2 and vocab - 2 <= leaf.shape[0] <= vocab + 2:
                groups["dec_embed"] += size
            elif "/enc_" in joined or joined.endswith("att_embed/kernel"):
                groups["dec_encoder"] += size
            elif model_bf16 and "/rm/" not in "/" + joined + "/" and any(
                    m in "/" + joined + "/" for m in bf16_consumed):
                groups["dec_step_bf16"] += size
            else:
                groups["dec_step"] += size
        else:
            groups["other"] += size

    # ---- encoder ----
    flops_enc = 2 * 7.80e9 * (image_size / 224.0) ** 2 * n_images      # ResNet-101
    flops_enc += 2 * groups["fusion_qo"] * T_anchor
    flops_enc += 2 * groups["fusion_kv"] * T_all
    # fusion attention dots: per anchor, (1+P) queries over its study's view
    # tokens (~T_all/n_anchor), at h*dh inner dim (wide: 8*2048)
    dh_total = (model.fusion_num_heads * model.d_vf if model.fusion_wide_qkv
                else model.d_vf)
    flops_enc += 4 * T_anchor * (T_all / max(n_anchor, 1)) * dh_total
    flops_enc += 2 * (groups["heads"] + groups["coattn"]) * T_anchor
    flops_enc += 2 * groups["text_encoder"] * n_anchor * inc_len
    flops_enc += 2 * groups["dec_encoder"] * n_anchor * P

    # ---- loop ----
    sched = list(schedule)
    l_alloc = []
    lo = 0
    for seg_end in sched:
        l_alloc += [seg_end] * (seg_end - lo)
        lo = seg_end
    l_sum = sum(l_alloc[:steps])

    step_params = groups["dec_step"] + groups["dec_step_bf16"]
    flops_loop = (2 * N * step_params * steps
                  + 4 * N * d * l_sum
                  + 4 * N * P * d * steps)
    if beam_kv == "ancestor":
        # Pallas lineage kernel: K+V read once (block-diagonal masked scores
        # compute beam x more dot work inside VMEM, add those FLOPs), the
        # slot write is N*d per array per step, and the int32 ancestor table
        # is read per layer per step
        cache_bytes = ((4 * layers * N * d) * l_sum
                       + (4 * layers * N * d) * steps
                       + 4 * layers * N * l_sum)
        flops_loop += 4 * N * d * l_sum * (beam - 1)
    else:
        cache_bytes = 3 * (4 * layers * N * d) * l_sum
    bytes_loop = ((4 * groups["dec_step"] + 2 * groups["dec_step_bf16"]) * steps
                  + cache_bytes
                  + (4 * layers * n_anchor * P * d) * steps
                  + 3 * N * vocab * 2 * steps)
    return {"flops_enc": flops_enc, "flops_loop": flops_loop,
            "bytes_loop": bytes_loop, "steps": steps, "groups": groups}


def _steps_executed(seqs, eos_id, max_len) -> int:
    """Loop iterations actually run = the last row to finish (early-stop exits
    when ALL rows are done)."""
    seqs = np.asarray(seqs)
    is_eos = seqs == eos_id
    lens = np.where(is_eos.any(-1), is_eos.argmax(-1) + 1, max_len)
    return int(lens.max())


def bench_decode(image_size, batch_sizes, iters, deadline=None):
    import jax

    from evoke_tpu.core.config import DecodeConfig
    from evoke_tpu.train.steps import (TrainState, make_generate_step,
                                       resolve_beam_kv)
    from __graft_entry__ import _example_batch, _flagship

    class _Tok:
        bos_id, eos_id, pad_id, unk_id = VOCAB - 2, VOCAB - 1, 0, 4

        def get_vocab_size(self):
            return VOCAB

    model = _flagship(vocab_size=VOCAB)
    rng = np.random.default_rng(0)
    # phased-growth sweep under the ancestor serving default (224 b64):
    # 471/471/501/547/522/538/504 r/s at phases 1/2/4/8/10/12/16 — 8 peaks
    phases = int(os.environ.get("BENCH_CACHE_PHASES", 8))
    cfg = DecodeConfig(beam_size=3, cache_phases=phases)
    beam_kv = resolve_beam_kv(cfg, serving=True)  # ancestor+Pallas on TPU
    gen = make_generate_step(model, _Tok(), cfg, GEN_LEN, with_indication=True,
                             serving=True)
    schedule = tuple(-(-GEN_LEN * i // phases) for i in range(1, phases + 1)) \
        if phases > 1 else (GEN_LEN,)

    best = None
    variables = None
    for b in batch_sizes:
        if best is not None and deadline is not None and time.perf_counter() > deadline:
            print(f"# decode {image_size}px batch {b} skipped: budget spent",
                  file=sys.stderr)
            continue
        batch = _example_batch(rng, b, b, image_size, GEN_LEN, VOCAB)
        if variables is None:
            # warmup init = the CANONICAL param tree (traces both indication
            # branches, so it carries the no-indication visual_self_atten
            # params the plain indication forward never creates). Decode
            # ignores the extras (flax tolerates unused params; XLA DCEs
            # them), and the train tail that shares this tree then hits the
            # SAME compile-cache entries as the standalone train family —
            # a default-__call__ init here changed the opt_state pytree and
            # forced a cold multi-minute train-step compile in the child.
            variables = jax.jit(lambda k, d=batch: model.init(
                k, d["images"], d["ids"], d["mask"], d["pids"], d["valid"],
                d["inc_ids"], d["inc_mask"], method=model.warmup))(jax.random.key(0))
        state = TrainState(step=0, params=variables["params"],
                           batch_stats=variables.get("batch_stats", {}), opt_state=None)
        # device-resident inputs: steady-state serving rate (host->device overlap
        # is the input pipeline's job; see --pipeline mode)
        batch = jax.device_put(batch)
        try:
            seqs = gen(state, batch)  # compile + warmup
            seqs.block_until_ready()
            seqs_h = np.asarray(seqs)
            assert (seqs_h != 0).any(), "generation produced only PAD"
            # np.asarray forces a real host sync: block_until_ready alone has
            # been observed returning early through the remote runtime
            p50 = _p50(lambda: np.asarray(gen(state, batch)), iters)
        except Exception as e:  # OOM at large batch: skip, keep smaller configs
            print(f"# decode {image_size}px batch {b} skipped: {type(e).__name__}",
                  file=sys.stderr)
            continue
        rps = b / p50
        _emit(f"reports/sec/chip @ {image_size}px beam=3 len={GEN_LEN} (bf16, "
              f"vocab {VOCAB}, batch {b}, p50 batch latency {p50 * 1e3:.1f} ms)",
              rps, "reports/s",
              vs=rps / BASELINE_RPS if image_size == 224 else None)

        # steady-state serving rate + per-study latency at bounded depth
        # (submit->result-ready with 2 calls in flight, the ReportServer
        # regime). Per-batch because device time grows super-linearly with
        # batch (KV-cache bandwidth): the per-call-best batch is not
        # necessarily the steady-state-best one.
        from collections import deque
        n_calls, depth = 8, 2
        lats, q = [], deque()
        t0 = time.perf_counter()
        for _ in range(n_calls):
            q.append((time.perf_counter(), gen(state, batch)))
            if len(q) > depth:
                ts, out = q.popleft()
                np.asarray(out)
                lats.append(time.perf_counter() - ts)
        while q:
            ts, out = q.popleft()
            np.asarray(out)
            lats.append(time.perf_counter() - ts)
        wall = time.perf_counter() - t0
        steady = b * n_calls / wall
        study_p50 = float(np.percentile(np.asarray(lats), 50))
        _emit(f"steady-state reports/sec/chip @ {image_size}px beam=3 len={GEN_LEN} "
              f"(bf16, vocab {VOCAB}, batch {b}, pipelined x{n_calls})",
              steady, "reports/s",
              vs=steady / BASELINE_RPS if image_size == 224 else None)
        _emit(f"p50 per-study report latency @ {image_size}px beam=3 (batch {b}, "
              f"depth {depth} in flight, submit->ready)", study_p50 * 1e3, "ms")

        # analytic roofline for THIS config. The FLOPs/bytes side is free (no
        # retrace); splitting encoder vs loop time needs one extra jit of the
        # encoder half, which costs a compile on a cold cache — only attempted
        # while budget remains (BENCH_ENC_TIME=0 disables it outright). With
        # no split, the whole batch time bounds the loop time from above, so
        # the emitted utilization is a LOWER bound (stated in the metric).
        steps = _steps_executed(seqs_h, _Tok.eos_id, GEN_LEN)
        ana = analytic_decode_model(variables, model, image_size, 2 * b, b, 3,
                                    steps, schedule, VOCAB, beam_kv=beam_kv)
        t_batch = b / steady
        t_enc = None
        # cold-cache encoder compiles through the tunnel run 5-10 min; only
        # attempt the split when meaningful budget remains (the persistent
        # compile cache makes warm attempts ~seconds)
        enc_min = float(os.environ.get("BENCH_ENC_MIN_S", 60))
        if os.environ.get("BENCH_ENC_TIME", "1") != "0" and (
                deadline is None or time.perf_counter() < deadline - enc_min):
            try:
                t_enc = _encoder_time(model, variables, state, batch, b, iters)
            except Exception as e:
                print(f"# encoder timing failed: {type(e).__name__}", file=sys.stderr)
        mfu = (ana["flops_enc"] + ana["flops_loop"]) / t_batch / PEAK_FLOPS
        t_loop = max(t_batch - t_enc, 1e-4) if t_enc is not None else t_batch
        hbm_util = ana["bytes_loop"] / t_loop / PEAK_HBM
        loop_mfu = ana["flops_loop"] / t_loop / PEAK_FLOPS
        split = (f"measured {t_loop * 1e3:.1f} ms loop, encoder {t_enc * 1e3:.1f} ms"
                 if t_enc is not None else
                 f"loop time bounded by whole-batch {t_batch * 1e3:.1f} ms -> "
                 "utilization is a lower bound")
        _emit(f"decode-loop HBM utilization @ {image_size}px (analytic "
              f"{ana['bytes_loop'] / 1e9:.2f} GB over {steps} steps / {split}; "
              f"MFU {mfu * 100:.1f}% overall, {loop_mfu * 100:.2f}% in-loop)",
              hbm_util * 100, "% of 819 GB/s")
        row = dict(batch=b, p50_ms=p50 * 1e3, rps=rps, steady_rps=steady,
                   study_p50_ms=study_p50 * 1e3, hbm_util=hbm_util, mfu=mfu)
        if best is None or steady > best["steady_rps"]:
            best = row
    return best, model, variables


def _encoder_time(model, variables, state, batch, n_anchor, iters) -> float:
    """Steady-state device time of the encoder half (encode_for_decode) —
    splits the decode call into encoder vs loop without a profiler. Measured
    PIPELINED (N submissions, one sync) like the decode steady-state: a
    per-call median would include the remote runtime's ~20 ms dispatch
    overhead and over-attribute time to the encoder (seen: 51 ms per-call vs
    24 ms in the device trace)."""
    import jax

    from evoke_tpu.train.steps import maybe_normalize_images

    @jax.jit
    def enc_only(state, batch):
        # state MUST be an argument: closing over it would embed 300M params
        # as compile-time constants and blow up XLA constant folding
        b = maybe_normalize_images(batch)
        return model.apply({"params": state.params, "batch_stats": state.batch_stats},
                           b["images"], b["pids"], b["valid"], n_anchor,
                           b["inc_ids"], b["inc_mask"],
                           method=model.encode_for_decode)

    out = enc_only(state, batch)  # compile + warm
    jax.block_until_ready(out)
    n_calls = max(4 * iters, 8)
    t0 = time.perf_counter()
    outs = [enc_only(state, batch) for _ in range(n_calls)]
    for o in outs:
        jax.block_until_ready(o)
    return (time.perf_counter() - t0) / n_calls


def bench_engines(image_size, deadline=None, model=None, init_variables=None):
    """Serving-engine A/B on a controlled length mix: batch vs continuous.

    Real serving decodes variable-length reports; the batch engine
    (serve.ReportServer) holds every slot until its batch's SLOWEST study
    finishes, while the continuous engine (decode/continuous.py) re-admits
    freed slots at segment boundaries, so its loop occupancy tracks the MEAN
    length. Per-study lengths are forced through the load-testing hooks
    (make_generate_step(logits_hook=...) / ContinuousServer(step_wrapper=...))
    so both engines decode the IDENTICAL workload with full model compute per
    step. Mix: clipped lognormal (median 55 tokens, sigma 0.45, clip
    [15, GEN_LEN]) — MIMIC-like report lengths; mean ~58, ~9% hit the cap,
    so nearly every batch of 64 pays the full GEN_LEN while the continuous
    engine pays ~mean.
    """
    import jax
    import jax.numpy as jnp
    from collections import deque

    from evoke_tpu.core.config import DecodeConfig
    from evoke_tpu.decode.continuous import ContinuousServer
    from evoke_tpu.train.steps import TrainState, make_generate_step
    from __graft_entry__ import _example_batch, _flagship

    class _Tok:
        bos_id, eos_id, pad_id, unk_id = VOCAB - 2, VOCAB - 1, 0, 4

        def get_vocab_size(self):
            return VOCAB

        def decode(self, ids):
            # one char per token up to and including EOS (PAD-stripped), so
            # len(report) == the study's decoded token count
            n = 0
            for t in ids:
                n += 1
                if t == self.eos_id:
                    break
            return "x" * n

    beam = 3
    b = int(os.environ.get("BENCH_SLOTS", 64))
    seg_steps = int(os.environ.get("BENCH_SEG_STEPS", 10))
    n_passes = max(int(os.environ.get("BENCH_ENGINE_STUDIES", 1024)) // b, 2)
    n_studies = n_passes * b
    mix = np.clip(np.round(np.random.default_rng(7).lognormal(
        np.log(55.0), 0.45, n_studies)), 15, GEN_LEN).astype(np.int32)
    tl = mix.reshape(n_passes, b)
    eos = _Tok.eos_id

    model = model or _flagship(vocab_size=VOCAB)
    batch = _example_batch(np.random.default_rng(0), b, b, image_size, GEN_LEN, VOCAB)
    if init_variables is None:
        init_variables = jax.jit(lambda k, d=batch: model.init(
            k, d["images"], d["ids"], d["mask"], d["pids"], d["valid"],
            d["inc_ids"], d["inc_mask"], method=model.warmup))(jax.random.key(0))
    variables = init_variables
    state = TrainState(step=0, params=variables["params"],
                       batch_stats=variables.get("batch_stats", {}), opt_state=None)
    batch = jax.device_put(batch)

    def _force(scores, age_rows, tgt_rows):
        isv = jnp.arange(scores.shape[1]) == eos
        at_end = (age_rows == tgt_rows - 1)[:, None] & isv[None]
        before = (age_rows < tgt_rows - 1)[:, None] & isv[None]
        big = jnp.asarray(3e4, scores.dtype)   # bf16-safe forced-EOS bias
        return jnp.where(at_end, big, jnp.where(before, -big, scores))

    def _force_topk(vals, idx, age_rows, tgt_rows):
        # the same forcing on the FUSED tail's [N, k] candidates (so the A/B
        # measures the production kernel, not the logits-hook fallback):
        # before the target, any EOS candidate is knocked out of contention;
        # at the target, candidate 0 becomes EOS at +big and the rest -big —
        # stage-2 then picks EOS for every beam, exactly like _force
        at_end = (age_rows == tgt_rows - 1)[:, None]
        big = jnp.asarray(3e4, vals.dtype)
        vals = jnp.where((idx == eos) & ~at_end, -big, vals)
        col0 = jnp.arange(idx.shape[1])[None, :] == 0
        vals = jnp.where(at_end, jnp.where(col0, big, -big), vals)
        idx = jnp.where(at_end & col0, eos, idx)
        return vals, idx

    # --- batch engine: same steady-state pipeline as the headline, forced mix
    def hook(scores, tok, pos, bt):
        tgt = jnp.repeat(bt["target_len"], scores.shape[0] // b)
        return _force(scores, jnp.full(scores.shape[:1], pos, jnp.int32), tgt)

    def topk_hook(vals, idx, lse, tok, pos, bt):
        tgt = jnp.repeat(bt["target_len"], vals.shape[0] // b)
        return _force_topk(vals, idx,
                           jnp.full(vals.shape[:1], pos, jnp.int32), tgt)

    cfg = DecodeConfig(beam_size=beam,
                       cache_phases=int(os.environ.get("BENCH_CACHE_PHASES", 8)))
    gen = make_generate_step(model, _Tok(), cfg, GEN_LEN, with_indication=True,
                             serving=True, logits_hook=hook, topk_hook=topk_hook)
    bt0 = dict(batch, target_len=jnp.asarray(tl[0]))
    seqs = np.asarray(gen(state, bt0))  # compile + warmup + length check
    got_len = (seqs[:, :] == eos).argmax(axis=1) + 1
    assert (got_len == tl[0]).all(), "forced lengths not honored (batch engine)"

    # depth-2 pipelining: the EXACT pop rule of serve.generate_stream(depth=2)
    # (pop once len exceeds depth), so the A/B's batch side IS the production
    # ReportServer configuration (ADVICE r3: a depth-3 loop here measured a
    # slightly different pipeline than the one serve.py ships)
    depth = 2
    q, lats = deque(), []
    t0 = time.perf_counter()
    for i in range(n_passes):
        bt = dict(batch, target_len=jnp.asarray(tl[i]))
        q.append((time.perf_counter(), gen(state, bt)))
        while len(q) > depth:
            ts, out = q.popleft()
            np.asarray(out)
            lats.append(time.perf_counter() - ts)
    while q:
        ts, out = q.popleft()
        np.asarray(out)
        lats.append(time.perf_counter() - ts)
    wall_b = time.perf_counter() - t0
    batch_rps = n_studies / wall_b
    _emit(f"reports/sec/chip @ {image_size}px beam=3 batch engine depth {depth}, "
          f"lognormal "
          f"length mix mean {mix.mean():.0f} cap {GEN_LEN} (bf16, vocab {VOCAB}, "
          f"batch {b}: pays max-of-batch, p50 batch latency "
          f"{np.percentile(lats, 50) * 1e3:.0f} ms)",
          batch_rps, "reports/s",
          vs=batch_rps / BASELINE_RPS if image_size == 224 else None)

    if deadline is not None and time.perf_counter() > deadline:
        print("# engines: continuous skipped: budget spent", file=sys.stderr)
        return

    # --- continuous engine: identical workload via the aux channel
    def step_wrapper(raw_step):
        def step(tok, p, age_rows, dec, att_mask, aux, tstate):
            logits, dec = raw_step(tok, p, age_rows, dec, att_mask, aux, tstate)
            return _force(logits, age_rows, jnp.repeat(aux, beam)), dec
        return step

    def topk_wrapper(vals, idx, lse, age_rows, aux):
        return _force_topk(vals, idx, age_rows, jnp.repeat(aux, beam))

    dispatch_segs = int(os.environ.get("BENCH_DISPATCH_SEGS", 4))
    pack_batches = int(os.environ.get("BENCH_PACK_BATCHES", 4))
    srv = ContinuousServer(model, _Tok(), state, max_seq_len=GEN_LEN, slots=b,
                           beam_size=beam, seg_steps=seg_steps,
                           dispatch_segs=dispatch_segs,
                           pack_batches=pack_batches,
                           step_wrapper=step_wrapper,
                           topk_wrapper=topk_wrapper)

    class _Loader:
        def __iter__(self):
            for i in range(n_passes):
                yield {**batch,
                       "_image_ids": [f"s{i}_{j}" for j in range(b)],
                       "_aux": tl[i]}

    recs, st = srv.serve(_Loader())  # first pass pays the segment compile
    assert len(recs) == n_studies, (len(recs), n_studies)
    lens = {r["id"]: len(r["report"]) for r in recs}
    want = {f"s{i}_{j}": int(tl[i, j]) for i in range(n_passes) for j in range(b)}
    bad = [k for k in want if lens[k] != want[k]]
    assert not bad, f"forced lengths not honored (continuous): {bad[:5]}"
    recs, st = srv.serve(_Loader())  # measured pass, compile-warm
    cont_rps = st["reports_per_s"]
    _emit(f"steady-state reports/sec/chip @ {image_size}px beam=3 continuous "
          f"batching, lognormal length mix mean {mix.mean():.0f} cap {GEN_LEN} "
          f"(bf16, vocab {VOCAB}, slots {b}, seg {seg_steps}x{dispatch_segs} "
          f"pack {pack_batches}, "
          f"{st['segment_steps']:.0f} decode steps for {n_studies} studies)",
          cont_rps, "reports/s",
          vs=cont_rps / BASELINE_RPS if image_size == 224 else None)
    if "study_p50_ms" in st:
        _emit(f"p50 per-study report latency @ {image_size}px beam=3 "
              f"(continuous, slots {b}, submit->harvest; p90 "
              f"{st['study_p90_ms']:.0f} ms)", st["study_p50_ms"], "ms")
    if "service_p50_ms" in st:
        _emit(f"p50 per-study decode service latency @ {image_size}px beam=3 "
              f"(continuous, slots {b}, admit->harvest excl. queue wait; p90 "
              f"{st['service_p90_ms']:.0f} ms)", st["service_p50_ms"], "ms")

    # the MESH program on the single real chip (VERDICT r4 task 8): the
    # dp=1 shard_map-wrapped engine — the exact program a multi-chip dp
    # deployment runs per device, with both Pallas kernels engaged through
    # shard_map (ops/sharding.py) — must hit single-chip throughput (±2%),
    # so the multi-chip perf story is measured, not asserted, within this
    # environment's one-chip limit. BENCH_ENGINE_MESH=0 disables.
    if os.environ.get("BENCH_ENGINE_MESH", "1") == "0":
        return
    if deadline is not None and time.perf_counter() > deadline:
        print("# engines: dp=1 mesh engine skipped: budget spent", file=sys.stderr)
        return
    from evoke_tpu.core.mesh import MeshSpec, create_mesh

    mesh = create_mesh(MeshSpec(dp=1))
    srv_m = ContinuousServer(model, _Tok(), state, max_seq_len=GEN_LEN, slots=b,
                             beam_size=beam, seg_steps=seg_steps,
                             dispatch_segs=dispatch_segs,
                             pack_batches=pack_batches,
                             step_wrapper=step_wrapper,
                             topk_wrapper=topk_wrapper, mesh=mesh)
    recs, _ = srv_m.serve(_Loader())  # compile pass
    assert len(recs) == n_studies, (len(recs), n_studies)
    recs, stm = srv_m.serve(_Loader())
    mesh_rps = stm["reports_per_s"]
    _emit(f"steady-state reports/sec/chip @ {image_size}px beam=3 continuous "
          f"batching under dp=1 shard_map mesh (same forced mix; kernels "
          f"via shard_map; vs un-meshed {cont_rps:.1f} r/s = "
          f"{mesh_rps / cont_rps * 100:.1f}%)",
          mesh_rps, "reports/s",
          vs=mesh_rps / BASELINE_RPS if image_size == 224 else None)


def analytic_train_flops(variables, model, image_size, n_anchor, n_images,
                         seq_len, vocab):
    """Analytic FLOPs for ONE finetune train step (fwd + bwd ~= 3x forward).

    Reuses the decode model's parameter grouping; the teacher-forced decoder
    runs all seq_len positions at once (causal self-attn ~T^2/2 dots)."""
    ana = analytic_decode_model(variables, model, image_size, n_images,
                                n_anchor, 1, 0, (seq_len,), vocab)
    g = ana["groups"]
    P = (image_size // 32) ** 2
    d = model.d_model
    B = n_anchor
    T_anchor = B * (1 + P)
    T_all = n_images * (1 + P)
    fwd = 2 * 7.80e9 * (image_size / 224.0) ** 2 * n_images
    fwd += 2 * g["fusion_qo"] * T_anchor + 2 * g["fusion_kv"] * T_all
    dh_total = (model.fusion_num_heads * model.d_vf if model.fusion_wide_qkv
                else model.d_vf)
    mp = getattr(model, "fusion_max_partners", None)
    keys = (1 + mp) * (1 + P) if mp else T_all
    fwd += 4 * T_anchor * keys * dh_total
    fwd += 2 * (g["heads"] + g["coattn"]) * T_anchor
    fwd += 2 * g["text_encoder"] * B * seq_len
    fwd += 2 * g["dec_encoder"] * B * P
    fwd += 2 * (g["dec_step"] + g["dec_step_bf16"]) * B * seq_len
    fwd += 2 * B * d * seq_len * seq_len      # causal self-attn dots (~T^2/2 x4)
    fwd += 4 * B * seq_len * P * d            # cross-attn dots
    return 3.0 * fwd


def bench_train(image_size, batches, iters, deadline=None, model=None,
                init_variables=None, remat=None):
    """model/init_variables: reuse an already-initialized parameter tree (the
    core224 child passes its decode init) — the jitted 300M-param init through
    the tunnel is the train family's dominant fixed cost."""
    import jax

    from evoke_tpu.core import prng
    from evoke_tpu.train.optim import build_optimizer
    from evoke_tpu.train.steps import create_train_state, make_train_step
    from __graft_entry__ import _example_batch, _flagship

    if remat is None:
        remat = os.environ.get("BENCH_TRAIN_REMAT", "0") == "1"
    if model is None:
        model = _flagship(vocab_size=VOCAB, remat_visual=remat)
    rng = np.random.default_rng(0)
    best = None
    for batch in batches:
        if best is not None and deadline is not None and time.perf_counter() > deadline:
            print(f"# train batch {batch} skipped: budget spent", file=sys.stderr)
            continue
        data = _example_batch(rng, batch, batch, image_size, GEN_LEN, VOCAB)
        try:
            variables = init_variables if init_variables is not None else (
                jax.jit(lambda k, d=data: model.init(
                    k, d["images"], d["ids"], d["mask"], d["pids"], d["valid"],
                    d["inc_ids"], d["inc_mask"], method=model.warmup))(jax.random.key(0)))
            init_variables = None  # the donated train step consumes these buffers
            flops = analytic_train_flops(variables, model, image_size, batch,
                                         2 * batch, GEN_LEN, VOCAB)
            tx = build_optimizer("RAdam", "finetune", variables["params"],
                                 pt_lr=5e-6, ft_lr=5e-5, weight_decay=1e-4)
            state = create_train_state(variables, tx)
            step = make_train_step(model, tx, prng.root_key(0), with_indication=True)
            data = jax.device_put(data)
            state, _ = step(state, data)  # compile + warmup (donated: state consumed)

            def one():
                nonlocal state
                state, m = step(state, data)
                jax.block_until_ready(m)

            p50 = _p50(one, iters)
        except Exception as e:  # OOM at large batch: skip, keep smaller configs
            print(f"# train {image_size}px batch {batch} skipped: {type(e).__name__}",
                  file=sys.stderr)
            continue
        mfu = flops / p50 / PEAK_FLOPS
        rate = batch / p50
        tag = ", remat" if remat else ""
        _emit(f"train studies/sec/chip @ {image_size}px (bf16, batch {batch}+{batch} "
              f"views{tag}, p50 step {p50 * 1e3:.1f} ms, analytic MFU {mfu * 100:.1f}%)",
              rate, "studies/s")
        if best is None or rate > best["rate"]:
            best = dict(batch=batch, rate=rate, mfu=mfu)
    return best


def bench_ping():
    """Tiny device op through the backend: proves the tunnel answers at all.

    No model, no init — a [256, 256] bf16 matmul is the cheapest round trip
    that still exercises compile + execute + host read. Prints one stderr
    line; the parent treats a kill/non-zero exit as a dead tunnel (round-4
    postmortem: every child was killed at full timeout with zero output
    because the first device op never returned)."""
    import jax
    import jax.numpy as jnp

    t0 = time.perf_counter()
    x = jnp.ones((256, 256), jnp.bfloat16)
    y = jax.jit(lambda a: a @ a)(x)
    val = float(np.asarray(y)[0, 0])
    assert np.isfinite(val)
    print(f"# ping ok: backend={jax.default_backend()} "
          f"{time.perf_counter() - t0:.1f}s", file=sys.stderr)


def bench_canary(image_size=224):
    """One flagship decode call, emitted IMMEDIATELY as the first metric line.

    VERDICT r4 task 1b: round 4 produced an empty artifact because the
    headline only existed after a full family returned. This child measures a
    single batch call (no steady-state pipeline, no roofline, no encoder
    split) and emits it as soon as it lands, so the parent always has a
    provisional headline within the first minutes of the run. It uses the
    SAME model/config/jit program as the core224 family (batch from
    BENCH_BATCHES_224) so the persistent compile cache warmed by any earlier
    rehearsal serves it — a smaller "cheap" batch would be a cold compile."""
    import jax

    from evoke_tpu.core.config import DecodeConfig
    from evoke_tpu.train.steps import TrainState, make_generate_step
    from __graft_entry__ import _example_batch, _flagship

    class _Tok:
        bos_id, eos_id, pad_id, unk_id = VOCAB - 2, VOCAB - 1, 0, 4

        def get_vocab_size(self):
            return VOCAB

    b = int(os.environ.get("BENCH_BATCHES_224", "64").split(",")[0])
    model = _flagship(vocab_size=VOCAB)
    batch = _example_batch(np.random.default_rng(0), b, b, image_size, GEN_LEN, VOCAB)
    variables = jax.jit(lambda k, d=batch: model.init(
        k, d["images"], d["ids"], d["mask"], d["pids"], d["valid"],
        d["inc_ids"], d["inc_mask"], method=model.warmup))(jax.random.key(0))
    state = TrainState(step=0, params=variables["params"],
                       batch_stats=variables.get("batch_stats", {}), opt_state=None)
    batch = jax.device_put(batch)
    cfg = DecodeConfig(beam_size=3,
                       cache_phases=int(os.environ.get("BENCH_CACHE_PHASES", 8)))
    gen = make_generate_step(model, _Tok(), cfg, GEN_LEN, with_indication=True,
                             serving=True)
    seqs = np.asarray(gen(state, batch))  # compile + warmup
    assert (seqs != 0).any(), "canary generation produced only PAD"
    t0 = time.perf_counter()
    np.asarray(gen(state, batch))
    p50 = time.perf_counter() - t0
    _emit(f"reports/sec/chip @ {image_size}px beam=3 len={GEN_LEN} (bf16, vocab "
          f"{VOCAB}, batch {b}, canary single-call, p50 batch latency "
          f"{p50 * 1e3:.1f} ms)", b / p50, "reports/s",
          vs=b / p50 / BASELINE_RPS if image_size == 224 else None)


def bench_pipeline(image_size, batch, steps):
    """Real input pipeline end-to-end: synthetic images on disk ->
    MultiviewBatcher -> Prefetcher -> device_prefetch -> jitted train step.
    Reports steps/s with input overlap and the input-stall percentage
    (wall time not covered by pure device compute)."""
    import json as _json
    import tempfile

    import jax

    from evoke_tpu.core import prng
    from evoke_tpu.data.batching import MultiviewBatcher, Prefetcher, device_prefetch
    from evoke_tpu.data.datasets import parse_finetune
    from evoke_tpu.data.synthetic import write_synthetic_dataset
    from evoke_tpu.data.tokenizer import build_tokenizer
    from evoke_tpu.data.transforms import make_transform
    from evoke_tpu.train.optim import build_optimizer
    from evoke_tpu.train.steps import create_train_state, make_train_step
    from __graft_entry__ import _flagship

    root = tempfile.mkdtemp(prefix="evoke_bench_")
    n_studies = int(batch * (steps + 2) / 0.7) + batch  # ~70% have an indication
    ann_path = write_synthetic_dataset(root, n_train=n_studies, n_val=1, n_test=1,
                                       image_size=image_size)
    tok = build_tokenizer(os.path.join(root, "tok"), "mimic_cxr", ann_path=ann_path)
    with open(ann_path) as f:
        ann = _json.load(f)
    has_inc, _ = parse_finetune(ann, "train")
    transform = make_transform(image_size, train=True, output_uint8=True)
    batcher = MultiviewBatcher(has_inc, tok, transform, n_anchor=batch,
                               max_seq_len=GEN_LEN, image_dir=root,
                               with_indication=True, text_field="report",
                               add_bos_eos=True, num_workers=8, drop_last=True)
    steps = min(steps, len(batcher) - 1)

    def arrays_only(b):
        return {k: v for k, v in b.items() if not k.startswith("_")}

    model = _flagship(vocab_size=tok.get_vocab_size())
    first = jax.device_put(arrays_only(next(iter(batcher))))
    variables = jax.jit(lambda k, b=first: model.init(
        k, b["images"].astype("float32"), b["ids"], b["mask"], b["pids"],
        b["valid"], b["inc_ids"], b["inc_mask"], method=model.warmup))(jax.random.key(0))
    tx = build_optimizer("RAdam", "finetune", variables["params"],
                         pt_lr=5e-6, ft_lr=5e-5, weight_decay=1e-4)
    state = create_train_state(variables, tx)
    step = make_train_step(model, tx, prng.root_key(0), with_indication=True)
    state, _ = step(state, first)  # compile + warmup

    t0 = time.perf_counter()
    n = 0
    for dev_batch, _host in device_prefetch(iter(Prefetcher(batcher, depth=2)), depth=2):
        state, m = step(state, dev_batch)
        jax.block_until_ready(m)
        n += 1
        if n >= steps:
            break
    wall = time.perf_counter() - t0
    # stall = wall time not explained by pure device compute at the same batch
    data_resident = jax.device_put(arrays_only(next(iter(batcher))))

    def one():
        nonlocal state  # the step donates its input state
        state, m = step(state, data_resident)
        jax.block_until_ready(m)

    pure = _p50(one, 3)
    stall_pct = max(0.0, (wall - n * pure) / wall * 100.0)
    _emit(f"pipeline steps/sec @ {image_size}px (disk->batch->prefetch->train, batch "
          f"{batch}, input stall {stall_pct:.1f}%)", n / wall, "steps/s")


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                   ".cache", "jax"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    if "--profile" in sys.argv:
        # device-trace digest of one beam-3 decode call (no TensorBoard needed)
        from evoke_tpu.core.profiling import capture_trace, format_summary, summarize_trace
        from evoke_tpu.core.config import DecodeConfig
        from evoke_tpu.train.steps import TrainState, make_generate_step
        from __graft_entry__ import _example_batch, _flagship

        class _Tok:
            bos_id, eos_id, pad_id, unk_id = VOCAB - 2, VOCAB - 1, 0, 4

            def get_vocab_size(self):
                return VOCAB

        b = int(os.environ.get("BENCH_ANCHORS", 32))
        size = int(os.environ.get("BENCH_IMAGE_SIZE", 224))
        model = _flagship(vocab_size=VOCAB)
        batch = _example_batch(np.random.default_rng(0), b, b, size, GEN_LEN, VOCAB)
        variables = jax.jit(model.init)(
            jax.random.key(0), batch["images"], batch["ids"], batch["mask"],
            batch["pids"], batch["valid"], batch["inc_ids"], batch["inc_mask"])
        state = TrainState(step=0, params=variables["params"],
                           batch_stats=variables.get("batch_stats", {}), opt_state=None)
        batch = jax.device_put(batch)
        gen = make_generate_step(model, _Tok(), DecodeConfig(beam_size=3), GEN_LEN,
                                 with_indication=True, serving=True)
        np.asarray(gen(state, batch))  # compile + warm outside the trace
        outdir = capture_trace(lambda: np.asarray(gen(state, batch)),
                               "/tmp/evoke_profile")
        print(format_summary(summarize_trace(outdir)), file=sys.stderr)
        return

    if "--profile-train" in sys.argv:
        # device-trace digest of one jitted train step
        from evoke_tpu.core.profiling import capture_trace, format_summary, summarize_trace
        from evoke_tpu.core import prng
        from evoke_tpu.train.optim import build_optimizer
        from evoke_tpu.train.steps import create_train_state, make_train_step
        from __graft_entry__ import _example_batch, _flagship

        b = int(os.environ.get("BENCH_ANCHORS", 32))
        model = _flagship(vocab_size=VOCAB)
        data = _example_batch(np.random.default_rng(0), b, b, 224, GEN_LEN, VOCAB)
        variables = jax.jit(lambda k: model.init(
            k, data["images"], data["ids"], data["mask"], data["pids"], data["valid"],
            data["inc_ids"], data["inc_mask"], method=model.warmup))(jax.random.key(0))
        tx = build_optimizer("RAdam", "finetune", variables["params"],
                             pt_lr=5e-6, ft_lr=5e-5, weight_decay=1e-4)
        state = create_train_state(variables, tx)
        step = make_train_step(model, tx, prng.root_key(0), with_indication=True)
        data = jax.device_put(data)
        state, _ = step(state, data)  # compile + warmup

        def one():
            nonlocal state
            state, m = step(state, data)
            jax.block_until_ready(m)

        one()
        outdir = capture_trace(one, "/tmp/evoke_profile_train")
        print(format_summary(summarize_trace(outdir)), file=sys.stderr)
        return

    if "--pipeline" in sys.argv:
        bench_pipeline(int(os.environ.get("BENCH_IMAGE_SIZE", 224)),
                       int(os.environ.get("BENCH_ANCHORS", 16)),
                       int(os.environ.get("BENCH_STEPS", 8)))
        return

    iters = int(os.environ.get("BENCH_ITERS", 4))
    # measured train sweep @224 (v5e-1, same-process, this code): 96/222/253
    # studies/s at batch 32/48/64; 96+96 OOMs without remat and is slower
    # (233 r/s) with it — 64 is the step-throughput optimum
    train_batch = int(os.environ.get("BENCH_TRAIN_ANCHORS", 64))
    # TOTAL wall-clock budget, HARD (VERDICT r4 task 1a): every child
    # allocation is clamped to the time remaining, a family whose remaining
    # slice is below its useful floor is SKIPPED (stderr note) instead of run
    # on a doomed slice, and once the budget is spent no further children
    # launch — total spend is bounded by budget + ONE child grace. Round 4's
    # empty artifact came from the opposite policy (floors and retries that
    # overrode the budget summed to ~25 min against 560 s, and the driver's
    # outer kill landed first). The driver's own kill lands no earlier than
    # ~1484 s (BENCH_r04.json: four child kills totalling 1484 s ran to
    # completion before it); 1080 s + one 90 s grace keeps >5 min of margin
    # while fitting ping+canary+384+224+engines(+mesh A/B)+train AND the
    # pipeline family warm (r5 rehearsal: everything but pipeline in 948 s
    # with the slow pre-fix mesh leg; ~880 s after the shard_batch fix).
    budget_s = float(os.environ.get("BENCH_BUDGET_S", 1080))

    if "--only" in sys.argv:  # child mode, in-process
        what = sys.argv[sys.argv.index("--only") + 1]
        deadline = time.perf_counter() + budget_s
        if what == "ping":
            bench_ping()
            return
        if what == "canary":
            bench_canary(int(os.environ.get("BENCH_IMAGE_SIZE", 224)))
            return
        if what in ("core224", "core224+train"):
            child_end = time.perf_counter() + budget_s
            if what == "core224+train":
                # partition the child budget: decode (and its OPTIONAL
                # encoder-split timing, which respects the deadline) must
                # leave the engine-A/B tail its ~40s warm cost and the train
                # tail its ~40s marginal cost
                deadline = time.perf_counter() + 0.5 * budget_s
            # default: the measured steady-state-best batch only (sweep with
            # BENCH_BATCHES_224=32,64,128 when exploring). Under reorder-mode
            # caches the optimum was sharply 32 (device time grew
            # super-linearly with batch via the 3-pass KV-cache traffic); the
            # ancestor/Pallas serving default reads caches once, so the curve
            # plateaus from 64 up (measured 473/487/499/492/501 r/s at
            # 32/48/64/96/128) — 64 takes the plateau at half of 128's batch
            # latency. 384 peaks at 48 (299/305/273 at 32/48/64: the encoder
            # share grows with batch).
            out = bench_decode(224, [int(x) for x in
                                     os.environ.get("BENCH_BATCHES_224", "64").split(",")],
                               iters, deadline=deadline)
            if what == "core224+train" and out[2] is not None:
                _, model, variables = out
                # serving-engine A/B runs BEFORE the train tail (r3 postmortem:
                # bench_engines raised INVALID_ARGUMENT twice when it ran after
                # train — the live RAdam opt_state adds ~2.4 GB of HBM on top
                # of params + engine ring caches; ordering engines first keeps
                # the engine A/B at the same device pressure as production
                # serving). Its compiles are persistent-cache-warm after one
                # rehearsal (~40s marginal). BENCH_ENGINES=0 disables.
                if os.environ.get("BENCH_ENGINES", "1") != "0":
                    try:
                        bench_engines(224, deadline=child_end - 45.0, model=model,
                                      init_variables=variables)
                    except Exception as e:
                        print(f"# engines skipped: {type(e).__name__}: {e}",
                              file=sys.stderr)
                # same model, same parameter tree: the train family rides the
                # decode child's init instead of paying its own (~100s+ of
                # tunnel fixed cost per interpreter, VERDICT r2 weak #1 redux).
                # bench_train's deadline guard only applies after its first
                # measurement, so the single train batch always runs.
                bench_train(224, [train_batch], iters, deadline=child_end,
                            model=model, init_variables=variables)
        elif what == "engines":
            bench_engines(int(os.environ.get("BENCH_IMAGE_SIZE", 224)),
                          deadline=deadline)
        elif what in ("core384", "core384+train"):
            child_end = time.perf_counter() + budget_s
            if what == "core384+train":
                deadline = time.perf_counter() + 0.7 * budget_s
            out = bench_decode(384, [int(x) for x in
                                     os.environ.get("BENCH_BATCHES_384", "48").split(",")],
                               iters, deadline=deadline)
            if what == "core384+train" and out[1] is not None:
                _, model, variables = out
                # 384 train tail rides the decode init (same param tree).
                # remat_visual is the default here: the 384 activations hit
                # the HBM knee immediately (README r3) — the winner of the
                # remat x batch sweep is pinned via these envs.
                remat384 = os.environ.get("BENCH_TRAIN_REMAT_384", "1") == "1"
                tb = [int(x) for x in
                      os.environ.get("BENCH_TRAIN_BATCHES_384", "24").split(",")]
                from __graft_entry__ import _flagship
                tmodel = (_flagship(vocab_size=VOCAB, remat_visual=True)
                          if remat384 else model)
                bench_train(384, tb, iters, deadline=child_end, model=tmodel,
                            init_variables=variables, remat=remat384)
        elif what == "train":
            bench_train(int(os.environ.get("BENCH_TRAIN_IMAGE_SIZE", 224)),
                        [int(x) for x in
                         os.environ.get("BENCH_TRAIN_BATCHES",
                                        str(train_batch)).split(",")],
                        iters, deadline=deadline)
        elif what == "pipeline":
            bench_pipeline(int(os.environ.get("BENCH_IMAGE_SIZE", 224)),
                           int(os.environ.get("BENCH_ANCHORS", 16)),
                           int(os.environ.get("BENCH_STEPS", 8)))
        else:
            raise SystemExit(f"unknown --only {what}")
        return

    # Parent mode: each metric family runs in its OWN interpreter with its own
    # SLICE of the budget and a hard timeout (VERDICT r2 weak #1: a single
    # first-come budget let the 224 family starve 384+train). The remote
    # tunnel can hang a device sync for minutes; a killed child still yields
    # the JSON lines it already printed.
    #
    # Launch order (VERDICT r4 task 1): ping (is the tunnel alive AT ALL) ->
    # canary (one decode call, provisional headline within minutes) ->
    # core384+train -> core224+train(+engines) -> train/engines buy-backs ->
    # pipeline. Every step is gated on the time remaining under the hard cap;
    # the artifact can no longer be empty: a dead tunnel produces an explicit
    # rc=0 degradation headline instead of a silent 25-minute death.
    import re
    import subprocess

    t_start = time.perf_counter()
    grace = 90.0  # per-child overhead allowance: interpreter + imports + cache

    def remaining():
        return budget_s - (time.perf_counter() - t_start)

    lines224 = []
    all_lines = []

    def emit_headline():
        # the driver parses the LAST JSON line: re-emit the current headline
        # after every family so it stays last even if an outer kill lands
        # mid-run (duplicates are harmless; coverage grows monotonically)
        steady = [r for r in lines224 if r["metric"].startswith("steady-state")]
        rates = [r for r in lines224 if r["unit"] == "reports/s"]
        best = max(steady or rates, key=lambda r: r["value"])
        desc = re.sub(r"^steady-state ", "", best["metric"])
        _emit(desc + " [headline]", best["value"], "reports/s",
              vs=best["value"] / BASELINE_RPS)

    def run_family(name, alloc, clamp=True):
        """One kill-safe child interpreter; returns # of JSON lines it emitted.

        ``alloc`` is clamped to the time remaining; the child's kill timeout
        is alloc + grace, so the whole run overshoots the budget by AT MOST
        one grace (the child in flight when the budget expires).
        ``clamp=False`` is the explicit-force escape hatch (BENCH_PIPELINE=1
        runs even over budget — an unclamped alloc would otherwise be cut to
        the spent budget's <=0 remainder and killed at startup)."""
        if clamp:
            alloc = min(alloc, remaining())
        child_env = dict(os.environ, BENCH_BUDGET_S=str(max(alloc, 1.0)))
        timeout = alloc + grace
        try:
            proc = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--only", name],
                capture_output=True, text=True, timeout=timeout, env=child_env)
            out, err = proc.stdout, proc.stderr
            if proc.returncode != 0:
                print(f"# {name} exited rc={proc.returncode}", file=sys.stderr)
        except subprocess.TimeoutExpired as e:
            out = (e.stdout or b"").decode() if isinstance(e.stdout, bytes) else (e.stdout or "")
            err = (e.stderr or b"").decode() if isinstance(e.stderr, bytes) else (e.stderr or "")
            print(f"# {name} killed after {timeout:.0f}s (tunnel hang?); "
                  "keeping its partial results", file=sys.stderr)
        for ln in err.splitlines():
            if ln.startswith("#"):
                print(ln, file=sys.stderr)
        emitted = 0
        for ln in out.splitlines():
            if not ln.startswith("{"):
                continue
            try:
                rec = json.loads(ln)
            except json.JSONDecodeError:
                continue
            print(ln, flush=True)
            emitted += 1
            all_lines.append(rec)
            if name in ("canary", "core224", "core224+train") \
                    and "@ 224px" in rec["metric"] and rec["unit"] == "reports/s":
                lines224.append(rec)
        if lines224:
            emit_headline()
        return emitted

    # --- stage 0: ping with RETRY-AND-BACKOFF. A healthy ping measures
    # 12-64 s (imports + backend init vary that much through the tunnel); a
    # 120 s timeout avoids false dead-tunnel verdicts. Crucially the tunnel's
    # observed outages are TRANSIENT — an r5 rehearsal had both pings time
    # out and the tunnel answer again minutes later — so a failed ping is
    # retried with a 45 s backoff for as long as >55% of the budget remains
    # (canary + the 224 family need ~that much); only when the tunnel stays
    # dead through that whole window does the run emit an explicit
    # degradation headline and exit 0 (the artifact then records the tunnel
    # state instead of nothing, VERDICT r4 weak #1).
    ping_ok = False
    attempt = 0
    while remaining() > 0.55 * budget_s:
        attempt += 1
        try:
            proc = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--only", "ping"],
                capture_output=True, text=True,
                timeout=min(120.0, remaining() + grace))
            for ln in proc.stderr.splitlines():
                if ln.startswith("#"):
                    print(ln, file=sys.stderr)
            ping_ok = proc.returncode == 0
        except subprocess.TimeoutExpired:
            print(f"# ping attempt {attempt} timed out", file=sys.stderr)
        if ping_ok:
            if attempt > 1:
                print(f"# tunnel recovered on ping attempt {attempt} "
                      f"({budget_s - remaining():.0f}s in)", file=sys.stderr)
            break
        time.sleep(min(45.0, max(remaining() - 0.55 * budget_s, 0.0)))
    if not ping_ok:
        _emit(f"tunnel dead: ping matmul failed {attempt}x (120s timeout, "
              "45s backoff) — no measurement possible this round (see stderr)",
              0.0, "reports/s", vs=0.0)
        return

    # --- stage 1: canary decode — one flagship call, provisional headline.
    # Its compile warms the exact core224 program; a failure here (e.g. a
    # cold cache eating the slice) is not fatal, but it caps family retries
    # at one TOTAL (VERDICT r4 task 1c: when the tunnel is already slow,
    # retry floods are how 25 minutes burn with zero output).
    canary_ok = run_family("canary", min(240.0, remaining())) > 0
    retries_left = 99 if canary_ok else 1

    # (name, budget share, useful floor). The train measurements ride in the
    # decode children: a standalone train interpreter pays ~160s WARM of
    # batch-invariant fixed cost that the decode child has already paid.
    # Floors are each child's measured WARM fixed cost — but they now gate a
    # SKIP (not a budget override): a family whose remaining slice is under
    # its floor cannot finish and is skipped loudly instead.
    families = (("core384+train", 0.30, 170.0), ("core224+train", 0.42, 280.0))

    carry = 0.0  # budget a previous family left unused rolls forward
    for name, share, floor in families:
        alloc = min(budget_s * share + carry, remaining())
        if alloc < floor:
            print(f"# {name} skipped: {alloc:.0f}s left < {floor:.0f}s floor",
                  file=sys.stderr)
            continue
        t_family = time.perf_counter()
        emitted = run_family(name, alloc)
        if emitted == 0 and remaining() > floor and retries_left > 0:
            # a transient tunnel hang can stall a child start-to-kill with no
            # output while a FRESH interpreter works fine (observed: 9m50s
            # hung child, then an immediate clean 150s run). Retry once,
            # within the remaining budget only.
            retries_left -= 1
            print(f"# {name} emitted nothing; retrying once in a fresh "
                  "interpreter", file=sys.stderr)
            run_family(name, min(alloc, remaining()))
        carry = max(alloc - (time.perf_counter() - t_family), 0.0)

    # the 224 train number is a required metric family: if the 224 child died
    # before its train tail, buy it back with a dedicated child (pays ~160s
    # warm fixed cost — only worth it as a fallback, and only if the budget
    # still covers it)
    if not any("train studies/sec/chip @ 224" in r["metric"] for r in all_lines):
        if remaining() > 220.0:
            print("# train missing from the 224 child; running a dedicated "
                  "train child", file=sys.stderr)
            run_family("train", remaining())
        else:
            print(f"# train family missing but only {remaining():.0f}s left; "
                  "skipped", file=sys.stderr)
    # the engine A/B is likewise required: if the 224 child died before its
    # engines tail, buy it back. Warm it costs ~40s marginal + interpreter
    # init (~260s standalone).
    have_batch_eng = any("batch engine" in r["metric"] for r in all_lines)
    have_cont_eng = any("continuous batching" in r["metric"] for r in all_lines)
    if os.environ.get("BENCH_ENGINES", "1") != "0" \
            and not (have_batch_eng and have_cont_eng):
        missing = [n for ok, n in ((have_batch_eng, "batch"),
                                   (have_cont_eng, "continuous")) if not ok]
        if remaining() > 260.0:
            print(f"# engines missing from the 224 child ({'+'.join(missing)}); "
                  "running a dedicated engines child", file=sys.stderr)
            run_family("engines", remaining())
        else:
            print(f"# engines family missing ({'+'.join(missing)}) but only "
                  f"{remaining():.0f}s left; skipped", file=sys.stderr)
    # input-pipeline family (VERDICT r3 weak #8): the only end-to-end-with-
    # real-I/O number — runs when budget remains (BENCH_PIPELINE=0 disables,
    # =1 forces even over budget)
    force_pipe = os.environ.get("BENCH_PIPELINE", "")
    if force_pipe == "1":
        run_family("pipeline", max(remaining(), 150.0), clamp=False)
    elif force_pipe != "0" and remaining() > 100.0:
        run_family("pipeline", remaining())
    elif force_pipe != "0":
        print(f"# pipeline family skipped: {remaining():.0f}s of budget left "
              "(<100s)", file=sys.stderr)
    if not lines224:
        # rc stays 0 with a parsed headline on ANY tunnel state (VERDICT r4
        # task 1 done-condition); the zero value + explicit text record the
        # degradation honestly instead of failing the artifact
        _emit("no 224 decode result produced (tunnel answered the ping but "
              "every decode child failed — see stderr)", 0.0, "reports/s",
              vs=0.0)


if __name__ == "__main__":
    main()
