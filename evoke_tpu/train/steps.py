"""Jitted SPMD train/eval/generate steps.

The reference's epoch hot loop (EVOKE modules/trainer_v0401.py:241-300) moves
tensors per batch, calls backward, clips, steps, and empties the CUDA cache
every batch. Here the whole update is ONE jitted function: forward + grads +
clip + optimizer, with batch arrays sharded over the ``dp`` mesh axis and
params replicated — XLA inserts the gradient psum and the all-gathers for the
global-batch contrastive matrices.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import struct
from flax.core import FrozenDict

from evoke_tpu.core import prng
from evoke_tpu.decode.beam import (beam_search, diverse_beam_search,
                                   diverse_sample, greedy_sample)


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any


_IMAGENET_MEAN = jnp.asarray([0.485, 0.456, 0.406], jnp.float32)
_IMAGENET_STD = jnp.asarray([0.229, 0.224, 0.225], jnp.float32)


def maybe_normalize_images(batch):
    """uint8 images -> ImageNet-normalized float32, ON DEVICE.

    Pairs with ImageTransform(output_uint8=True): the host ships 4x less data
    (uint8 HWC) and the (x/255 - mean)/std runs on the chip.
    """
    images = batch["images"]
    if images.dtype == jnp.uint8:
        x = images.astype(jnp.float32) / 255.0
        batch = dict(batch)
        batch["images"] = (x - _IMAGENET_MEAN) / _IMAGENET_STD
    return batch


def create_train_state(variables, tx) -> Tuple[TrainState, Any]:
    params = variables["params"]
    batch_stats = variables.get("batch_stats", FrozenDict())
    opt_state = tx.init(params)
    return TrainState(step=jnp.zeros((), jnp.int32), params=params,
                      batch_stats=batch_stats, opt_state=opt_state)


def make_train_step(model, tx, root_key, loss_key: str = "all_loss",
                    with_indication: bool = False, task: str = "finetune"):
    """Returns a jitted (state, batch) -> (state, metrics) update step.

    batch: {images, ids, mask, pids, valid[, inc_ids, inc_mask]}.
    """

    def loss_fn(params, batch_stats, batch, dropout_rng):
        variables = {"params": params, "batch_stats": batch_stats}
        batch = maybe_normalize_images(batch)
        args = [batch["images"], batch["ids"], batch["mask"], batch["pids"], batch["valid"]]
        if with_indication:
            args += [batch["inc_ids"], batch["inc_mask"]]
        out, mutated = model.apply(variables, *args, train=True,
                                   mutable=["batch_stats"], rngs={"dropout": dropout_rng})
        return out[loss_key], (out, mutated["batch_stats"])

    @partial(jax.jit, donate_argnums=(0,))
    def train_step(state: TrainState, batch) -> Tuple[TrainState, Dict[str, jnp.ndarray]]:
        dropout_rng = prng.step_key(root_key, state.step, f"{task}-dropout")
        grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
        (_, (out, new_stats)), grads = grad_fn(state.params, state.batch_stats, batch,
                                               dropout_rng)
        updates, new_opt_state = tx.update(grads, state.opt_state, state.params)
        new_params = jax.tree_util.tree_map(lambda p, u: p + u, state.params, updates)
        new_state = state.replace(step=state.step + 1, params=new_params,
                                  batch_stats=new_stats, opt_state=new_opt_state)
        metrics = {k: v for k, v in out.items()}
        return new_state, metrics

    return train_step


def make_eval_step(model, loss_key: str = "all_loss", with_indication: bool = False):
    @jax.jit
    def eval_step(state: TrainState, batch) -> Dict[str, jnp.ndarray]:
        variables = {"params": state.params, "batch_stats": state.batch_stats}
        batch = maybe_normalize_images(batch)
        args = [batch["images"], batch["ids"], batch["mask"], batch["pids"], batch["valid"]]
        if with_indication:
            args += [batch["inc_ids"], batch["inc_mask"]]
        out = model.apply(variables, *args, train=False)
        return out

    return eval_step


def resolve_beam_kv(decode_cfg, serving: bool, mesh=None) -> str:
    """Resolve DecodeConfig.beam_kv 'auto' to a concrete cache strategy.

    Serving on TPU: ancestor-table caches + the Pallas lineage kernel
    (ops/lineage_attention.py) — one HBM pass over the caches per step
    instead of reorder's three (measured +4.5% @224 / +18.7% @384
    steady-state, v5e-1 batch 32 beam 3, DESIGN 5f). Eval paths stay on
    reorder for bit-comparable outputs across backends (bf16 near-tie beams
    round differently under the kernel's f32 score accumulation), and the
    int8 cache path keeps reorder (the kernel reads bf16/f32 caches).

    ``mesh``: serving under a PURE-dp mesh keeps ancestor — the lineage
    kernel is sample-parallel and rides ``shard_map`` over 'dp'
    (ops/sharding.py, VERDICT r4 task 3), so multi-chip serving runs the
    same fused program the single-chip bench headlines. mp > 1 meshes
    resolve to reorder (the ancestor XLA fallback measured −43% end-to-end;
    reorder is the faster meshable formulation). Explicit beam_kv always
    wins."""
    beam_kv = str(getattr(decode_cfg, "beam_kv", "auto"))
    if beam_kv not in ("auto", "reorder", "ancestor"):
        raise ValueError(f"beam_kv must be auto|reorder|ancestor, got {beam_kv!r}")
    if beam_kv != "auto":
        return beam_kv
    from evoke_tpu.ops.sharding import mesh_allows_kernels

    kv_dtype = str(getattr(decode_cfg, "kv_cache_dtype", "") or "")
    return ("ancestor" if serving and kv_dtype != "int8"
            and jax.default_backend() == "tpu"
            and mesh_allows_kernels(mesh) else "reorder")


def make_generate_step(model, tokenizer, decode_cfg, max_seq_len: int,
                       with_indication: bool = False, serving: bool = False,
                       logits_hook=None, topk_hook=None,
                       all_samples: bool = False, mesh=None):
    """Returns a jitted (state, batch) -> seq [B, L] generation step.

    ``mesh``: serving under a mesh. A pure-dp mesh keeps BOTH Pallas serving
    kernels — the lineage attention and the fused vocab tail run inside
    ``shard_map`` over 'dp' (ops/sharding.py), so the dp-sharded program is
    the same fused one the single-chip path runs; mp > 1 meshes fall back to
    reorder + the unfused tail. The caller shards the batch (core.mesh
    .shard_batch); params replicate or carry their own TP shardings.

    Dispatches to beam search (beam_size > 1) or greedy/sampling, mirroring
    att_model._sample's dispatch (att_model.py:151-155). ``serving=True``
    resolves cache_phases=0 (auto) to the measured-fastest phased schedule;
    eval paths resolve to single-phase for bit-comparable outputs.

    ``all_samples=True`` returns every candidate instead of the per-study
    best/first row: [B, beam, L] beams best-first (the reference's
    "sample_n == beam_size: each beam is a sample", att_model.py:102-131),
    [B, group_size, L] for diverse sampling, [B, sample_n, L] for sample_n
    parallel samples.

    ``logits_hook(scores, tok, pos, batch) -> scores`` rewrites each step's
    per-row scores ([N, V] raw logits on the beam path, log-probs on the
    greedy/sample path; rows sample-major x beam) before token selection.
    Load-testing surface: bench.py forces EOS at per-study target lengths
    (read from the batch) to measure serving engines under a controlled
    length distribution; None (the default) is the production path.

    ``topk_hook(vals, idx, lse, tok, pos, batch) -> (vals, idx)`` is the
    same forcing surface for the FUSED vocab tail: a logits_hook needs the
    full [N, V] logits and therefore forces the unfused XLA tail (the A/B
    then under-measures the production kernel by the fused tail's ~6.5%,
    DESIGN 5m). When both hooks are given, the fused path uses topk_hook on
    the kernel's [N, k] candidates and ignores logits_hook; the unfused
    path uses logits_hook and ignores topk_hook — callers provide
    EQUIVALENT forcings per path (bench.py does).
    """
    beam = decode_cfg.beam_size
    vocab = tokenizer.get_vocab_size() + 1
    common = dict(bos_id=tokenizer.bos_id, eos_id=tokenizer.eos_id, pad_id=tokenizer.pad_id,
                  vocab_size=vocab, max_len=max_seq_len)
    suppress = (tokenizer.unk_id,) if decode_cfg.suppress_unk else ()
    phases = int(getattr(decode_cfg, "cache_phases", 0))
    if phases <= 0:
        # serving auto: 8-phase cache growth. Re-swept after the lineage
        # kernel moved the serving config (DESIGN 5f): at 224 batch 64 the
        # curve is 471/471/501/547/522/538/504 r/s for phases
        # 1/2/4/8/10/12/16 — 8 is the sharp peak; at 384 batch 48 it is
        # neutral-to-slightly-better than 4 in the interleaved sweep.
        phases = 8 if serving else 1
    kv_dtype = str(getattr(decode_cfg, "kv_cache_dtype", "") or "")
    ancestor_kv = resolve_beam_kv(decode_cfg, serving, mesh=mesh) == "ancestor"
    init_extra = (kv_dtype,) if kv_dtype else ()
    sample_n = max(int(getattr(decode_cfg, "sample_n", 1)), 1)
    if beam > 1 and decode_cfg.sample_method in ("greedy", "beam_search") \
            and sample_n not in (1, beam // max(int(decode_cfg.group_size), 1)):
        # the reference's gate (att_model.py:103): on the beam path each
        # sample IS a beam, so sample_n must be 1 or the per-group beam width
        raise ValueError(
            f"sample_n={sample_n} with beam_size={beam}: on the beam path "
            "sample_n must be 1 or beam_size//group_size (each beam is a "
            "sample; pass all_samples=True to receive them)")
    from evoke_tpu.ops.fused_logit_topk import use_fused_logit_topk

    # fused Pallas vocab tail on the TPU serving path (same policy split as
    # the lineage kernel; see use_fused_logit_topk). A topk_hook keeps the
    # fused tail eligible — it rewrites the kernel's [N, k] candidates
    # instead of the [N, V] logits a logits_hook needs.
    fused = use_fused_logit_topk(
        model, serving, logits_hook=None if topk_hook is not None else logits_hook,
        decoding_constraint=bool(decode_cfg.decoding_constraint), mesh=mesh)
    if phases > 1 and max_seq_len >= 2 * phases:
        schedule = tuple(-(-max_seq_len * i // phases) for i in range(1, phases + 1))
    else:
        schedule = (max_seq_len,)

    def _generate_body(state: TrainState, batch):
        variables = {"params": state.params, "batch_stats": state.batch_stats}
        batch = maybe_normalize_images(batch)
        b = batch["ids"].shape[0]  # n_anchor: one report per study anchor
        inc = [batch["inc_ids"], batch["inc_mask"]] if with_indication else []
        enc, att_mask = model.apply(variables, batch["images"], batch["pids"], batch["valid"],
                                    b, *inc, method=model.encode_for_decode)
        if beam > 1 and decode_cfg.sample_method in ("greedy", "beam_search"):
            # cross K/V and attention masks are NOT beam-expanded: all beams
            # of a sample attend identical encoder rows, and MultiHeadAttention
            # .attend's shared-KV path reads each sample's cross K/V once per
            # step instead of beam times (exact; layers.py)
            groups = max(int(decode_cfg.group_size), 1)
            if groups > 1:
                bdash = beam // groups

                def step_g(tok, pos, dstate):
                    out = model.apply(variables, tok, pos, dstate, att_mask,
                                      method=model.decode_step)
                    if logits_hook is not None:
                        out = (logits_hook(out[0], tok, pos, batch), out[1])
                    return out

                states = [model.apply(variables, enc, b * bdash, max_seq_len,
                                      method=model.init_decode_state)
                          for _ in range(groups)]
                res = diverse_beam_search(
                    step_g, states, b, beam_size=beam, group_size=groups,
                    diversity_lambda=decode_cfg.diversity_lambda,
                    length_penalty=decode_cfg.length_penalty,
                    ancestor_kv=ancestor_kv, **common)
                return res.seqs if all_samples else res.seqs[:, 0, :]
            # EVOKE_SPLIT_CHAINS=2: run the decode step as ``cs`` independent
            # half-batch model calls inside one loop body — two dependency
            # chains for XLA to overlap on a latency-bound step (DESIGN 5n).
            # Serving-only experiment knob; output-exact (same per-sample math).
            import os as _os

            cs = int(_os.environ.get("EVOKE_SPLIT_CHAINS", "1")) if serving else 1
            if cs > 1 and b % cs == 0:
                bh, nh = b // cs, (b // cs) * beam
                state0 = tuple(
                    model.apply(variables, enc[i * bh:(i + 1) * bh], nh,
                                schedule[0], *init_extra,
                                method=model.init_decode_state)
                    for i in range(cs))

                def _split_step(tok, pos, dstate, **kw):
                    outs, states = [], []
                    for i in range(cs):
                        o, s = model.apply(
                            variables, tok[i * nh:(i + 1) * nh], pos, dstate[i],
                            att_mask[i * bh:(i + 1) * bh], **kw,
                            method=model.decode_step)
                        outs.append(o)
                        states.append(s)
                    merged = jax.tree_util.tree_map(
                        lambda *xs: jnp.concatenate(xs, axis=0), *outs)
                    return merged, tuple(states)

                if fused:
                    def step(tok, pos, dstate):
                        out = _split_step(tok, pos, dstate, return_topk=beam,
                                          topk_suppress=suppress)
                        if topk_hook is not None:
                            (vals, idx, lse), st = out
                            vals, idx = topk_hook(vals, idx, lse, tok, pos, batch)
                            out = ((vals, idx, lse), st)
                        return out

                    res = beam_search(step, state0, b, beam_size=beam,
                                      length_penalty=decode_cfg.length_penalty,
                                      cache_schedule=schedule, raw_logits=True,
                                      fused_topk=True, chain_split=cs,
                                      ancestor_kv=ancestor_kv, **common)
                    return res.seqs if all_samples else res.seqs[:, 0, :]

                def step(tok, pos, dstate):
                    out = _split_step(tok, pos, dstate, return_logits=True)
                    if logits_hook is not None:
                        out = (logits_hook(out[0], tok, pos, batch), out[1])
                    return out

                res = beam_search(step, state0, b, beam_size=beam,
                                  length_penalty=decode_cfg.length_penalty,
                                  suppress_ids=suppress,
                                  decoding_constraint=bool(decode_cfg.decoding_constraint),
                                  cache_schedule=schedule, raw_logits=True,
                                  chain_split=cs,
                                  ancestor_kv=ancestor_kv, **common)
                return res.seqs if all_samples else res.seqs[:, 0, :]

            state0 = model.apply(variables, enc, b * beam, schedule[0], *init_extra,
                                 method=model.init_decode_state)

            if fused:
                # the whole vocab tail (logit matmul + logsumexp + stage-1
                # top-k + suppression) runs as ONE Pallas kernel inside the
                # step — the [N, V] logits never touch HBM
                # (ops/fused_logit_topk.py)
                def step(tok, pos, dstate):
                    out = model.apply(variables, tok, pos, dstate, att_mask,
                                      return_topk=beam, topk_suppress=suppress,
                                      method=model.decode_step)
                    if topk_hook is not None:
                        (vals, idx, lse), st = out
                        vals, idx = topk_hook(vals, idx, lse, tok, pos, batch)
                        out = ((vals, idx, lse), st)
                    return out

                res = beam_search(step, state0, b, beam_size=beam,
                                  length_penalty=decode_cfg.length_penalty,
                                  cache_schedule=schedule, raw_logits=True,
                                  fused_topk=True,
                                  ancestor_kv=ancestor_kv, **common)
                return res.seqs if all_samples else res.seqs[:, 0, :]

            # raw-logits two-stage top-k (exact; see beam_search docstring):
            # skips the [N, V] f32 log_softmax in the loop — a large-vocab win
            def step(tok, pos, dstate):
                out = model.apply(variables, tok, pos, dstate, att_mask,
                                  return_logits=True, method=model.decode_step)
                if logits_hook is not None:
                    out = (logits_hook(out[0], tok, pos, batch), out[1])
                return out

            res = beam_search(step, state0, b, beam_size=beam,
                              length_penalty=decode_cfg.length_penalty,
                              suppress_ids=suppress,
                              decoding_constraint=bool(decode_cfg.decoding_constraint),
                              cache_schedule=schedule, raw_logits=True,
                              ancestor_kv=ancestor_kv, **common)
            return res.seqs if all_samples else res.seqs[:, 0, :]
        # sampling-method parity with caption_model.py:363-401: "topN" strings
        # encode the cutoff (N >= 1 -> top-k, 0 < N < 1 -> nucleus), "gumbel"
        # (argmax over gumbel-perturbed logits) IS categorical sampling
        method = decode_cfg.sample_method
        if method == "beam_search":
            method = "greedy"
        elif method == "gumbel":
            method = "sample"
        top_k = int(getattr(decode_cfg, "top_k", 0))
        top_p = float(getattr(decode_cfg, "top_p", 0.0))
        if method.startswith("top") and method not in ("top_k", "top_p"):
            num = float(method[3:])
            if 0 < num < 1:
                method, top_p = "top_p", num
            else:
                method, top_k = "top_k", int(num)

        def make_step(mask):
            def step(tok, pos, dstate):
                out = model.apply(variables, tok, pos, dstate, mask,
                                  method=model.decode_step)
                if logits_hook is not None:
                    out = (logits_hook(out[0], tok, pos, batch), out[1])
                return out

            return step

        groups = max(int(decode_cfg.group_size), 1)
        if groups > 1:
            # diverse SAMPLING (att_model.py:231-320 _diverse_sample): the
            # group_size > 1 path when the beam dispatch above did not take
            states = [model.apply(variables, enc, b, max_seq_len,
                                  method=model.init_decode_state)
                      for _ in range(groups)]
            seqs, _ = diverse_sample(
                make_step(att_mask), states, b, group_size=groups,
                sample_method=method, temperature=decode_cfg.temperature,
                top_k=top_k, top_p=top_p,
                diversity_lambda=decode_cfg.diversity_lambda,
                block_trigrams=bool(decode_cfg.block_trigrams),
                decoding_constraint=bool(decode_cfg.decoding_constraint),
                **common)
            return seqs if all_samples else seqs[:, 0, :]

        # sample_n parallel stochastic samples per study (att_model.py:160-165
        # repeat_tensors): rows are study-major [b * n], each with its own
        # PRNG stream via jax.random.categorical's per-row draws
        rows, mask = b, att_mask
        if sample_n > 1:
            enc = jnp.repeat(enc, sample_n, axis=0)
            mask = jnp.repeat(att_mask, sample_n, axis=0)
            rows = b * sample_n
        state0 = model.apply(variables, enc, rows, schedule[0], *init_extra,
                             method=model.init_decode_state)
        seq, _ = greedy_sample(make_step(mask), state0, rows, sample_method=method,
                               temperature=decode_cfg.temperature,
                               top_k=top_k, top_p=top_p,
                               block_trigrams=bool(decode_cfg.block_trigrams),
                               decoding_constraint=bool(decode_cfg.decoding_constraint),
                               cache_schedule=schedule,
                               **common)
        if sample_n > 1:
            seq = seq.reshape(b, sample_n, max_seq_len)
            return seq if all_samples else seq[:, 0, :]
        return seq

    from evoke_tpu.ops.sharding import use_kernel_mesh

    @jax.jit
    def generate_step(state: TrainState, batch):
        # trace-time mesh context: the Pallas kernel dispatchers deep inside
        # the flax modules read it WHILE this function traces, and wrap their
        # pallas_calls in shard_map over 'dp' (ops/sharding.py)
        with use_kernel_mesh(mesh):
            return _generate_body(state, batch)

    return generate_step
