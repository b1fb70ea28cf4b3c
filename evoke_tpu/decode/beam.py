"""Jittable generation: batched beam search + greedy/stochastic sampling.

Behavioral contracts from EVOKE modules/caption_model.py:26-202 (beam_search) and
modules/att_model.py:139-229 (_sample):

- Beam search (group_size=1): classic beam step over joint log-probs; a beam
  that emits EOS (or reaches max length, where ALL beams finish) is recorded
  with ``p = length_penalty(len, sum_logprob)`` and its alive score is knocked
  down by 1000 (caption_model.py:175-196). The best recorded beam per sample is
  the output. Trigram blocking does NOT apply in the beam path (it lives in
  _sample only) — matching the reference even though the config sets
  block_trigrams=1 with beam_size=3.
- Greedy/sample path: per-step sampling (greedy / temperature / top-k / top-p)
  with optional decoding_constraint (forbid repeating the previous token) and
  trigram blocking (logprob += count * -0.693 * 2.0, att_model.py:185-209);
  sequences freeze to PAD after EOS.

Idiomatic-TPU departure: the reference's Python-loop-per-token with full-prefix
re-decode is replaced by a ``lax.scan`` over a KV-cached ``step`` callable —
fixed max_len iterations, static shapes, no host sync inside the loop.
"""

from __future__ import annotations

import os
from functools import partial
from typing import Callable, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

NEG_INF = -1e9

# step signature: (tok [N], pos scalar, state) -> (logp [N, V], state)
StepFn = Callable


def topk(x: jnp.ndarray, k: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Exact top-k over the last axis, tie-order identical to ``lax.top_k``.

    EVOKE_TOPK=iter swaps the sort-based ``lax.top_k`` custom call for k
    unrolled argmax passes (k <= 8). Measured and NOT a win end-to-end, so
    sort stays the default: dispatch-free at the serving stage-1 shape
    [192, 30001] bf16 the argmax form is faster (107.3 -> 74.5 us/apply on
    v5e-1 — the sibling max/argmax reduces fuse to near a SINGLE argmax's
    cost), but in the real serving loop the interleaved A/B read 599.6 (sort)
    vs 595.4 (iter) r/s at 224 batch 64 — the three serialized reduce ops it
    puts on the step's dependency chain cost more than the one sort call they
    replace (DESIGN 5i: op-chain latency, not bytes, binds the loop). Tokens
    were 100% identical on-chip. Ties resolve to the lowest index in both
    formulations (argmax returns the first maximum; the sort is stable),
    asserted equal on random bf16 data (dense with exact ties) in
    tests/test_decode.py.
    """
    if k > 8 or os.environ.get("EVOKE_TOPK", "sort") == "sort":
        return jax.lax.top_k(x, k)
    neg = jnp.asarray(NEG_INF, x.dtype)
    iota = jnp.arange(x.shape[-1], dtype=jnp.int32)
    vals, idxs = [], []
    xw = x
    for _ in range(k):
        idx = jnp.argmax(xw, axis=-1).astype(jnp.int32)
        vals.append(jnp.take_along_axis(xw, idx[..., None], axis=-1)[..., 0])
        idxs.append(idx)
        xw = jnp.where(iota == idx[..., None], neg, xw)
    return jnp.stack(vals, -1), jnp.stack(idxs, -1)


def penalty_fn(spec: str) -> Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray]:
    """Length penalty builder (EVOKE modules/utils.py:160-211 semantics).

    '' -> identity; 'wu_a' -> score / (((5+len)/6)**a); 'avg_a' -> score / len**a.
    """
    if not spec:
        return lambda length, score: score
    name, _, alpha = spec.partition("_")
    a = float(alpha) if alpha else 0.0
    if name == "wu":
        return lambda length, score: score / (((5.0 + length) / 6.0) ** a)
    if name == "avg":
        return lambda length, score: score / jnp.maximum(length, 1.0) ** a
    raise ValueError(f"unknown length penalty {spec!r}")


class BeamResult(NamedTuple):
    seqs: jnp.ndarray        # [B, beam, L] best-first
    scores: jnp.ndarray      # [B, beam] length-penalized log-probs
    alive_logp: jnp.ndarray  # [B, beam] raw running sums (diagnostic)


def _gather_beams(tree, beam_idx, batch: int, beam: int, pos=None):
    """Reindex the leading N=B*beam axis of every leaf by beam_idx [B, beam].

    Dict entries whose key starts with 'cross' are skipped: the encoder-side
    cross K/V are kept beam-invariant (one row per sample) — all beams of a
    sample attend identical rows (models/layers.py attend shared-KV path).

    If the state carries an ``anc`` beam-ancestor table (ancestor_kv mode),
    the self-attn KV caches are NOT gathered either — they stay physically
    un-permuted and ``anc`` records each surviving beam's lineage instead
    (models/layers.py cached_self_attention). Here that lineage advances:
    new beam b of sample s descends from physical row beam_idx[s, b], so its
    history is that row's history and its slot-``pos`` entry IS beam_idx[s, b]
    (the step wrote row j's new K/V at (j, pos) before the top-k). This turns
    the per-step cache reorder (gather-read + write of every [N, L, D] cache)
    into an [B, beam, L] int32 shuffle."""
    flat_idx = (beam_idx + jnp.arange(batch)[:, None] * beam).reshape(-1)

    def gather(x):
        if x.ndim >= 1 and x.shape[0] == batch * beam:
            return x[flat_idx]
        if x.ndim >= 2 and x.shape[0] != batch * beam and x.shape[1] == batch * beam:
            # stacked-per-layer caches: [layers, N, ...]
            return x[:, flat_idx]
        return x

    if isinstance(tree, dict) and "anc" in tree:
        assert pos is not None, "ancestor_kv gather needs the step position"
        out = {}
        for k, v in tree.items():
            if k.startswith("cross") or k.startswith("cache_"):
                out[k] = v  # caches AND their int8 scales stay un-permuted
            elif k == "anc":
                a = jnp.take_along_axis(v, beam_idx[:, :, None], axis=1)
                out[k] = jax.lax.dynamic_update_index_in_dim(
                    a, beam_idx, pos, axis=2)
            else:
                out[k] = jax.tree_util.tree_map(gather, v)
        return out
    if isinstance(tree, dict):
        return {k: (v if k.startswith("cross")
                    else jax.tree_util.tree_map(gather, v))
                for k, v in tree.items()}
    return jax.tree_util.tree_map(gather, tree)


def _next_after(schedule: Tuple[int, ...], seg_end: int) -> int:
    return schedule[schedule.index(seg_end) + 1]


def _validate_schedule(schedule: Tuple[int, ...], max_len: int) -> Tuple[int, ...]:
    """Cache schedules must strictly ascend and end at max_len — a malformed
    schedule would silently skip decode segments via the while_loop cond."""
    schedule = tuple(schedule)
    assert schedule and schedule[-1] == max_len and all(
        a < b for a, b in zip(schedule, schedule[1:])), \
        f"cache_schedule {schedule} must strictly ascend and end at max_len={max_len}"
    return schedule


def grow_caches(state, new_len: int):
    """Zero-pad the time axis (1) of the self-attention KV caches to new_len.

    All decoders in this framework keep per-layer tuples of [N, L, D] caches
    under ``cache_k``/``cache_v``; slots >= the current position are never read
    (the step's self mask is ``arange(L) <= pos``), so padding mid-decode is
    exact. A state without that layout fails LOUDLY: sized-to-schedule[0]
    caches that never grow would make dynamic_update_slice clamp writes at
    pos >= schedule[0], silently corrupting the last cache slot."""
    if not isinstance(state, dict) or not {"cache_k", "cache_v"} <= set(state):
        raise TypeError(
            "grow_caches: a multi-phase cache_schedule requires a dict decode "
            "state with 'cache_k'/'cache_v' [N, L, D] caches; got "
            f"{type(state).__name__} with keys "
            f"{sorted(state) if isinstance(state, dict) else 'n/a'}. Use "
            "cache_phases=1 (single-phase) for decoders with a different state layout.")

    def pad(x, axis=1):
        if x.shape[axis] >= new_len:
            return x
        shape = list(x.shape)
        shape[axis] = new_len - x.shape[axis]
        return jnp.concatenate([x, jnp.zeros(shape, x.dtype)], axis=axis)

    out = {key: (jax.tree_util.tree_map(pad, v)
                 if key in ("cache_k", "cache_v", "cache_k_scale", "cache_v_scale")
                 else v)
           for key, v in state.items()}
    if "anc" in out:
        # the ancestor table's time axis is last ([B, beam, L]); padded slots
        # are overwritten at their step before ever being read
        out["anc"] = pad(out["anc"], axis=2)
        assert out["anc"].shape[2] == new_len
    for key in ("cache_k", "cache_v"):
        for leaf in jax.tree_util.tree_leaves(out[key]):
            assert leaf.shape[1] == new_len, \
                f"grow_caches: {key} time axis {leaf.shape[1]} != target {new_len}"
    return out


def beam_search(step: StepFn, state0, batch: int, *, bos_id: int, eos_id: int, pad_id: int,
                vocab_size: int, beam_size: int = 3, max_len: int = 100,
                length_penalty: str = "", suppress_ids: Tuple[int, ...] = (),
                decoding_constraint: bool = False, early_stop: bool = True,
                unroll: int = 1, raw_logits: bool = False,
                cache_schedule: Optional[Tuple[int, ...]] = None,
                ancestor_kv: bool = False, fused_topk: bool = False,
                chain_split: int = 1) -> BeamResult:
    """Batched beam search over a KV-cached step function.

    ``state0`` must already be sized for N = batch * beam_size rows (broadcast
    your per-sample encodings beam_size times before building it).

    early_stop=True runs a bounded while_loop that exits once every beam of
    every sample has finished (emitted EOS). With the default identity length
    penalty this is output-identical to the full max_len scan (knocked-down
    zombie beams score ~-1000 and cannot re-enter the done buffer); under
    wu_/avg_ penalties a pathological zombie could theoretically re-rank, so
    pass early_stop=False for bit-parity there. Real reports finish in ~60 of
    100 steps, so decode latency tracks actual lengths.

    cache_schedule: ascending cache lengths ending at max_len, e.g. (50, 100).
    ``state0``'s caches must be sized to schedule[0]; segment i runs steps
    t in [schedule[i-1], schedule[i]) with caches of length schedule[i], and
    caches are zero-padded between segments. The per-step beam reorder and
    cache attention are HBM-bandwidth-bound and linear in cache length, so
    early steps paying only for the slots they can reach is a measured win
    (the decode loop is ~2/3 cache-traffic at batch 32 x beam 3 on v5e).

    raw_logits=True: ``step`` returns UNNORMALIZED logits instead of log-probs,
    and the beam step runs a two-stage exact top-k: per-beam top-k over the
    raw logits (log_softmax is a per-row monotone shift, so the within-row
    top-k set is identical), then exact f32 log-prob scores for the k*k
    winners via a logsumexp, then the joint top-k over those k*k. This never
    materializes the [N, V] f32 log-prob array and shrinks the expensive
    top-k from [batch, k*V] to [N, V] + [batch, k*k] — a large-vocab win
    (the real WordLevel vocab is ~30k; measured on v5e @224 batch 32).
    Output-identical to the log-prob path (CPU f32 parity-tested).

    fused_topk=True (implies raw_logits): ``step`` already ran stage 1 —
    it returns ((vals [N, k] f32, idx [N, k] i32, lse [N] f32), state) from
    the fused Pallas vocab-tail kernel (ops/fused_logit_topk.py), with
    suppression applied INSIDE the step; suppress_ids/decoding_constraint
    must be empty here. Stage 2 (exact joint top-k over k*k) is unchanged.
    """
    k = beam_size
    n = batch * k
    if fused_topk:
        assert raw_logits, "fused_topk requires the raw_logits contract"
        assert not suppress_ids and not decoding_constraint, \
            "fused_topk steps apply suppression inside the kernel; pass " \
            "suppress_ids=() and decoding_constraint=False to beam_search"
    lp = penalty_fn(length_penalty)
    schedule = (_validate_schedule(cache_schedule, max_len)
                if cache_schedule is not None else (max_len,))
    # chain_split > 1: the decode state is a TUPLE of per-sub-batch states and
    # ``step`` runs the model once per sub-batch inside the loop body (full-
    # width tok in, full-width scores out). The beam bookkeeping stays full-
    # width; only the state-side ops (gather/grow) apply per sub-state. This
    # hands XLA ``chain_split`` independent dependency chains to schedule into
    # each other's bubbles — the TPU analogue of concurrent CUDA streams for
    # a latency-bound step (DESIGN 5i/5n).
    cs = max(int(chain_split), 1)
    if cs > 1:
        assert batch % cs == 0, f"batch {batch} must divide by chain_split {cs}"
        assert isinstance(state0, tuple) and len(state0) == cs, \
            "chain_split needs state0 as a tuple of per-sub-batch decode states"
    bh = batch // cs

    def _state_map(fn, state):
        return tuple(fn(s, i) for i, s in enumerate(state)) if cs > 1 \
            else fn(state, 0)

    def _gather_split(state, beam_idx, pos):
        if cs == 1:
            return _gather_beams(state, beam_idx, batch, k, pos=pos)
        return tuple(_gather_beams(s, beam_idx[i * bh:(i + 1) * bh], bh, k, pos=pos)
                     for i, s in enumerate(state))

    if ancestor_kv:
        # caches stay un-permuted; an [B, k, L] ancestor table tracks lineages
        # (_gather_beams / models/layers.py cached_self_attention)
        def add_anc(s, _i):
            assert isinstance(s, dict) and "cache_k" in s, \
                "ancestor_kv needs a dict decode state with cache_k/cache_v"
            lcache = jax.tree_util.tree_leaves(s["cache_k"])[0].shape[1]
            return dict(s, anc=jnp.zeros((bh if cs > 1 else batch, k, lcache),
                                         jnp.int32))

        state0 = _state_map(add_anc, state0)

    def scan_body(carry, t):
        (tok, dec_state, alive_logp, seq, done_seq, done_score, ever_finished) = carry
        if fused_topk:
            # stage 1 + lse already fused into the step's Pallas vocab tail
            (vals, tok_cand, lse), dec_state = step(tok, t, dec_state)
            logp_cand = vals - lse[:, None]                  # both f32
            cand = alive_logp.reshape(n)[:, None] + logp_cand
            cand = cand.reshape(batch, k, k)
            cand = jnp.where((t == 0) & (jnp.arange(k)[None, :, None] > 0),
                             NEG_INF, cand)
            scores, flat_idx = topk(cand.reshape(batch, k * k), k)
            beam_idx = flat_idx // k
            tok_idx = jnp.take_along_axis(tok_cand.reshape(batch, k * k),
                                          flat_idx, axis=1)
        elif raw_logits:
            logits, dec_state = step(tok, t, dec_state)      # [N, V] unnormalized
            lse = jax.scipy.special.logsumexp(
                logits.astype(jnp.float32), axis=-1)         # [N]
            for sid in suppress_ids:
                logits = logits.at[:, sid].add(-1000.0)
            if decoding_constraint:
                logits = jnp.where(jax.nn.one_hot(tok, vocab_size, dtype=bool),
                                   NEG_INF, logits)
            # stage 1: within-row top-k on raw logits (== top-k on log-probs)
            vals, tok_cand = topk(logits, k)                 # [N, k]
            logp_cand = vals.astype(jnp.float32) - lse[:, None]
            cand = alive_logp.reshape(n)[:, None] + logp_cand
            cand = cand.reshape(batch, k, k)
            cand = jnp.where((t == 0) & (jnp.arange(k)[None, :, None] > 0),
                             NEG_INF, cand)
            # stage 2: exact joint top-k over the k*k survivors
            scores, flat_idx = topk(cand.reshape(batch, k * k), k)
            beam_idx = flat_idx // k
            tok_idx = jnp.take_along_axis(tok_cand.reshape(batch, k * k),
                                          flat_idx, axis=1)
        else:
            logp, dec_state = step(tok, t, dec_state)        # [N, V]
            for sid in suppress_ids:
                logp = logp.at[:, sid].add(-1000.0)
            if decoding_constraint:
                prev = tok  # forbid immediate repetition
                logp = jnp.where(jax.nn.one_hot(prev, vocab_size, dtype=bool),
                                 NEG_INF, logp)
            logp = logp.reshape(batch, k, vocab_size)

            cand = alive_logp[:, :, None] + logp             # [B, k, V]
            # at t=0 all beams are identical BOS copies: keep only beam 0's
            cand = jnp.where((t == 0) & (jnp.arange(k)[None, :, None] > 0),
                             NEG_INF, cand)
            flat = cand.reshape(batch, k * vocab_size)
            scores, idx = topk(flat, k)                      # [B, k]
            beam_idx = idx // vocab_size
            tok_idx = idx % vocab_size

        seq = jnp.take_along_axis(seq, beam_idx[:, :, None], axis=1)
        seq = jax.lax.dynamic_update_index_in_dim(seq, tok_idx, t, axis=2)
        dec_state = _gather_split(dec_state, beam_idx, t)

        finished = (tok_idx == eos_id) | (t == max_len - 1)  # [B, k]
        length = jnp.float32(t + 1)
        fin_score = jnp.where(finished, lp(length, scores), NEG_INF)

        # merge newly finished beams into the done buffer (keep top-k by score)
        all_scores = jnp.concatenate([done_score, fin_score], axis=1)       # [B, 2k]
        all_seqs = jnp.concatenate([done_seq, seq], axis=1)                  # [B, 2k, L]
        top_scores, top_idx = topk(all_scores, k)
        done_seq = jnp.take_along_axis(all_seqs, top_idx[:, :, None], axis=1)
        done_score = top_scores

        alive_logp = scores - 1000.0 * finished.astype(jnp.float32)
        # a beam lineage counts as finished once any ancestor emitted EOS
        ever_finished = jnp.take_along_axis(ever_finished, beam_idx, axis=1) | finished
        return (tok_idx.reshape(n), dec_state, alive_logp, seq, done_seq, done_score,
                ever_finished), None

    init = (
        jnp.full((n,), bos_id, jnp.int32),
        state0,
        jnp.zeros((batch, k), jnp.float32),
        jnp.full((batch, k, max_len), pad_id, jnp.int32),
        jnp.full((batch, k, max_len), pad_id, jnp.int32),
        jnp.full((batch, k), NEG_INF, jnp.float32),
        jnp.zeros((batch, k), bool),
    )
    if early_stop:
        def body(loop_state):
            t, carry = loop_state
            carry, _ = scan_body(carry, t)
            return t + 1, carry

        t, carry = jnp.int32(0), init
        for seg_end in schedule:
            def cond(loop_state, end=seg_end):
                t_, carry_ = loop_state
                return (t_ < end) & ~jnp.all(carry_[6])

            t, carry = jax.lax.while_loop(cond, body, (t, carry))
            if seg_end != schedule[-1]:
                nxt = _next_after(schedule, seg_end)
                carry = carry[:1] + (_state_map(lambda s, _i: grow_caches(s, nxt),
                                                carry[1]),) + carry[2:]
        (tok, dec_state, alive_logp, seq, done_seq, done_score, _ever) = carry
    else:
        carry, t0 = init, 0
        for seg_end in schedule:
            carry, _ = jax.lax.scan(scan_body, carry, jnp.arange(t0, seg_end),
                                    unroll=unroll)
            t0 = seg_end
            if seg_end != schedule[-1]:
                nxt = _next_after(schedule, seg_end)
                carry = carry[:1] + (_state_map(lambda s, _i: grow_caches(s, nxt),
                                                carry[1]),) + carry[2:]
        (tok, dec_state, alive_logp, seq, done_seq, done_score, _ever) = carry

    # zero out everything after (and excluding nothing) — tokens after EOS become PAD
    pos = jnp.arange(max_len)[None, None, :]
    is_eos = done_seq == eos_id
    first_eos = jnp.where(is_eos.any(-1), jnp.argmax(is_eos, axis=-1), max_len)
    done_seq = jnp.where(pos > first_eos[:, :, None], pad_id, done_seq)
    return BeamResult(done_seq, done_score, alive_logp)


def diverse_beam_search(step: StepFn, state0_per_group, batch: int, *, bos_id: int,
                        eos_id: int, pad_id: int, vocab_size: int, beam_size: int,
                        group_size: int, max_len: int = 100,
                        diversity_lambda: float = 0.5,
                        length_penalty: str = "",
                        ancestor_kv: bool = False) -> BeamResult:
    """Diverse beam search (caption_model.py:26-202 with group_size > 1).

    The beam is split into ``group_size`` groups of bdash = beam_size//group_size
    beams. Groups run staggered in time; at each step, group g's log-probs are
    penalized by diversity_lambda for every earlier group's beam that chose the
    same token at the same LOCAL time (add_diversity, caption_model.py:29-48).
    ``state0_per_group`` is a list of decode states, each sized batch * bdash.

    Implemented as ONE lax.scan over global time; groups are processed in order
    inside the step so group g reads the already-advanced tables of groups < g,
    exactly like the reference's in-loop ordering.
    """
    g = group_size
    bdash = beam_size // g
    assert bdash * g == beam_size, "beam_size must divide by group_size"
    n = batch * bdash
    lp = penalty_fn(length_penalty)
    if ancestor_kv and bdash > 1:
        assert all(isinstance(s0, dict) and "cache_k" in s0 for s0 in state0_per_group)
        state0_per_group = [
            dict(s0, anc=jnp.zeros(
                (batch, bdash,
                 jax.tree_util.tree_leaves(s0["cache_k"])[0].shape[1]), jnp.int32))
            for s0 in state0_per_group]

    def empty_group_carry(state0):
        return {
            "tok": jnp.full((n,), bos_id, jnp.int32),
            "dec": state0,
            "alive": jnp.zeros((batch, bdash), jnp.float32),
            "seq": jnp.full((batch, bdash, max_len), pad_id, jnp.int32),
            "done_seq": jnp.full((batch, bdash, max_len), pad_id, jnp.int32),
            "done_score": jnp.full((batch, bdash), NEG_INF, jnp.float32),
        }

    def group_step(carry, t_local, penalty):
        """One beam step for one group at its local time (penalty: [B, V])."""
        logp, dec = step(carry["tok"], t_local, carry["dec"])
        logp = logp.reshape(batch, bdash, vocab_size)
        logp = logp - penalty[:, None, :] * diversity_lambda
        cand = carry["alive"][:, :, None] + logp
        cand = jnp.where((t_local == 0) & (jnp.arange(bdash)[None, :, None] > 0),
                         NEG_INF, cand)
        scores, idx = topk(cand.reshape(batch, bdash * vocab_size), bdash)
        beam_idx = idx // vocab_size
        tok_idx = idx % vocab_size
        seq = jnp.take_along_axis(carry["seq"], beam_idx[:, :, None], axis=1)
        seq = jax.lax.dynamic_update_index_in_dim(seq, tok_idx, t_local, axis=2)
        dec = _gather_beams(dec, beam_idx, batch, bdash, pos=t_local)
        finished = (tok_idx == eos_id) | (t_local == max_len - 1)
        fin_score = jnp.where(finished, lp(jnp.float32(t_local + 1), scores), NEG_INF)
        all_scores = jnp.concatenate([carry["done_score"], fin_score], axis=1)
        all_seqs = jnp.concatenate([carry["done_seq"], seq], axis=1)
        top_scores, top_idx = topk(all_scores, bdash)
        return {
            "tok": tok_idx.reshape(n),
            "dec": dec,
            "alive": scores - 1000.0 * finished.astype(jnp.float32),
            "seq": seq,
            "done_seq": jnp.take_along_axis(all_seqs, top_idx[:, :, None], axis=1),
            "done_score": top_scores,
        }

    def scan_body(carries, t):
        new_carries = []
        for divm in range(g):
            carry = carries[divm]
            t_local = t - divm
            # diversity penalty: count earlier groups' choices at this local time
            penalty = jnp.zeros((batch, vocab_size), jnp.float32)
            for prev in range(divm):
                prev_seq = new_carries[prev]["seq"]  # already advanced this outer step
                chosen = jax.lax.dynamic_index_in_dim(prev_seq, jnp.maximum(t_local, 0),
                                                      axis=2, keepdims=False)  # [B, bdash]
                onehot = jax.nn.one_hot(chosen, vocab_size, dtype=jnp.float32)
                penalty = penalty + onehot.sum(axis=1)
            active = (t >= divm) & (t <= max_len + divm - 1)
            stepped = group_step(carry, jnp.maximum(t_local, 0), penalty)
            carry = jax.tree_util.tree_map(
                lambda new, old: jnp.where(active, new, old), stepped, carry)
            new_carries.append(carry)
        return new_carries, None

    init = [empty_group_carry(s0) for s0 in state0_per_group]
    carries, _ = jax.lax.scan(scan_body, init, jnp.arange(max_len + g - 1))

    # merge all groups' done beams, best-first (done_beams_table sum, :196-199)
    seqs = jnp.concatenate([c["done_seq"] for c in carries], axis=1)
    scores = jnp.concatenate([c["done_score"] for c in carries], axis=1)
    order = jnp.argsort(-scores, axis=1)
    seqs = jnp.take_along_axis(seqs, order[:, :, None], axis=1)
    scores = jnp.take_along_axis(scores, order, axis=1)
    pos = jnp.arange(max_len)[None, None, :]
    is_eos = seqs == eos_id
    first_eos = jnp.where(is_eos.any(-1), jnp.argmax(is_eos, axis=-1), max_len)
    seqs = jnp.where(pos > first_eos[:, :, None], pad_id, seqs)
    alive = jnp.concatenate([c["alive"] for c in carries], axis=1)
    return BeamResult(seqs, scores, alive)


def _trigram_penalty(seq: jnp.ndarray, t, vocab_size: int, alpha: float = 2.0) -> jnp.ndarray:
    """Penalty over vocab for step t given generated prefix seq [N, L].

    Counts tokens w such that (seq[t-2], seq[t-1], w) already occurred as a
    trigram; penalty = count * (-0.693 * alpha) (att_model.py:185-209).
    """
    n, l = seq.shape
    prev_a = jax.lax.dynamic_index_in_dim(seq, t - 2, axis=1, keepdims=False)
    prev_b = jax.lax.dynamic_index_in_dim(seq, t - 1, axis=1, keepdims=False)
    idx = jnp.arange(l)
    # match at position i: seq[:, i-2] == prev_a and seq[:, i-1] == prev_b, for 2 <= i < t
    shifted2 = jnp.roll(seq, 2, axis=1)
    shifted1 = jnp.roll(seq, 1, axis=1)
    match = (shifted2 == prev_a[:, None]) & (shifted1 == prev_b[:, None])
    match = match & (idx[None, :] >= 2) & (idx[None, :] < t)
    counts = jnp.zeros((n, vocab_size), jnp.float32).at[
        jnp.arange(n)[:, None], seq].add(match.astype(jnp.float32))
    return counts * (-0.693 * alpha)


def _make_sampler(sample_method: str, temperature: float, top_k: int, top_p: float):
    """(logp [B, V], key) -> next token [B]: greedy / temperature / top-k /
    top-p, the sample_next_word dispatch (att_model.py:363-401)."""
    if sample_method == "top_k":
        assert top_k > 0, "sample_method='top_k' requires top_k > 0 (it would " \
                          "silently degrade to plain sampling)"
    if sample_method == "top_p":
        assert 0.0 < top_p <= 1.0, "sample_method='top_p' requires 0 < top_p <= 1"

    def sample_next(logp, key):
        if sample_method == "greedy":
            return jnp.argmax(logp, -1).astype(jnp.int32)
        scaled = logp / temperature
        if sample_method == "top_k" and top_k > 0:
            kth = jax.lax.top_k(scaled, top_k)[0][:, -1:]
            scaled = jnp.where(scaled < kth, NEG_INF, scaled)
        elif sample_method == "top_p" and top_p > 0.0:
            sorted_lp = jnp.sort(scaled, axis=-1)[:, ::-1]
            probs = jax.nn.softmax(sorted_lp, axis=-1)
            cum = jnp.cumsum(probs, axis=-1)
            cutoff_idx = jnp.sum(cum < top_p, axis=-1)
            cutoff = jnp.take_along_axis(sorted_lp, cutoff_idx[:, None], axis=-1)
            scaled = jnp.where(scaled < cutoff, NEG_INF, scaled)
        return jax.random.categorical(key, scaled).astype(jnp.int32)

    return sample_next


def greedy_sample(step: StepFn, state0, batch: int, *, bos_id: int, eos_id: int, pad_id: int,
                  vocab_size: int, max_len: int = 100, sample_method: str = "greedy",
                  temperature: float = 1.0, top_k: int = 0, top_p: float = 0.0,
                  block_trigrams: bool = True, decoding_constraint: bool = False,
                  rng: Optional[jax.Array] = None,
                  cache_schedule: Optional[Tuple[int, ...]] = None
                  ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Single-beam sampling with trigram blocking. Returns (seq [B, L], logp_sum [B])."""
    if rng is None:
        rng = jax.random.key(0)
    schedule = (_validate_schedule(cache_schedule, max_len)
                if cache_schedule is not None else (max_len,))
    sample_next = _make_sampler(sample_method, temperature, top_k, top_p)

    def scan_body(carry, t):
        tok, dec_state, unfinished, seq, logp_sum, key = carry
        logp, dec_state = step(tok, t, dec_state)            # [B, V]
        if decoding_constraint:
            prev_oh = jax.nn.one_hot(tok, vocab_size, dtype=bool)
            logp = jnp.where((t > 0) & prev_oh, NEG_INF, logp)
        if block_trigrams:
            pen = jax.lax.cond(t >= 3,
                               lambda: _trigram_penalty(seq, t, vocab_size),
                               lambda: jnp.zeros((batch, vocab_size), jnp.float32))
            logp = logp + pen
        key, sub = jax.random.split(key)
        nxt = sample_next(logp, sub)
        nxt = jnp.where(unfinished, nxt, pad_id)
        picked = jnp.take_along_axis(logp, nxt[:, None], axis=-1)[:, 0]
        logp_sum = logp_sum + picked * unfinished.astype(jnp.float32)
        unfinished = unfinished & (nxt != eos_id)
        seq = jax.lax.dynamic_update_index_in_dim(seq, nxt, t, axis=1)
        return (nxt, dec_state, unfinished, seq, logp_sum, key), None

    init = (
        jnp.full((batch,), bos_id, jnp.int32),
        state0,
        jnp.ones((batch,), bool),
        jnp.full((batch, max_len), pad_id, jnp.int32),
        jnp.zeros((batch,), jnp.float32),
        rng,
    )

    # early exit when every row has emitted EOS (the reference breaks there too,
    # att_model.py:227-229) — exact parity, latency tracks actual lengths.
    def body(loop_state):
        t, carry = loop_state
        carry, _ = scan_body(carry, t)
        return t + 1, carry

    t, carry = jnp.int32(0), init
    for seg_end in schedule:
        def cond(loop_state, end=seg_end):
            t_, carry_ = loop_state
            return (t_ < end) & jnp.any(carry_[2])

        t, carry = jax.lax.while_loop(cond, body, (t, carry))
        if seg_end != schedule[-1]:
            carry = carry[:1] + (grow_caches(carry[1], _next_after(schedule, seg_end)),
                                 ) + carry[2:]
    (tok, dec_state, unfinished, seq, logp_sum, _) = carry
    return seq, logp_sum


def diverse_sample(step: StepFn, state0_per_group, batch: int, *, bos_id: int,
                   eos_id: int, pad_id: int, vocab_size: int, group_size: int,
                   max_len: int = 100, sample_method: str = "greedy",
                   temperature: float = 1.0, top_k: int = 0, top_p: float = 0.0,
                   diversity_lambda: float = 0.5, block_trigrams: bool = True,
                   decoding_constraint: bool = False,
                   rng: Optional[jax.Array] = None
                   ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Diverse sampling (att_model.py:231-320 ``_diverse_sample``).

    ``group_size`` staggered sampling chains per study; at each step, group
    g's log-probs are penalized by ``diversity_lambda`` at the tokens earlier
    groups chose at the same LOCAL time, then one token is sampled
    (greedy/temperature/top-k/top-p). Normalization follows the reference:
    ``log_softmax(logprobs / temperature)`` re-normalized BEFORE sampling at
    temperature 1 (att_model.py:267) — unlike ``greedy_sample``, where the
    temperature divides un-renormalized log-probs at the sampling step.
    ``state0_per_group``: list of ``group_size`` decode states, each sized
    ``batch`` rows. Returns (seqs [B, G, L] PAD-frozen after EOS,
    logp_sum [B, G]).

    Two deliberate departures from the reference, both documented here
    because they change only degenerate behavior:

    - the reference's diversity penalty ``logprobs[:, prev_decisions] -= l``
      (att_model.py:275) fancy-indexes with the whole batch's choices,
      penalizing every study by every OTHER study's tokens (an upstream
      indexing artifact that makes outputs depend on batch composition);
      this implementation penalizes each study by its own earlier groups
      only.
    - the reference's ``unfinished`` recomputation (att_model.py:316) has a
      precedence bug (``!=`` binds before ``&``) that lets rows keep
      sampling past EOS; rows here freeze to PAD after EOS, like
      ``greedy_sample`` and the reference's own ``_sample``. Decoded text is
      EOS-truncated either way.
    """
    g = group_size
    lam = diversity_lambda
    if rng is None:
        rng = jax.random.key(0)
    sample_next = _make_sampler(sample_method, 1.0, top_k, top_p)

    def empty_group_carry(state0, i):
        return {
            "tok": jnp.full((batch,), bos_id, jnp.int32),
            "dec": state0,
            "unfinished": jnp.ones((batch,), bool),
            "seq": jnp.full((batch, max_len), pad_id, jnp.int32),
            "logp_sum": jnp.zeros((batch,), jnp.float32),
            "key": jax.random.fold_in(rng, i),
        }

    def group_step(carry, t_local, penalty):
        logp, dec = step(carry["tok"], t_local, carry["dec"])
        logp = jax.nn.log_softmax(logp / temperature, axis=-1)
        logp = logp - penalty * lam
        if decoding_constraint:
            prev_oh = jax.nn.one_hot(carry["tok"], vocab_size, dtype=bool)
            logp = jnp.where((t_local > 0) & prev_oh, NEG_INF, logp)
        if block_trigrams:
            pen = jax.lax.cond(
                t_local >= 3,
                lambda: _trigram_penalty(carry["seq"], t_local, vocab_size),
                lambda: jnp.zeros((batch, vocab_size), jnp.float32))
            logp = logp + pen
        key, sub = jax.random.split(carry["key"])
        nxt = sample_next(logp, sub)
        nxt = jnp.where(carry["unfinished"], nxt, pad_id)
        picked = jnp.take_along_axis(logp, nxt[:, None], axis=-1)[:, 0]
        logp_sum = carry["logp_sum"] + picked * carry["unfinished"].astype(jnp.float32)
        unfinished = carry["unfinished"] & (nxt != eos_id)
        seq = jax.lax.dynamic_update_index_in_dim(carry["seq"], nxt, t_local, axis=1)
        return {"tok": nxt, "dec": dec, "unfinished": unfinished, "seq": seq,
                "logp_sum": logp_sum, "key": key}

    def scan_body(carries, t):
        new_carries = []
        for divm in range(g):
            carry = carries[divm]
            t_local = jnp.maximum(t - divm, 0)
            # penalty: earlier groups' choices at this local time (they are
            # ahead in local time, so slot t_local is already written)
            penalty = jnp.zeros((batch, vocab_size), jnp.float32)
            for prev in range(divm):
                chosen = jax.lax.dynamic_index_in_dim(
                    new_carries[prev]["seq"], t_local, axis=1, keepdims=False)
                penalty = penalty + jax.nn.one_hot(chosen, vocab_size,
                                                   dtype=jnp.float32)
            active = (t >= divm) & (t <= max_len + divm - 1)
            stepped = group_step(carry, t_local, penalty)
            carry = jax.tree_util.tree_map(
                lambda new, old: jnp.where(active, new, old), stepped, carry)
            new_carries.append(carry)
        return new_carries, None

    init = [empty_group_carry(s0, i) for i, s0 in enumerate(state0_per_group)]
    carries, _ = jax.lax.scan(scan_body, init, jnp.arange(max_len + g - 1))
    seqs = jnp.stack([c["seq"] for c in carries], axis=1)       # [B, G, L]
    pos = jnp.arange(max_len)[None, None, :]
    is_eos = seqs == eos_id
    first_eos = jnp.where(is_eos.any(-1), jnp.argmax(is_eos, axis=-1), max_len)
    seqs = jnp.where(pos > first_eos[:, :, None], pad_id, seqs)
    logp = jnp.stack([c["logp_sum"] for c in carries], axis=1)  # [B, G]
    return seqs, logp
