"""Continuous-batching beam serving: refill finished slots mid-stream.

The batched serving path (serve.py + decode/beam.py) decodes a batch until its
SLOWEST study finishes: with the real MIMIC generated-length distribution
(mean 56.5 tokens, p50 54, p90 84, p99 ~100 — measured over the reference's
released 3852 test predictions, generated_reports/MIMIC-CXR/resolution-224x224/
test_prediction.csv), a 64-study batch almost always pays the full 100 steps,
so ~43% of every decode step advances already-finished reports. This module
keeps the batch full instead: finished studies are harvested at segment
boundaries and their slots re-admitted from a queue of pre-encoded studies,
bounding the waste to the sync cadence (ceiling mean_batch_max/mean_len =
1.77x; engine efficiency ~ mean_len / (mean_len + seg_steps/2) of it).

The TPU-shaped core is the RING CACHE: per-row scatter writes are
catastrophically slow on TPU (measured 424 us/write for [192,100,512] bf16 vs
5 us for a shared dynamic_update_slice, 265 s compile), so instead of giving
every slot its own write position, every row writes at the SAME physical slot
``t mod L`` and each slot remembers where its logical position 0 lives
(``base``). Reads stay exact because attention is permutation-invariant given
the mask — the positional embedding is added to the input embedding, never
inside K/V — so validity is pure ring arithmetic: physical slot j is readable
for a row of age a iff (pos - j) mod L <= a (models/layers.py
cached_self_attention). Per-row state (positional embedding at per-row age,
ring masks) rides gathers — the ops TPUs do well — and the per-step cache
write stays the one DUS the hardware likes. Admission resets only slot
bookkeeping + relational memory + cross K/V (~300 KB per study); stale ring
contents are unreadable at age 0, so the [N, L, D] caches are never cleared.

No reference analogue: EVOKE's Tester loops host-synced batches
(modules/trainer_v0401.py:592-620) with no serving layer at all. The beam
math inside a step is decode/beam.py's exactly (two-stage exact top-k over
raw logits, done-buffer merge, -1000 knockdowns), with the scalar step index
generalized to per-slot age; parity is asserted token-for-token against
beam_search in tests/test_continuous.py.
"""

from __future__ import annotations

import time
from collections import deque
from typing import Any, Callable, Dict, List, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from evoke_tpu.decode.beam import NEG_INF, _gather_beams, penalty_fn, topk

# step signature: (tok [N], phys_pos scalar, age_rows [N], dec_state,
#                  att_mask [B, P], aux [B]) -> (raw_logits [N, V], dec_state)
ContinuousStepFn = Callable


class SegmentOutputs(NamedTuple):
    """Per-segment harvest + admission report (slot-indexed, static shape).

    ``host_meta``/``best_seq`` duplicate the fields the serving driver needs
    in TWO dense int32 arrays so the per-segment host read is a single
    device_get (each separate fetch through a remote TPU runtime costs a
    ~30-60 ms round trip — measured, DESIGN 5l)."""

    harvested: jnp.ndarray   # [B] bool — slot finished and was freed this call
    tickets: jnp.ndarray     # [B] int32 — admission ticket of the harvested study
    seqs: jnp.ndarray        # [B, k, L] int32 — logical order, best-first, PAD after EOS
    scores: jnp.ndarray      # [B, k] f32 — length-penalized log-probs
    n_admitted: jnp.ndarray  # scalar int32 — pack rows consumed this call
    host_meta: jnp.ndarray   # [B+1, 2] int32 — rows 0..B-1: (harvested, ticket);
    #                          row B: (n_admitted, pack_pos after admission)
    best_seq: jnp.ndarray    # [B, L] int32 — seqs[:, 0] (the emitted report)


def init_carry(dec0: Dict[str, Any], att_mask0: jnp.ndarray, slots: int,
               beam_size: int, max_len: int, pad_id: int, bos_id: int
               ) -> Dict[str, Any]:
    """Engine state for ``slots`` studies x ``beam_size`` beams.

    ``dec0``: decode state from init_decode_state(zeros_enc, slots*beam,
    max_len) — its caches are the ring buffers; cross K/V are overwritten per
    admission. ``att_mask0`` should be all-ones (a fully-masked cross
    attention would put NaNs in inactive rows; with ones they attend zero
    K/V — finite — and real masks arrive with the first admission). All
    slots start inactive with ever_fin=True, so they are never harvested and
    their zombie steps cannot touch a done buffer.
    """
    n = slots * beam_size
    return {
        "dec": dec0,
        "att_mask": att_mask0,
        "t": jnp.zeros((), jnp.int32),
        "pack_pos": jnp.zeros((), jnp.int32),
        "age": jnp.zeros((slots,), jnp.int32),
        "base": jnp.zeros((slots,), jnp.int32),
        "active": jnp.zeros((slots,), bool),
        "ticket": jnp.full((slots,), -1, jnp.int32),
        "aux": jnp.zeros((slots,), jnp.int32),
        "tok": jnp.full((n,), bos_id, jnp.int32),
        "alive": jnp.zeros((slots, beam_size), jnp.float32),
        "seq": jnp.full((slots, beam_size, max_len), pad_id, jnp.int32),
        "done_seq": jnp.full((slots, beam_size, max_len), pad_id, jnp.int32),
        "done_score": jnp.full((slots, beam_size), NEG_INF, jnp.float32),
        "ever_fin": jnp.ones((slots, beam_size), bool),
    }


def make_segment_fn(step_fn: ContinuousStepFn, *, slots: int, beam_size: int,
                    seg_steps: int, bos_id: int, eos_id: int, pad_id: int,
                    vocab_size: int, max_len: int, length_penalty: str = "",
                    suppress_ids: Tuple[int, ...] = (), jit: bool = True,
                    fused_topk: bool = False):
    """Build the segment function: harvest -> admit -> ``seg_steps`` beam steps.

    ``fused_topk=True``: ``step_fn`` returns the fused vocab-tail triple
    (vals [N, k] f32, idx [N, k] i32, lse [N] f32) instead of raw logits —
    suppression is applied inside the step (ops/fused_logit_topk.py), so
    ``suppress_ids`` must be empty here.

    Returned signature: ``segment(carry, pack, pack_avail, reset_pos,
    memory0) -> (carry, SegmentOutputs)``.

    ``pack``: per-study encoder outputs, FIFO-admissible on rows
    ``pack_pos..pack_avail-1``: {'cross_k': tuple of [E, P, D], 'cross_v':
    tuple, 'att_mask': [E, P], 'ticket': [E] int32, 'aux': [E] int32}.
    The consumption offset ``pack_pos`` lives IN THE CARRY (device side):
    the host can keep several segments in flight without knowing how many
    rows each admitted — it passes ``reset_pos=True`` exactly when the pack
    argument changes, and learns consumption later from the lagged
    ``host_meta`` read. ``memory0``: [N, S*D] relational-memory reset
    template. Model weights belong INSIDE ``step_fn``'s closure over a jit
    argument (see ContinuousServer) — never as trace-time constants.
    """
    k = beam_size
    b = slots
    n = b * k
    lp = penalty_fn(length_penalty)

    def harvest(carry):
        frozen = jnp.all(carry["ever_fin"], axis=1)
        harvested = frozen & carry["active"]
        # unroll ring -> logical order, then PAD after first EOS (beam.py tail)
        idx = jnp.mod(carry["base"][:, None] + jnp.arange(max_len)[None, :], max_len)
        seqs = jnp.take_along_axis(carry["done_seq"], idx[:, None, :], axis=2)
        pos = jnp.arange(max_len)[None, None, :]
        is_eos = seqs == eos_id
        first_eos = jnp.where(is_eos.any(-1), jnp.argmax(is_eos, axis=-1), max_len)
        seqs = jnp.where(pos > first_eos[:, :, None], pad_id, seqs)
        out = SegmentOutputs(harvested=harvested, tickets=carry["ticket"],
                             seqs=seqs, scores=carry["done_score"],
                             n_admitted=jnp.zeros((), jnp.int32),
                             host_meta=jnp.zeros((b + 1, 2), jnp.int32),
                             best_seq=seqs[:, 0])
        return dict(carry, active=carry["active"] & ~harvested), out

    def admit(carry, pack, pack_avail, reset_pos, memory0):
        pack_offset = jnp.where(reset_pos, 0, carry["pack_pos"])
        free = ~carry["active"]
        free_rank = jnp.cumsum(free.astype(jnp.int32)) - 1           # [B]
        n_avail = jnp.maximum(pack_avail - pack_offset, 0)
        admitted = free & (free_rank < n_avail)                      # [B]
        n_admitted = jnp.sum(admitted.astype(jnp.int32))
        e = pack["att_mask"].shape[0]
        src = jnp.clip(pack_offset + free_rank, 0, e - 1)            # [B]

        def slot_sel(new_e, old_b):
            m = admitted.reshape((b,) + (1,) * (old_b.ndim - 1))
            return jnp.where(m, new_e[src], old_b)

        dec = dict(carry["dec"])
        dec["cross_k"] = tuple(slot_sel(pk, ok)
                               for pk, ok in zip(pack["cross_k"], dec["cross_k"]))
        dec["cross_v"] = tuple(slot_sel(pv, ov)
                               for pv, ov in zip(pack["cross_v"], dec["cross_v"]))
        adm_rows = jnp.repeat(admitted, k)
        dec["memory"] = jnp.where(adm_rows[:, None], memory0, dec["memory"])
        return dict(
            carry,
            dec=dec,
            att_mask=slot_sel(pack["att_mask"], carry["att_mask"]),
            ticket=jnp.where(admitted, pack["ticket"][src], carry["ticket"]),
            aux=jnp.where(admitted, pack["aux"][src], carry["aux"]),
            base=jnp.where(admitted, jnp.mod(carry["t"], max_len), carry["base"]),
            age=jnp.where(admitted, 0, carry["age"]),
            active=carry["active"] | admitted,
            tok=jnp.where(adm_rows, bos_id, carry["tok"]),
            alive=jnp.where(admitted[:, None], 0.0, carry["alive"]),
            seq=jnp.where(admitted[:, None, None], pad_id, carry["seq"]),
            done_seq=jnp.where(admitted[:, None, None], pad_id, carry["done_seq"]),
            done_score=jnp.where(admitted[:, None], NEG_INF, carry["done_score"]),
            ever_fin=jnp.where(admitted[:, None], False, carry["ever_fin"]),
            pack_pos=pack_offset + n_admitted,
        ), n_admitted

    if fused_topk:
        assert not suppress_ids, \
            "fused_topk segments apply suppression inside the step kernel"

    def one_step(carry, i):
        p = jnp.mod(carry["t"] + i, max_len)
        age = carry["age"]
        frozen_now = jnp.all(carry["ever_fin"], axis=1)              # [B]
        if fused_topk:
            (vals, tok_cand, lse), dec = step_fn(
                carry["tok"], p, jnp.repeat(age, k), carry["dec"],
                carry["att_mask"], carry["aux"])
            logp_cand = vals - lse[:, None]                          # both f32
        else:
            logits, dec = step_fn(carry["tok"], p, jnp.repeat(age, k), carry["dec"],
                                  carry["att_mask"], carry["aux"])
            lse = jax.scipy.special.logsumexp(logits.astype(jnp.float32), axis=-1)
            for sid in suppress_ids:
                logits = logits.at[:, sid].add(-1000.0)
            # two-stage exact top-k (decode/beam.py raw_logits contract)
            vals, tok_cand = topk(logits, k)                         # [N, k]
            logp_cand = vals.astype(jnp.float32) - lse[:, None]
        cand = carry["alive"].reshape(n)[:, None] + logp_cand
        cand = cand.reshape(b, k, k)
        cand = jnp.where((age == 0)[:, None, None]
                         & (jnp.arange(k)[None, :, None] > 0), NEG_INF, cand)
        scores, flat_idx = topk(cand.reshape(b, k * k), k)
        beam_idx = flat_idx // k
        tok_idx = jnp.take_along_axis(tok_cand.reshape(b, k * k), flat_idx, axis=1)

        seq = jnp.take_along_axis(carry["seq"], beam_idx[:, :, None], axis=1)
        seq = jax.lax.dynamic_update_index_in_dim(seq, tok_idx, p, axis=2)
        # with an 'anc' table in dec (ancestor mode) this advances lineages at
        # ring slot p instead of physically reordering the caches (beam.py)
        dec = _gather_beams(dec, beam_idx, b, k, pos=p)

        finished = (tok_idx == eos_id) | (age == max_len - 1)[:, None]
        length = (age + 1).astype(jnp.float32)[:, None]
        live = carry["active"] & ~frozen_now                         # [B]
        fin_score = jnp.where(finished & live[:, None], lp(length, scores), NEG_INF)
        all_scores = jnp.concatenate([carry["done_score"], fin_score], axis=1)
        all_seqs = jnp.concatenate([carry["done_seq"], seq], axis=1)
        top_scores, top_idx = topk(all_scores, k)
        done_seq = jnp.take_along_axis(all_seqs, top_idx[:, :, None], axis=1)

        ever_fin = jnp.take_along_axis(carry["ever_fin"], beam_idx, axis=1) | finished
        return dict(
            carry,
            dec=dec,
            age=jnp.minimum(age + 1, max_len - 1),
            tok=tok_idx.reshape(n),
            alive=scores - 1000.0 * finished.astype(jnp.float32),
            seq=seq,
            done_seq=done_seq,
            done_score=top_scores,
            ever_fin=ever_fin,
        ), None

    def segment(carry, pack, pack_avail, reset_pos, memory0):
        carry, out = harvest(carry)
        carry, n_admitted = admit(carry, pack, pack_avail, reset_pos, memory0)
        carry, _ = jax.lax.scan(one_step, carry,
                                jnp.arange(seg_steps, dtype=jnp.int32))
        carry = dict(carry, t=carry["t"] + seg_steps)
        meta = jnp.concatenate([
            jnp.stack([out.harvested.astype(jnp.int32), out.tickets], axis=1),
            jnp.stack([n_admitted, carry["pack_pos"]])[None, :],
        ])
        return carry, out._replace(n_admitted=n_admitted, host_meta=meta)

    return jax.jit(segment, donate_argnums=(0,)) if jit else segment


class ContinuousServer:
    """Host driver: loader batches -> encoder packs -> segment loop -> records.

    Mirrors serve.ReportServer's record contract ({'id', 'report'[, 'gt']})
    while keeping the decode batch full across study boundaries. The host
    only encodes pending studies and drains harvested results; slot
    scheduling runs inside the jitted segment on device.

    ``step_wrapper``: optional fn(raw_step) -> step with the same signature
    (tok, p, age_rows, dec, att_mask, aux, tstate) — the bench uses it to
    force EOS at per-study target lengths for realistic-workload measurement.
    """

    def __init__(self, model, tokenizer, state, *, max_seq_len: int = 100,
                 slots: int = 64, beam_size: int = 3, seg_steps: int = 10,
                 dispatch_segs: int = 4, pack_batches: int = 4,
                 suppress_unk: bool = False,
                 length_penalty: str = "", step_wrapper=None,
                 topk_wrapper=None,
                 beam_kv: str = "auto", kv_cache_dtype: str = "",
                 mesh=None):
        if getattr(model, "decoder_kind", "r2gen") != "r2gen":
            raise NotImplementedError(
                "continuous serving needs ring-cache (age-aware) decode steps; "
                "only the R2Gen decoder implements them today "
                f"(decoder_kind={model.decoder_kind!r}) — use the batch engine")
        if kv_cache_dtype:
            # loud degradation (repo convention): the ring caches are bf16-only
            # today — per-slot scale bookkeeping under admission resets is not
            # wired, and silently running bf16 would misreport the config
            raise NotImplementedError(
                f"kv_cache_dtype={kv_cache_dtype!r} is not supported by the "
                "continuous engine (bf16 ring caches only) — use the batch "
                "engine for quantized KV caches")
        from types import SimpleNamespace

        from evoke_tpu.train.steps import resolve_beam_kv

        # mesh: dp-shard the engine over the SLOT axis — carry, packs and
        # loader batches all shard their leading (slot/row) dim over 'dp';
        # GSPMD partitions the jitted segment (admission gathers become
        # collectives). Params stay replicated. slots must divide by dp.
        self.mesh = mesh
        if mesh is not None:
            dp = mesh.shape["dp"]
            assert slots % dp == 0, f"slots={slots} must divide by dp={dp}"
        # same auto policy as the batch serving path: ancestor-table ring
        # caches + the Pallas lineage kernel on TPU, reorder elsewhere.
        # A pure-dp mesh KEEPS the kernel path (the lineage kernel rides
        # shard_map over 'dp' — ops/sharding.py, VERDICT r4 task 3); mp > 1
        # meshes resolve to reorder.
        self._beam_kv = resolve_beam_kv(
            SimpleNamespace(beam_kv=beam_kv, kv_cache_dtype=""),
            serving=True, mesh=mesh)
        self.model, self.tokenizer, self.state = model, tokenizer, state
        self.max_len = max_seq_len
        self.slots, self.k, self.seg_steps = slots, beam_size, seg_steps
        vocab = tokenizer.get_vocab_size() + 1
        suppress = (tokenizer.unk_id,) if suppress_unk else ()

        from evoke_tpu.ops.fused_logit_topk import use_fused_logit_topk

        # fused Pallas vocab tail on TPU — same policy as the batch serving
        # path; a pure-dp mesh keeps it (the kernel rides shard_map over
        # 'dp'). A step_wrapper (the bench's load-forcing hook) needs the
        # raw [N, V] logits, so it keeps the unfused tail — UNLESS a
        # topk_wrapper is also given:
        # ``topk_wrapper(vals, idx, lse, age_rows, aux) -> (vals, idx)``
        # rewrites the fused kernel's [N, k] candidates instead, so forced
        # workloads measure the production (fused) tail. When the fused path
        # is taken, step_wrapper is ignored (callers provide EQUIVALENT
        # forcings per path — bench.py does; same contract as
        # make_generate_step's logits_hook/topk_hook pair).
        fused = (use_fused_logit_topk(model, serving=True, mesh=mesh)
                 and (step_wrapper is None or topk_wrapper is not None))

        def raw_step(tok, p, age_rows, dec, att_mask, aux, tstate):
            variables = {"params": tstate.params, "batch_stats": tstate.batch_stats}
            if fused:
                out, dec2 = model.apply(variables, tok, p, dec, att_mask,
                                        return_topk=beam_size, topk_suppress=suppress,
                                        age=age_rows, method=model.decode_step)
                if topk_wrapper is not None:
                    vals, idx, lse = out
                    vals, idx = topk_wrapper(vals, idx, lse, age_rows, aux)
                    out = (vals, idx, lse)
                return out, dec2
            return model.apply(variables, tok, p, dec, att_mask,
                               return_logits=True, age=age_rows,
                               method=model.decode_step)

        wrapped = (step_wrapper(raw_step) if step_wrapper and not fused
                   else raw_step)

        # weights ride a jit ARGUMENT (tstate) into the step closure — closing
        # over the concrete state directly would bake 400M params into the
        # executable as constants. The closure chain (step_fn -> segment) is
        # built INSIDE the traced function so tstate is captured LEXICALLY per
        # trace: an earlier cell-side-channel design (`cell[0] = tstate` at
        # trace time) leaked the first trace's tracer into any RE-trace — a
        # second serve() with a different loader batch width crashed with
        # UnexpectedTracerError instead of cleanly retracing. make_segment_fn
        # construction is pure Python (closure building), so per-trace
        # reconstruction costs nothing at runtime.
        seg_cfg = dict(
            slots=slots, beam_size=beam_size, seg_steps=seg_steps,
            bos_id=tokenizer.bos_id, eos_id=tokenizer.eos_id,
            pad_id=tokenizer.pad_id, vocab_size=vocab, max_len=max_seq_len,
            length_penalty=length_penalty,
            suppress_ids=() if fused else suppress, jit=False,
            fused_topk=fused)

        #
        # One dispatch runs ``dispatch_segs`` harvest->admit->decode segments
        # back-to-back in an outer lax.scan: admission is DEVICE-side state
        # (pack_pos rides the carry and the pack rows are already on device),
        # so slots freed mid-dispatch are re-admitted with no host round trip.
        # The host reads ONE stacked (host_meta, best_seq) per dispatch —
        # through a remote runtime each dispatch/fetch costs a ~30-60 ms RTT
        # regardless of payload (DESIGN 5l), so this divides the per-segment
        # overhead by R while keeping the admission cadence at seg_steps.
        self.dispatch_segs = r = max(int(dispatch_segs), 1)
        # Admission lookahead is depth * dispatch_segs SEGMENTS deep (the host
        # learns consumption only from lagged reads), but one loader batch of
        # E rows feeds only ~E*mean_len/(slots*seg_steps) segments of
        # admissions (~6 at flagship dims) — smaller than the lookahead, so
        # single-batch packs starve slots around every pack switch (measured:
        # 2.6x the ideal decode-step count at seg 10x4). ``pack_batches``
        # loader batches are therefore fused into ONE device-side pack (valid
        # rows compacted to the front with a host-built gather permutation;
        # static [G*E] shape so the segment compiles once).
        self.pack_batches = max(int(pack_batches), 1)
        self._fuse = jax.jit(lambda perm, *ps: jax.tree.map(
            lambda *xs: jnp.concatenate(xs, 0)[perm], *ps))

        from evoke_tpu.ops.sharding import use_kernel_mesh

        def seg_with_state(carry, tstate, pack, avail, reset_pos, memory0):
            def step_fn(tok, p, age_rows, dec, att_mask, aux):
                return wrapped(tok, p, age_rows, dec, att_mask, aux, tstate)

            seg = make_segment_fn(step_fn, **seg_cfg)

            def body(c, i):
                c, out = seg(c, pack, avail, reset_pos & (i == 0), memory0)
                return c, (out.host_meta, out.best_seq)

            # trace-time mesh context: the Pallas kernel dispatchers inside
            # the decode step read it while this jit traces (ops/sharding.py)
            with use_kernel_mesh(mesh):
                return jax.lax.scan(body, carry, jnp.arange(r, dtype=jnp.int32))

        self._segment = jax.jit(seg_with_state, donate_argnums=(0,))

        from evoke_tpu.train.steps import maybe_normalize_images

        @jax.jit
        def encode_pack(tstate, batch):
            variables = {"params": tstate.params, "batch_stats": tstate.batch_stats}
            batch = maybe_normalize_images(batch)
            e = batch["ids"].shape[0]
            inc = ([batch["inc_ids"], batch["inc_mask"]]
                   if "inc_ids" in batch else [])
            enc, att_mask = model.apply(variables, batch["images"], batch["pids"],
                                        batch["valid"], e, *inc,
                                        method=model.encode_for_decode)
            st = model.apply(variables, enc, e, 1,
                             method=model.init_decode_state)
            return {"cross_k": st["cross_k"], "cross_v": st["cross_v"],
                    "att_mask": att_mask}

        self._encode_pack = encode_pack
        self._carry = None
        self._memory0 = None

    def _ensure_carry(self, pack):
        if self._carry is not None:
            return
        n = self.slots * self.k
        p_len = pack["att_mask"].shape[1]
        d = pack["cross_k"][0].shape[-1]
        zeros_enc = jnp.zeros((self.slots, p_len, d), pack["cross_k"][0].dtype)
        variables = {"params": self.state.params,
                     "batch_stats": self.state.batch_stats}
        dec0 = self.model.apply(variables, zeros_enc, n, self.max_len,
                                method=self.model.init_decode_state)
        if self._beam_kv == "ancestor":
            # lineage table over RING slots: anc[s, j, t'] = physical beam row
            # holding beam j's ancestor K/V at slot t'. Stale entries (outside
            # a slot's age window) are masked, so admission never clears it.
            dec0 = dict(dec0, anc=jnp.zeros((self.slots, self.k, self.max_len),
                                            jnp.int32))
        # a distinct buffer: the carry is donated per segment call and memory0
        # rides alongside it — aliasing them trips XLA's donation check
        self._memory0 = jnp.array(dec0["memory"])
        self._carry = init_carry(
            dec0, jnp.ones((self.slots, p_len), pack["att_mask"].dtype),
            self.slots, self.k, self.max_len,
            self.tokenizer.pad_id, self.tokenizer.bos_id)
        if self.mesh is not None:
            # slot-axis dp sharding for every [slots, ...] / [slots*k, ...]
            # leaf (rows are slot-major, so slots % dp keeps rows aligned);
            # scalars (t, pack_pos) replicate
            from evoke_tpu.core.mesh import shard_batch

            self._carry = shard_batch(self._carry, self.mesh)
            self._memory0 = shard_batch(self._memory0, self.mesh)

    def serve(self, loader, prefetch: int = 2, depth: int = 4,
              readers: int = 2):
        """Generate a report per study in ``loader`` (eval-loader batches with
        host extras '_image_ids'[, '_gts', '_aux']). Returns (records, stats);
        records are in admission (loader) order.

        The driver keeps up to ``depth`` dispatches in flight — each runs
        ``dispatch_segs`` harvest->admit->decode segments on device — and
        reads each dispatch's stacked (host_meta, best_seq) in ONE device_get
        issued on a ``readers``-thread pool: through a remote TPU runtime
        every dispatch/fetch is a ~30-60 ms round trip regardless of size
        (measured, DESIGN 5l), so a blocking read per segment would put one
        RTT on the critical path of every 10-step segment (~16 ms of device
        work) and cap the engine below the batch path. Concurrent reader
        threads pull RTTs off the dispatch path; results are still processed
        in dispatch order. Pack consumption is device-side state
        (carry['pack_pos']), so dispatching ahead of the reads stays exact:
        in-flight segments admit FIFO from wherever the previous segment left
        off; the host only switches the pack argument (reset_pos=True) once a
        lagged read shows the current pack exhausted — at most
        ``depth * dispatch_segs`` segments admit nothing around a switch, so
        packs are fused ``pack_batches`` loader batches wide to make switches
        rare relative to that lookahead."""
        from concurrent.futures import ThreadPoolExecutor

        from evoke_tpu.data.batching import Prefetcher, device_prefetch
        from evoke_tpu.serve import EMPTY_REPORT

        pending: deque = deque()   # packs not yet current
        meta: Dict[int, Dict[str, Any]] = {}
        results: Dict[int, Dict[str, Any]] = {}
        latencies: List[float] = []   # submit (pack encoded) -> harvest read
        next_ticket = 0
        n_done = 0
        n_total = 0
        steps = 0
        # phase accounting (stats['encode_s'/'dispatch_s'/'wait_s']): where
        # the serve loop's wall time goes — encode+device_put of packs,
        # issuing segment dispatches, and blocking on result reads. The
        # remainder of wall_s is host bookkeeping. Diagnosing engine
        # slowdowns (e.g. under a mesh) needs this split.
        t_enc = t_disp_acc = t_wait = 0.0

        batches = device_prefetch(Prefetcher(loader, prefetch), self.mesh, prefetch)
        loader_done = False
        t0 = time.perf_counter()

        def pull_pack():
            """-> (pack, n_valid) or None when the loader is exhausted."""
            nonlocal next_ticket, n_total, loader_done, t_enc
            t_pp = time.perf_counter()
            try:
                dev, host = next(batches)
            except StopIteration:
                loader_done = True
                t_enc += time.perf_counter() - t_pp
                return None
            ids = host["_image_ids"]
            gt_list = host.get("_gts")
            valid = np.asarray(dev["valid"])[: len(ids)]
            e = len(ids)
            # padded anchors must form a suffix for FIFO prefix admission
            n_valid = int(valid.sum())
            assert valid[:n_valid].all(), "padded anchors must trail the batch"
            pack = dict(self._encode_pack(self.state, dev))
            tickets = np.arange(next_ticket, next_ticket + e, dtype=np.int32)
            t_submit = time.perf_counter()
            for j in range(n_valid):
                meta[int(tickets[j])] = {
                    "id": ids[j], "_t_submit": t_submit,
                    **({"gt": gt_list[j]} if gt_list is not None else {})}
            pack["ticket"] = jnp.asarray(tickets)
            aux = host.get("_aux")
            pack["aux"] = (jnp.asarray(np.asarray(aux, np.int32))
                           if aux is not None else jnp.zeros(e, jnp.int32))
            next_ticket += e
            n_total += n_valid
            t_enc += time.perf_counter() - t_pp
            return pack, n_valid

        raw: deque = deque()     # per-loader-batch packs awaiting fusion

        def _tickets_np(pack, n_valid):
            # admission-ordered tickets, host-side (pull_pack assigned them
            # from a host counter; the valid prefix is the admissible range)
            return np.asarray(pack["ticket"])[:n_valid]

        g = self.pack_batches

        def make_fused():
            """Fuse up to ``g`` raw packs -> ([g*E]-row pack, avail, tickets).

            Valid rows (each raw pack's prefix) are compacted to the front by
            a host-built gather permutation; padded/filler rows land after
            ``avail`` where admission never reaches (admit clips at
            pack_avail). Short groups at the loader tail are padded by
            repeating the first pack, keeping the segment's pack shape (and
            its compilation) unique."""
            take = [raw.popleft() for _ in range(min(g, len(raw)))]
            if g == 1:
                pk, nv = take[0]
                return pk, nv, _tickets_np(pk, nv)
            e = take[0][0]["att_mask"].shape[0]
            # the gather permutation below assumes every raw pack has exactly
            # E rows (valid_idx offsets by i*e); a ragged loader batch would
            # make the jitted concatenate[perm] mis-index silently, admitting
            # wrong studies under misattributed tickets — fail loudly instead
            # (in-repo loaders always pad to n_anchor, so this guards external
            # loaders handed to the public serve() API)
            assert all(p["att_mask"].shape[0] == e for p, _ in take), (
                "ContinuousServer.serve: all loader batches must have the same "
                f"padded row count (got {[p['att_mask'].shape[0] for p, _ in take]}); "
                "pad every batch to n_anchor")
            packs = [p for p, _ in take] + [take[0][0]] * (g - len(take))
            valid_idx = [np.arange(i * e, i * e + nv)
                         for i, (_, nv) in enumerate(take)]
            front = np.concatenate(valid_idx) if valid_idx else np.zeros(0, int)
            perm = np.zeros(g * e, np.int32)
            perm[: len(front)] = front
            tickets = np.concatenate([_tickets_np(p, nv) for p, nv in take]) \
                if take else np.zeros(0, np.int32)
            return self._fuse(jnp.asarray(perm), *packs), int(len(front)), tickets

        def refill_pending():
            while not loader_done and len(raw) < g * max(prefetch, 1):
                got = pull_pack()
                if got is not None:
                    raw.append(got)
            while raw and len(pending) < max(prefetch, 1):
                if not loader_done and len(raw) < g:
                    break   # wait for a full group; the tail pads instead
                pending.append(make_fused())

        refill_pending()
        if not pending:
            return [], {"reports": 0.0, "wall_s": 0.0,
                        "reports_per_s": float("nan"), "segment_steps": 0.0}
        cur_pack, cur_avail, cur_tickets = pending.popleft()
        cur_reset = True
        self._ensure_carry(cur_pack)
        inflight: deque = deque()   # (future, pack_id, avail, tickets, t_disp)
        cur_id = 0
        admit_t: Dict[int, float] = {}   # ticket -> dispatch time of admission
        service: List[float] = []        # admit-dispatch -> harvest-read
        pool = ThreadPoolExecutor(max_workers=max(readers, 1))

        def dispatch():
            nonlocal cur_reset, t_disp_acc
            t_d = time.perf_counter()
            self._carry, out = self._segment(
                self._carry, self.state, cur_pack, jnp.int32(cur_avail),
                jnp.asarray(cur_reset), self._memory0)
            cur_reset = False
            fut = pool.submit(jax.device_get, out)
            t_disp_acc += time.perf_counter() - t_d
            inflight.append((fut, cur_id, cur_avail, cur_tickets,
                             time.perf_counter()))

        try:
            while n_done < n_total:
                while len(inflight) < depth:
                    dispatch()
                fut, pack_id, avail, tickets, t_disp = inflight.popleft()
                t_w = time.perf_counter()
                metas, bests = fut.result()   # [R, B+1, 2], [R, B, L]
                t_wait += time.perf_counter() - t_w
                # steps counts only CONSUMED dispatches: the up-to-``depth``
                # speculative dispatches in flight at exit (issued after the
                # final harvest, never read) would otherwise inflate the
                # decode-steps-per-study efficiency figure by up to
                # depth * dispatch_segs * seg_steps
                steps += self.seg_steps * self.dispatch_segs
                t_now = time.perf_counter()
                for meta_h, best in zip(metas, bests):
                    # harvests first: a study harvested in this segment was
                    # admitted in a strictly earlier one (device order is
                    # harvest -> admit -> decode)
                    for s in np.nonzero(meta_h[:-1, 0])[0]:
                        t = int(meta_h[s, 1])
                        if t in meta and t not in results:  # padded: no meta
                            latencies.append(t_now - meta[t].pop("_t_submit"))
                            if t in admit_t:
                                service.append(t_now - admit_t.pop(t))
                            results[t] = {**meta[t], "tokens": best[s]}
                            n_done += 1
                    # admissions: rows [pos - n_adm, pos) of this dispatch's
                    # pack, stamped with the DISPATCH time (an upper bound on
                    # service latency by at most the read lag)
                    n_adm, pos = int(meta_h[-1, 0]), int(meta_h[-1, 1])
                    for t in tickets[pos - n_adm: pos]:
                        admit_t[int(t)] = t_disp
                pack_pos = int(metas[-1][-1, 1])
                if pack_id == cur_id and pack_pos >= avail:
                    refill_pending()
                    if pending:
                        cur_pack, cur_avail, cur_tickets = pending.popleft()
                        cur_id += 1
                        cur_reset = True
                    elif cur_avail:
                        cur_avail = 0   # drain: reuse the pack, admit nothing
                refill_pending()
        finally:
            pool.shutdown(wait=False, cancel_futures=True)

        wall = time.perf_counter() - t0
        records: List[Dict[str, Any]] = []
        for t in sorted(results):
            rec = results[t]
            toks = rec.pop("tokens")
            text = self.tokenizer.decode([int(x) for x in toks])
            rec["report"] = text if text.strip() else EMPTY_REPORT
            records.append(rec)
        stats = {"reports": float(len(records)), "wall_s": wall,
                 "reports_per_s": len(records) / wall if wall > 0 else float("nan"),
                 "segment_steps": float(steps),
                 "encode_s": t_enc, "dispatch_s": t_disp_acc, "wait_s": t_wait}
        if latencies:
            lat = np.asarray(latencies)
            stats["study_p50_ms"] = float(np.percentile(lat, 50) * 1e3)
            stats["study_p90_ms"] = float(np.percentile(lat, 90) * 1e3)
        if service:
            # admit->harvest (decode service, excl. encode-queue wait; an
            # upper bound by at most one read lag)
            srv = np.asarray(service)
            stats["service_p50_ms"] = float(np.percentile(srv, 50) * 1e3)
            stats["service_p90_ms"] = float(np.percentile(srv, 90) * 1e3)
        return records, stats
