"""Pallas TPU kernel: beam-lineage self-attention over un-permuted KV caches.

The decode loop's dominant HBM traffic is the per-step beam bookkeeping of the
self-attention caches. The default ("reorder") beam mode physically gathers
every [N, L, D] cache by beam parent each step, so each cache byte moves three
times per step (reorder read + reorder write + attend read — DESIGN.md §5f:
the reorder gathers were 15 of 54 loop-ms on the 224 trace). The ancestor-table
mode (decode/beam.py, layers.cached_self_attention) removes the reorder but its
XLA formulation materializes beam-times-larger masked scores and lost 43%
end-to-end — the bytes saved were repaid in compute-side materialization.

This kernel is the formulation the hardware wants: one grid program per
sample DMAs the sample's whole cache block (all ``kbeam`` physical beam rows,
contiguous in the sample-major [N, L, D] layout) from HBM into VMEM ONCE,
builds the lineage mask from the [kbeam, L] ancestor row on the VPU, and runs
the per-head Tq-per-beam attention out of VMEM. Per decode step each cache
byte now moves exactly once, and nothing beam-sized ever round-trips to HBM:

    reorder mode:   3 passes over K+V per layer per step
    this kernel:    1 pass  over K+V per layer per step (+ the slot write)

Numerics: scores accumulate in f32 on the MXU (preferred_element_type), the
softmax runs in f32, and the probs are cast to the value dtype for the
weighted sum — the same contract as layers.dot_attention. The attended SET is
identical to reorder mode (each query's lineage plus its own just-written
slot), so f32 decoding is exact vs both other modes; on TPU bf16 the different
tiling rounds near-tie beams differently, the same cross-compilation variance
as DESIGN.md §5b/§5e.

Reference role: the CUDA analogue would be a fused paged/beam attention
kernel; the reference itself re-decodes the full prefix every step
(/root/reference/modules/caption_model.py beam_search) and has no cache at
all — this file exists for the TPU serving path only.
"""

from __future__ import annotations

import functools
import math
import os

import jax
import jax.numpy as jnp

NEG_INF = -1e9


def _ring_masks(pos, age_ref, qsamp, tvec, G, kbeam, L):
    """hist/now masks in RING time: slot t' is history for a query row of
    age a iff 0 < (pos - t') mod L <= a, and "now" iff (pos - t') mod L == 0.
    Batch beam mode passes age == pos, which reduces exactly to the old
    (t' < pos, t' == pos) masks: delta = pos - t' for t' <= pos, and slots
    beyond pos wrap to delta > pos = age. The mod is computed as a
    conditional add (no vector integer division for Mosaic).

    ``age_ref`` is the FULL [B, 1] SMEM array (a blocked (G, 1) spec is
    illegal for G < 8: Mosaic requires the sublane block dim to be divisible
    by 8 or equal to the array's — found compiling the flagship batch-64
    G=4 config on a real v5e); each program reads its G rows at a dynamic
    scalar offset."""
    from jax.experimental import pallas as pl

    delta = pos - tvec
    delta = jnp.where(delta < 0, delta + L, delta)             # [gk, L]
    base = pl.program_id(0) * G
    age2 = jnp.zeros(qsamp.shape, jnp.int32)
    for i in range(G):                                         # SMEM scalar reads
        age2 = jnp.where(qsamp == i, age_ref[base + i, 0], age2)
    hist = (delta > 0) & (delta <= age2)
    now = delta == 0
    return hist, now


def _kernel(pos_ref, age_ref, q_ref, k_ref, v_ref, anc_ref, out_ref, *,
            num_heads: int):
    """G samples: q [G, kbeam, D], caches [G, kbeam, L, D], anc [G, kbeam, L].

    G samples share one grid program so the per-program cost (DMA issue,
    grid sequencing, the 2*num_heads dot launches) amortizes over G times the
    bytes — with one sample per program the kernel measured 83 us/invocation
    against a 24 us DMA floor (device trace, 224 batch 32). The price is a
    block-diagonal score matrix ([G*kbeam, G*kbeam*L], cross-sample entries
    masked): G^2-growth in MXU work that is negligible at these shapes.

    TPU block shapes must match the array's trailing dims, so the
    sample-major [N, ...] arrays arrive reshaped with explicit (sample, beam)
    axes."""
    G, kbeam, L, D = k_ref.shape
    gk = G * kbeam
    dh = D // num_heads
    pos = pos_ref[0, 0]

    anc2 = anc_ref[...].reshape(gk, L)                         # [gk, L] i32
    # sample / beam / time coordinates of each query row (no integer division:
    # Mosaic's vector i32 div support is not assumed)
    qsamp = jax.lax.broadcasted_iota(jnp.int32, (G, kbeam, L), 0).reshape(gk, L)
    qbeam = jax.lax.broadcasted_iota(jnp.int32, (G, kbeam, L), 1).reshape(gk, L)
    tvec = jax.lax.broadcasted_iota(jnp.int32, (G, kbeam, L), 2).reshape(gk, L)
    hist, now = _ring_masks(pos, age_ref, qsamp, tvec, G, kbeam, L)
    # key rows are flattened (sample, physical-beam, t)-major: r = (g*kbeam+j)*L + t.
    # A query row attends only its own sample's block (block-diagonal mask).
    # The pieces are materialized as f32 {0,1} before the concat: Mosaic
    # cannot concatenate i1 vregs ("Invalid vector register cast").
    pieces = []
    for jj in range(gk):
        g, j = divmod(jj, kbeam)
        lineage = ((anc2 == j) & hist) | ((qbeam == j) & now)
        pieces.append(jnp.where((qsamp == g) & lineage, 1.0, 0.0))
    mask = jnp.concatenate(pieces, axis=1)                     # [gk, gk*L]

    q = q_ref[...].reshape(gk, D)
    k2 = k_ref[...].reshape(gk * L, D)
    v2 = v_ref[...].reshape(gk * L, D)
    scale = 1.0 / math.sqrt(dh)
    outs = []
    for h in range(num_heads):
        sl = slice(h * dh, (h + 1) * dh)
        s = jax.lax.dot_general(q[:, sl], k2[:, sl], (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        s = jnp.where(mask > 0.5, s * scale, NEG_INF)          # [gk, gk*L]
        m = jnp.max(s, axis=1, keepdims=True)
        p = jnp.exp(s - m)
        p = p / jnp.sum(p, axis=1, keepdims=True)
        o = jax.lax.dot_general(p.astype(v2.dtype), v2[:, sl],
                                (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        outs.append(o.astype(out_ref.dtype))
    out_ref[...] = jnp.concatenate(outs, axis=1).reshape(G, kbeam, D)


def _kernel_fused_heads(pos_ref, age_ref, q_ref, k_ref, v_ref, anc_ref,
                        out_ref, *, num_heads: int):
    """Same math as ``_kernel`` with ALL heads in one dot pair.

    The per-head loop issues 2*num_heads tiny dots + num_heads softmax chains
    per program (16 dots of [gk,64]x[64,gk*L] at the serving shape) — the
    kernel's cost is op issues, not MXU time (§DESIGN 5i). Here the queries
    are head-expanded into a block-diagonal [num_heads*gk, D] matrix (row
    (h, r) holds q[r] restricted to head h's dh-lane slice, zero elsewhere),
    so ONE [h*gk, D] x [D, gk*L] dot yields every head's scores — the zeroed
    lanes contribute exact zeros to the f32 accumulation, so the scores are
    identical to the per-head dots. One softmax over [h*gk, gk*L] replaces
    num_heads chains, one [h*gk, gk*L] x [gk*L, D] dot yields per-head
    contexts over the full D, and a masked sum over the head axis selects
    each head's own dh-lane slice. MXU work grows num_heads-fold but is
    negligible at these shapes; op issues drop ~10x."""
    G, kbeam, L, D = k_ref.shape
    gk = G * kbeam
    dh = D // num_heads
    pos = pos_ref[0, 0]

    anc2 = anc_ref[...].reshape(gk, L)
    qsamp = jax.lax.broadcasted_iota(jnp.int32, (G, kbeam, L), 0).reshape(gk, L)
    qbeam = jax.lax.broadcasted_iota(jnp.int32, (G, kbeam, L), 1).reshape(gk, L)
    tvec = jax.lax.broadcasted_iota(jnp.int32, (G, kbeam, L), 2).reshape(gk, L)
    hist, now = _ring_masks(pos, age_ref, qsamp, tvec, G, kbeam, L)
    pieces = []
    for jj in range(gk):
        g, j = divmod(jj, kbeam)
        lineage = ((anc2 == j) & hist) | ((qbeam == j) & now)
        pieces.append(jnp.where((qsamp == g) & lineage, 1.0, 0.0))
    mask = jnp.concatenate(pieces, axis=1)                     # [gk, gk*L]

    q = q_ref[...].reshape(gk, D)
    k2 = k_ref[...].reshape(gk * L, D)
    v2 = v_ref[...].reshape(gk * L, D)
    # head-slice selector [h, 1, D]: lane c belongs to head h iff
    # 0 <= c - h*dh < dh (no vector integer division)
    lane = jax.lax.broadcasted_iota(jnp.int32, (num_heads, 1, D), 2)
    head = jax.lax.broadcasted_iota(jnp.int32, (num_heads, 1, D), 0)
    rel = lane - head * dh
    hsel = (rel >= 0) & (rel < dh)                             # [h, 1, D]
    q_blk = jnp.where(hsel, jnp.broadcast_to(q[None], (num_heads, gk, D)),
                      jnp.zeros((), q.dtype))
    q_blk = q_blk.reshape(num_heads * gk, D)
    s = jax.lax.dot_general(q_blk, k2, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)  # [h*gk, gk*L]
    scale = 1.0 / math.sqrt(dh)
    bigmask = jnp.broadcast_to(mask[None], (num_heads, gk, gk * L))
    bigmask = bigmask.reshape(num_heads * gk, gk * L)
    s = jnp.where(bigmask > 0.5, s * scale, NEG_INF)
    m = jnp.max(s, axis=1, keepdims=True)
    p = jnp.exp(s - m)
    p = p / jnp.sum(p, axis=1, keepdims=True)
    o = jax.lax.dot_general(p.astype(v2.dtype), v2, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)  # [h*gk, D]
    o = jnp.where(hsel, o.reshape(num_heads, gk, D), 0.0).sum(axis=0)
    out_ref[...] = o.astype(out_ref.dtype).reshape(G, kbeam, D)


def _kernel_for(g: int, kbeam: int):
    """Variant choice. EVOKE_LINEAGE_HEADS = auto (default) | fused | loop.

    fused is +10% end-to-end at the 224 serving config (steady-state 547.9 ->
    604.8 r/s, batch 64, interleaved sessions) — the per-head loop's 16 tiny
    dot issues were the kernel's real cost, not MXU time. But Mosaic only
    compiles the fused form inside a narrow shape envelope (probed on a real
    v5e): kbeam=3 with G in {4, 8} works; kbeam 2/4 and G 1/2 all fail with
    "Not implemented: Sublane broadcast" (found driving diverse beam — bdash
    groups give kbeam=2 — end-to-end on the chip; interpret-mode tests bypass
    Mosaic). auto therefore selects fused only inside the measured envelope
    and the per-head loop everywhere else (loop compiles and matches the XLA
    formulation at every probed (G, kbeam, D) combination). A forced 'fused'
    outside the envelope will fail Mosaic compilation loudly."""
    mode = os.environ.get("EVOKE_LINEAGE_HEADS", "auto")
    if mode == "loop":
        return _kernel
    if mode == "fused":
        return _kernel_fused_heads
    return _kernel_fused_heads if (kbeam == 3 and g in (4, 8)) else _kernel


def _lineage_call(pos_arr, age_arr, q4, k4, v4, anc, *, num_heads: int,
                  interpret: bool):
    """The raw pallas_call on LOCAL shapes (grid/blocks derived from ``q4``).

    Factored out of the dispatcher so ``jax.shard_map`` can run it per-device
    on each shard's samples under a dp mesh (ops/sharding.py)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, kbeam, d = q4.shape
    lmax = k4.shape[2]
    n = b * kbeam
    g = _samples_per_block(b, kbeam, lmax, d, k4.dtype.itemsize)

    grid_spec = pl.GridSpec(
        grid=(b // g,),
        in_specs=[
            pl.BlockSpec((1, 1), lambda s: (0, 0), memory_space=pltpu.SMEM),
            # full array: each program offsets by program_id (see _ring_masks)
            pl.BlockSpec((b, 1), lambda s: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((g, kbeam, d), lambda s: (s, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((g, kbeam, lmax, d), lambda s: (s, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((g, kbeam, lmax, d), lambda s: (s, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((g, kbeam, lmax), lambda s: (s, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((g, kbeam, d), lambda s: (s, 0, 0),
                               memory_space=pltpu.VMEM),
    )
    bytes_kv = 2 * kbeam * lmax * d * k4.dtype.itemsize
    out = pl.pallas_call(
        functools.partial(_kernel_for(g, kbeam), num_heads=num_heads),
        out_shape=jax.ShapeDtypeStruct((b, kbeam, d), q4.dtype),
        grid_spec=grid_spec,
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * n * (g * kbeam) * lmax * d,
            bytes_accessed=b * bytes_kv,
            transcendentals=n * g * kbeam * lmax),
        interpret=interpret,
    )(pos_arr, age_arr, q4, k4, v4, anc)
    return out


def lineage_attention(q, cache_k, cache_v, anc, pos, num_heads: int,
                      interpret: bool = False, age=None):
    """Beam-lineage cached self-attention (post-projection, pre-output-proj).

    q:        [N, D]   this step's projected queries (N = B*kbeam, sample-major)
    cache_k:  [N, L, D] un-permuted K cache (slot ``pos`` already written)
    cache_v:  [N, L, D] un-permuted V cache
    anc:      [B, kbeam, L] int32 — anc[s, b, t] = physical beam row (within
              sample s) holding beam b's ancestor K/V at slot t
    pos:      scalar int32 current step (physical ring slot in age mode)
    age:      optional [B] int32 — ring-cache mode (continuous serving):
              per-sample history length; slot t' is valid history iff
              0 < (pos - t') mod L <= age. None = batch beam mode (the
              kernel then runs the identical ring math with age = pos).
    Returns the attention context [N, D] in q.dtype (apply wo outside).

    Mesh dispatch (VERDICT r4 task 3): under an active kernel mesh
    (ops/sharding.use_kernel_mesh) the kernel is sample-parallel — it runs
    inside ``jax.shard_map`` over 'dp' (each device DMAs only its own
    samples' cache blocks), so mesh serving keeps the one-HBM-pass lineage
    read instead of falling back to reorder caches. NOT ``jax.jit``-decorated
    on purpose: a nested jit caches by abstract signature only and would
    reuse a trace made under a different mesh context (use_pallas_lineage
    gates dispatch, so a mesh that cannot carry the kernel never reaches
    here on the auto path).
    """
    n, d = q.shape
    b, kbeam, lmax = anc.shape
    assert n == b * kbeam and cache_k.shape == (n, lmax, d), \
        f"shape mismatch: q {q.shape}, cache {cache_k.shape}, anc {anc.shape}"
    pos_arr = jnp.full((1, 1), pos, jnp.int32)
    age_arr = (jnp.full((b, 1), pos, jnp.int32) if age is None
               else age.astype(jnp.int32).reshape(b, 1))
    # explicit sample axis: TPU block shapes must equal the array's trailing
    # dims, and kbeam (3) is not a legal sublane count on its own
    q4 = q.reshape(b, kbeam, d)
    k4 = cache_k.reshape(b, kbeam, lmax, d)
    v4 = cache_v.reshape(b, kbeam, lmax, d)

    kern = functools.partial(_lineage_call, num_heads=num_heads,
                             interpret=interpret)
    from evoke_tpu.ops.sharding import dp_size, kernel_mesh, mesh_allows_kernels

    mesh = kernel_mesh()
    if mesh is not None and mesh_allows_kernels(mesh) \
            and b % dp_size(mesh) == 0:
        from jax.sharding import PartitionSpec as P

        # full-manual over the mesh (mesh_allows_kernels already pins mp == 1,
        # so manual-'mp' is trivial replication; check_vma=False because
        # pallas_call does not propagate varying-manual-axes metadata)
        out = jax.shard_map(kern, mesh=mesh,
                            in_specs=(P(), P("dp"), P("dp"), P("dp"),
                                      P("dp"), P("dp")),
                            out_specs=P("dp"),
                            check_vma=False)(pos_arr, age_arr, q4, k4, v4, anc)
    else:
        out = kern(pos_arr, age_arr, q4, k4, v4, anc)
    return out.reshape(n, d)


def _samples_per_block(b: int, kbeam: int, lmax: int, d: int,
                       itemsize: int) -> int:
    """Samples per grid program: the largest divisor of the batch (<= 8)
    whose K+V block fits in ~2.5 MB of VMEM (double-buffered by the grid
    pipeline, so ~5 MB of the ~16 MB budget). EVOKE_LINEAGE_BLOCK overrides
    (must divide the batch)."""
    forced = int(os.environ.get("EVOKE_LINEAGE_BLOCK", 0))
    if forced:
        assert b % forced == 0, \
            f"EVOKE_LINEAGE_BLOCK={forced} must divide the sample batch {b}"
        return forced
    per_sample = 2 * kbeam * lmax * d * itemsize
    budget = 2_500_000
    g = 1
    for cand in (8, 4, 2):
        if b % cand == 0 and cand * per_sample <= budget:
            g = cand
            break
    return g


def lineage_kernel_mode() -> str:
    """EVOKE_LINEAGE_KERNEL = auto (default) | pallas | xla.

    auto: the Pallas kernel on TPU backends, the XLA masked-attention
    formulation elsewhere (CPU/GPU). 'pallas' forces the kernel even off-TPU
    (runs in interpret mode there — slow, for exactness tests)."""
    mode = os.environ.get("EVOKE_LINEAGE_KERNEL", "auto")
    if mode not in ("auto", "pallas", "xla"):
        raise ValueError(f"EVOKE_LINEAGE_KERNEL must be auto|pallas|xla, got {mode!r}")
    return mode


def use_pallas_lineage(cache_k, anc=None) -> bool:
    """Dispatch policy for layers.cached_self_attention's ancestor branch.

    int8-quantized caches stay on the XLA path (the kernel would need the
    per-slot scales; the quantized mode is itself opt-in).

    Narrow models (d_model not a multiple of the 128-lane vector width) also
    stay on XLA: Mosaic rejects the kernel's (G, kbeam, D) -> (G*kbeam, D)
    sublane merge below one full lane tile ("unsupported shape cast" on a
    real v5e at D=64 — found driving the library end-to-end, not by the
    interpret-mode CPU tests, which bypass Mosaic). The XLA ancestor
    formulation is exact (tests/test_lineage_kernel.py asserts equality), so
    small-dim models lose nothing but the kernel's bandwidth advantage.
    EVOKE_LINEAGE_KERNEL=pallas still forces the kernel at any width (the
    exactness tests run it in interpret mode, where Mosaic is not involved).

    Under an active kernel mesh (ops/sharding.py) the auto policy also
    requires a pure-dp mesh and a sample batch divisible by dp — otherwise
    the XLA ancestor formulation (which GSPMD partitions normally) keeps the
    mesh program correct. ``anc`` [B, kbeam, L], when given, supplies the
    sample batch for that check."""
    mode = lineage_kernel_mode()
    if mode == "xla" or cache_k.dtype == jnp.int8:
        return False
    if mode == "pallas":
        return True
    if not (jax.default_backend() == "tpu" and cache_k.shape[-1] % 128 == 0):
        return False
    from evoke_tpu.ops.sharding import dp_size, kernel_mesh, mesh_allows_kernels

    mesh = kernel_mesh()
    if mesh is None:
        return True
    return mesh_allows_kernels(mesh) and (
        anc is None or anc.shape[0] % dp_size(mesh) == 0)


def lineage_interpret() -> bool:
    """Interpret mode when the kernel is forced onto a non-TPU backend."""
    return jax.default_backend() != "tpu"
