"""Pallas TPU kernel: fused logit-projection + stage-1 top-k + logsumexp.

The serving decode step's tail is a serialized three-op chain over the vocab
axis (DESIGN 5i per-op census, 224 batch 64, v5e-1):

    logits = dense(h)          [192, 512] x [512, 30001] -> HBM write  ~40 us
    lse    = logsumexp(logits) read [N, V]                              (+)
    vals,i = lax.top_k(logits) read [N, V]                             ~92 us

Three HBM round trips of the [N, V] logits (~11.5 MB bf16 each) plus three
dependent op launches, every decode step. This kernel computes all three in
ONE pass that never materializes the logits in HBM: the vocab axis is tiled
into VMEM-resident [D, TV] weight blocks; each grid step computes its logit
tile on the MXU, folds it into a running (top-k, logsumexp) carry on the VPU,
and only the [N, k] winners + [N] lse ever leave. HBM traffic drops from
W + 3x[N, V] (~65 MB/step) to W (~31 MB/step) and the three-op dependency
chain becomes one kernel launch.

Exactness contract (vs decode/beam.py's two-stage raw-logits path):

- logits are computed EXACTLY as ``nn.Dense(dtype)`` does: f32 MXU
  accumulation truncated to the compute dtype, then a bias add in that dtype.
- ``lse`` is the logsumexp of the PRE-suppression logits (the beam contract:
  suppression biases candidate selection, not the normalizer). Streaming
  (m, s) accumulation — mathematically equal to jax.scipy.logsumexp, f32
  summation order differs by ~1 ulp.
- ``suppress_ids`` replicate ``logits.at[:, sid].add(-1000.0)`` in the
  compute dtype before top-k.
- top-k ties resolve to the LOWEST index, identical to ``lax.top_k``: tiles
  ascend, within-tile selection takes the first maximum, and the cross-tile
  merge prefers the lower global index on equal values.

Reference role: the reference has no decode kernel at all (modules/
caption_model.py re-decodes the full prefix per token and top-ks a [B, k*V]
f32 log-prob array on the host-driven loop); this is pure TPU-first headroom
on the serving path.
"""

from __future__ import annotations

import functools
import os
from typing import Tuple

import jax
import jax.numpy as jnp

NEG_INF = float("-inf")


def _kernel(h_ref, w_ref, b_ref, vals_ref, idx_ref, lse_ref, m_ref, s_ref, *,
            k: int, vocab: int, tile: int):
    """One grid step: fold vocab tile j into the (top-k, logsumexp) carry.

    Carries live across grid steps (constant out-spec index maps keep
    vals/idx/lse resident in VMEM; m/s are scratch):
      vals_ref [N, k] f32 — running top-k values (compute-dtype exact)
      idx_ref  [N, k] i32 — their global vocab indices
      m_ref    [N, 1] f32 — running row max (pre-suppression)
      s_ref    [N, 1] f32 — running sum of exp(x - m)
    ``b_ref`` carries two rows: row 0 the true bias, row 1 a {0, 1}
    suppression indicator — the kernel adds exactly -1000 (in the compute
    dtype, where it is representable) at indicated columns before top-k,
    replicating ``logits.at[:, sid].add(-1000.0)`` bit-for-bit. (A
    pre-suppressed bias row would NOT be exact: bf16(b - 1000) - bf16(b)
    != bf16(-1000) once b's magnitude rounds.)
    """
    j = pl.program_id(0)
    nt = pl.num_programs(0)
    n = h_ref.shape[0]

    @pl.when(j == 0)
    def _init():
        vals_ref[...] = jnp.full_like(vals_ref, NEG_INF)
        idx_ref[...] = jnp.zeros_like(idx_ref)
        m_ref[...] = jnp.full_like(m_ref, NEG_INF)
        s_ref[...] = jnp.zeros_like(s_ref)

    h = h_ref[...]                                   # [N, D] compute dtype
    w = w_ref[...]                                   # [D, TV]
    acc = jax.lax.dot_general(h, w, (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)
    # nn.Dense(dtype) semantics: truncate the f32 accumulation to the compute
    # dtype, then add the bias in that dtype
    logits = acc.astype(h.dtype) + b_ref[0, :][None, :]          # [N, TV]
    col = j * tile + jax.lax.broadcasted_iota(jnp.int32, logits.shape, 1)
    valid = col < vocab

    # ---- streaming logsumexp over the PRE-suppression logits ----
    lg32 = jnp.where(valid, logits.astype(jnp.float32), NEG_INF)
    m_prev = m_ref[...]                                          # [N, 1]
    m_new = jnp.maximum(m_prev, jnp.max(lg32, axis=1, keepdims=True))
    s_ref[...] = (s_ref[...] * jnp.exp(m_prev - m_new)
                  + jnp.sum(jnp.exp(lg32 - m_new), axis=1, keepdims=True))
    m_ref[...] = m_new

    # ---- top-k over the suppressed logits ----
    # f32 compare: Mosaic has no bf16 vector cmpf ("Target does not support
    # this comparison" on a real v5e)
    is_sup = b_ref[1, :][None, :].astype(jnp.float32) > 0.5
    sup = jnp.where(is_sup, logits + jnp.asarray(-1000.0, logits.dtype), logits)
    sc = jnp.where(valid, sup.astype(jnp.float32), NEG_INF)
    big = jnp.int32(2 ** 30)
    tile_v, tile_i = [], []
    for _ in range(k):
        v = jnp.max(sc, axis=1, keepdims=True)                   # [N, 1]
        # first (lowest-index) maximum — lax.top_k's tie rule; no argmax:
        # min-index-where-equal compiles on every Mosaic version
        i = jnp.min(jnp.where(sc == v, col, big), axis=1, keepdims=True)
        tile_v.append(v)
        tile_i.append(i)
        sc = jnp.where(col == i, NEG_INF, sc)
    # merge carry (lower global indices) with this tile's candidates
    cand_v = jnp.concatenate([vals_ref[...]] + tile_v, axis=1)   # [N, 2k]
    cand_i = jnp.concatenate([idx_ref[...]] + tile_i, axis=1)
    new_v, new_i = [], []
    for _ in range(k):
        v = jnp.max(cand_v, axis=1, keepdims=True)
        finite = cand_v > NEG_INF
        i = jnp.min(jnp.where((cand_v == v) & finite, cand_i, big),
                    axis=1, keepdims=True)
        new_v.append(v)
        new_i.append(i)
        # global indices are unique among finite candidates; the == v guard
        # keeps the -inf init rows (idx 0) from shadowing a real index-0 hit
        cand_v = jnp.where((cand_i == i) & (cand_v == v), NEG_INF, cand_v)
    vals_ref[...] = jnp.concatenate(new_v, axis=1)
    idx_ref[...] = jnp.concatenate(new_i, axis=1).astype(jnp.int32)

    @pl.when(j == nt - 1)
    def _finalize():
        lse_ref[...] = m_ref[...] + jnp.log(s_ref[...])


# populated lazily: pallas imports live inside functions elsewhere in ops/
pl = None


def _ensure_pallas():
    global pl
    if pl is None:
        from jax.experimental import pallas as _pl
        pl = _pl
    return pl


def _pallas_topk(h, w, b2, *, k: int, tile: int, interpret: bool):
    """The raw pallas_call on LOCAL shapes (grid/blocks derived from ``h``).

    Factored out of the dispatcher so ``jax.shard_map`` can run it per-device
    on each shard's rows under a dp mesh (ops/sharding.py)."""
    _ensure_pallas()
    from jax.experimental.pallas import tpu as pltpu

    n, d = h.shape
    v = w.shape[1]
    nt = -(-v // tile)

    vals, idx, lse = pl.pallas_call(
        functools.partial(_kernel, k=k, vocab=v, tile=tile),
        out_shape=[
            jax.ShapeDtypeStruct((n, k), jnp.float32),
            jax.ShapeDtypeStruct((n, k), jnp.int32),
            jax.ShapeDtypeStruct((n, 1), jnp.float32),
        ],
        grid=(nt,),
        in_specs=[
            pl.BlockSpec((n, d), lambda j: (0, 0)),
            pl.BlockSpec((d, tile), lambda j: (0, j)),
            pl.BlockSpec((2, tile), lambda j: (0, j)),
        ],
        out_specs=[
            pl.BlockSpec((n, k), lambda j: (0, 0)),
            pl.BlockSpec((n, k), lambda j: (0, 0)),
            pl.BlockSpec((n, 1), lambda j: (0, 0)),
        ],
        scratch_shapes=[pltpu.VMEM((n, 1), jnp.float32),
                        pltpu.VMEM((n, 1), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=2 * n * d * v,
            bytes_accessed=d * v * w.dtype.itemsize + n * d * h.dtype.itemsize,
            transcendentals=n * v),
        interpret=interpret,
    )(h, w, b2)
    return vals, idx, lse[:, 0]


def fused_logit_topk(h: jnp.ndarray, w: jnp.ndarray, b: jnp.ndarray, k: int,
                     suppress_ids: Tuple[int, ...] = (), tile: int = 2048,
                     interpret: bool = False):
    """h: [N, D] (compute dtype), w: [D, V], b: [V] (same dtype as h).

    Returns (vals [N, k] f32, idx [N, k] i32, lse [N] f32): the per-row top-k
    of ``h @ w + b`` AFTER adding -1000 (in compute dtype) at ``suppress_ids``,
    with values reported f32-exactly, plus the pre-suppression logsumexp.
    Equivalent XLA recipe (decode/beam.py raw_logits stage 1):

        logits = h @ w + b
        lse = logsumexp(logits.astype(f32))
        for sid in suppress_ids: logits = logits.at[:, sid].add(-1000.0)
        vals, idx = lax.top_k(logits, k); vals = vals.astype(f32)

    Mesh dispatch (VERDICT r4 task 3): under an active kernel mesh
    (ops/sharding.use_kernel_mesh, set at trace time by make_generate_step /
    ContinuousServer) the kernel is row-parallel — it runs inside
    ``jax.shard_map`` over 'dp' with w/b replicated, so mesh serving keeps
    the fused tail instead of falling back to the three-op XLA chain. NOT
    ``jax.jit``-decorated on purpose: a nested jit caches by abstract
    signature only and would reuse a trace made under a different mesh
    context. Rows not divisible by dp fall back to the exact XLA recipe
    above (GSPMD partitions it normally).
    """
    from evoke_tpu.ops.sharding import dp_size, kernel_mesh, mesh_allows_kernels

    n, d = h.shape
    dd, v = w.shape
    assert dd == d and b.shape == (v,), (h.shape, w.shape, b.shape)
    assert v >= k, f"vocab {v} < k {k}"
    tile = min(tile, -(-v // 128) * 128)
    # two bias rows: [0] = true bias, [1] = {0,1} suppression indicator (the
    # kernel adds exactly -1000 in the compute dtype at indicated columns)
    ind = jnp.zeros_like(b)
    for sid in suppress_ids:
        ind = ind.at[sid].set(jnp.asarray(1.0, b.dtype))
    b2 = jnp.stack([b, ind])                                     # [2, V]

    kern = functools.partial(_pallas_topk, k=k, tile=tile, interpret=interpret)
    mesh = kernel_mesh()
    if mesh is None:
        return kern(h, w, b2)
    dp = dp_size(mesh)
    if mesh_allows_kernels(mesh) and n % dp == 0:
        from jax.sharding import PartitionSpec as P

        # full-manual over the mesh (mesh_allows_kernels already pins mp == 1,
        # so manual-'mp' is trivial replication; check_vma=False because
        # pallas_call does not propagate varying-manual-axes metadata)
        return jax.shard_map(kern, mesh=mesh,
                             in_specs=(P("dp"), P(), P()),
                             out_specs=(P("dp"), P("dp"), P("dp")),
                             check_vma=False)(h, w, b2)
    # exact XLA fallback (the docstring recipe, nn.Dense(dtype) numerics):
    # reached only when a mesh is active but its shape cannot carry the
    # kernel (mp > 1, or rows not divisible by dp)
    acc = jax.lax.dot_general(h, w, (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)
    logits = acc.astype(h.dtype) + b[None, :]
    lse = jax.scipy.special.logsumexp(logits.astype(jnp.float32), axis=-1)
    for sid in suppress_ids:
        logits = logits.at[:, sid].add(jnp.asarray(-1000.0, logits.dtype))
    vals, idx = jax.lax.top_k(logits, k)
    return vals.astype(jnp.float32), idx, lse


def fused_topk_mode() -> str:
    """EVOKE_LOGIT_TOPK = auto (default) | fused | xla.

    auto: the fused kernel on TPU serving paths, the unfused XLA three-op
    chain elsewhere. 'fused' forces the kernel even off-TPU (interpret mode —
    slow, for exactness tests); 'xla' disables it everywhere."""
    mode = os.environ.get("EVOKE_LOGIT_TOPK", "auto")
    if mode not in ("auto", "fused", "xla"):
        raise ValueError(f"EVOKE_LOGIT_TOPK must be auto|fused|xla, got {mode!r}")
    return mode


def use_fused_logit_topk(model, serving: bool, *, logits_hook=None,
                         decoding_constraint: bool = False, mesh=None) -> bool:
    """Dispatch policy for the serving beam step's vocab tail.

    Fused only when nothing needs the full [N, V] logits on the XLA side:
    ``logits_hook`` (bench load forcing) and ``decoding_constraint`` both
    rewrite the logits between projection and top-k, so they keep the unfused
    path. Non-r2gen decoders (CMN/HF causal) keep their own logit heads.
    Eval paths (serving=False) stay unfused for bit-comparable outputs across
    backends — the same policy split as the lineage kernel (resolve_beam_kv).
    D must fill whole 128-lane tiles for Mosaic (same constraint as
    use_pallas_lineage).

    ``mesh``: a pure-dp mesh keeps the fused tail (the kernel rides
    ``shard_map`` over 'dp' — fused_logit_topk's mesh dispatch); mp > 1
    meshes stay unfused (the [D, V] weight is mp-sharded under TP and the
    kernel would force a per-step all-gather)."""
    mode = fused_topk_mode()
    if mode == "xla":
        return False
    if logits_hook is not None or decoding_constraint:
        return False
    if getattr(model, "decoder_kind", "r2gen") != "r2gen":
        return False
    if mode == "fused":
        return True
    from evoke_tpu.ops.sharding import mesh_allows_kernels

    d = int(getattr(model, "d_model", 0))
    return (serving and jax.default_backend() == "tpu" and d % 128 == 0
            and mesh_allows_kernels(mesh))


def fused_topk_interpret() -> bool:
    """Interpret mode when the kernel is forced onto a non-TPU backend."""
    return jax.default_backend() != "tpu"
