"""Mesh context for Pallas kernels under GSPMD (VERDICT r4 task 3).

A ``pallas_call`` inside a GSPMD-partitioned jit has no partitioning rule:
XLA would have to replicate its operands, so the serving paths historically
dropped both Pallas kernels (the lineage attention and the fused vocab tail)
whenever a mesh was present — multi-chip serving ran a different, ~25% slower
program than the single-chip one the bench headlines (VERDICT r4 weak #3).

Both kernels are row-parallel over the batch/slot axis: no cross-sample
communication, every grid program touches one sample's block. The fix is the
standard one — wrap the ``pallas_call`` in ``jax.shard_map`` over the 'dp'
mesh axis so each device runs the kernel on its local rows — but the kernel
call sites sit deep inside flax modules that never see the mesh. This module
carries the mesh from the step builder (make_generate_step /
ContinuousServer) to the kernel dispatchers through a context variable that
is READ AT TRACE TIME: the builders wrap their traced bodies in
``use_kernel_mesh(mesh)``, and the (un-jitted) kernel dispatchers consult
``kernel_mesh()`` while the surrounding jit traces them.

The dispatchers must NOT be ``jax.jit``-decorated: a nested jit caches by
abstract signature only, so a second trace under a different mesh context
would silently reuse the first trace's (wrong) partitioning. They are always
called under an outer jit in production, so dropping the decorator costs
nothing.

Scope: kernels engage under PURE-dp meshes (mp == 1). Under tensor
parallelism the fused tail's [D, V] weight is mp-sharded and the kernels
would force an all-gather per step; the mp > 1 policy stays the XLA
fallback (resolve_beam_kv / use_fused_logit_topk return the unfused paths).
"""

from __future__ import annotations

import contextlib
from contextvars import ContextVar
from typing import Optional

_KERNEL_MESH: ContextVar = ContextVar("evoke_kernel_mesh", default=None)


def kernel_mesh():
    """The mesh Pallas kernels should shard_map over, or None (single-chip)."""
    return _KERNEL_MESH.get()


@contextlib.contextmanager
def use_kernel_mesh(mesh):
    """Trace-time context: make ``mesh`` visible to the kernel dispatchers.

    Wrap the BODY of the traced function (so the context is active while jax
    traces the flax modules that call the kernels), not the jitted call."""
    token = _KERNEL_MESH.set(mesh)
    try:
        yield
    finally:
        _KERNEL_MESH.reset(token)


def mesh_allows_kernels(mesh) -> bool:
    """Pallas kernels ride the mesh only when it is pure-dp (mp == 1)."""
    return mesh is None or int(mesh.shape.get("mp", 1)) == 1


def dp_size(mesh) -> int:
    return int(mesh.shape.get("dp", 1)) if mesh is not None else 1
