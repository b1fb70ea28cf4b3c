"""Tensor-parallel parameter sharding rules (the 'mp' mesh axis).

The reference has no TP (SURVEY §2.10) — DP is the only strategy present — but
the framework expresses the mesh so parallelism composes (§2.10's mandate).
These rules implement Megatron-style TP for the transformer stacks under GSPMD:
q/k/v and FFN-up kernels shard their OUTPUT dim on 'mp' (column parallel);
attention-out and FFN-down kernels shard their INPUT dim (row parallel); the
logit projection shards the vocab dim; convs and norms stay replicated. XLA
inserts the reduce-scatter/all-reduce pairs; no manual collectives needed.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

# column-parallel: shard kernel output dim (axis 1)
_COL_NAMES = ("wq", "wk", "wv", "fc_q", "fc_k", "fc_v", "mlp_gamma_0", "mlp_beta_0")
# row-parallel: shard kernel input dim (axis 0)
_ROW_NAMES = ("wo", "fc_o", "out")


def tp_spec_for_path(path, leaf) -> P:
    names = [str(getattr(k, "key", k)) for k in path]
    if names[-1] != "kernel" or np.ndim(leaf) != 2:
        return P()
    parent = names[-2] if len(names) >= 2 else ""
    grandparent = names[-3] if len(names) >= 3 else ""
    if parent in _COL_NAMES:
        return P(None, "mp")
    if parent in _ROW_NAMES or grandparent in _ROW_NAMES:
        return P("mp", None)
    # FFN: PositionwiseFFN / BertFFNBlock Dense_0 is the up-projection
    if parent == "Dense_0" and ("ffn" in names or any("ff" == n for n in names)):
        return P(None, "mp")
    if parent == "logit":
        return P(None, "mp")
    return P()


def shard_params_tp(params: Any, mesh: Mesh) -> Any:
    """device_put every param with its TP spec over the given mesh."""

    def put(path, leaf):
        spec = tp_spec_for_path(path, leaf)
        # dims must divide the mesh axis; fall back to replication otherwise
        mp = mesh.shape.get("mp", 1)
        shape = np.shape(leaf)
        for dim, name in enumerate(spec):
            if name == "mp" and shape[dim] % mp != 0:
                spec = P()
                break
        return jax.device_put(leaf, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map_with_path(put, params)


def replicate_params(params: Any, mesh: Mesh) -> Any:
    return jax.device_put(params, NamedSharding(mesh, P()))
