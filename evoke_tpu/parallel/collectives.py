"""Explicit-collective (shard_map) building blocks.

The framework's default train path is GSPMD: jit + sharded batch arrays, XLA
inserting the all-gathers/psums (see losses/contrastive.py, train/steps.py).
This module provides the explicit shard_map equivalents — the TPU analogue of
the reference's (commented-out) NCCL gather path (EVOKE green_score/
utils.py:134-156) — for when manual scheduling is wanted, and as an executable
specification: tests assert the explicit path equals the GSPMD path.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Callable, Dict

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map


def psum_mean(x, axis_name: str = "dp"):
    """Mean over the data-parallel axis (gradient/metric reduction)."""
    return jax.lax.pmean(x, axis_name)


def all_gather_batch(x, axis_name: str = "dp"):
    """Gather shards along the leading batch dim: [b_local, ...] -> [b_global, ...].

    This is what makes cross-shard contrastive positives visible (SURVEY §2.10).
    """
    return jax.lax.all_gather(x, axis_name, axis=0, tiled=True)


def make_shardmap_loss(mesh: Mesh, loss_fn: Callable[..., jnp.ndarray]):
    """Wrap a global-batch loss fn into a shard_map over dp-sharded inputs.

    loss_fn sees the all-gathered (global) arrays on every shard and must be
    invariant to which shard computes it (all our contrastive losses are).
    """

    @partial(shard_map, mesh=mesh, in_specs=P("dp"), out_specs=P(),
             check_vma=False)
    def run(*shards):
        full = [all_gather_batch(s) for s in shards]
        return loss_fn(*full)

    return run
