"""F1-RadGraph surface (re-exported from adapters; see adapters.py for gating)."""

from evoke_tpu.evals.adapters import F1RadGraphAdapter, MetricUnavailable, radgraph_serialize

__all__ = ["F1RadGraphAdapter", "MetricUnavailable", "radgraph_serialize"]
