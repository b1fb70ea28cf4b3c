"""Pipelined report-generation serving.

EVOKE has no serving layer; its closest analogue is the ``Tester`` batch loop
with a host sync per batch (reference modules/trainer_v0401.py:579-658). On a
real serving path that per-call sync charges every batch the runtime's fixed
dispatch overhead. Measured on TPU v5e (DESIGN §5b): keeping a bounded number
of generate calls in flight and syncing on dequeue raises chip throughput
337 -> 392 reports/s at 224 px / batch 64 (beam 3).

This module makes that loop a reusable surface:

- ``generate_stream``: pipeline any (device_batch, host_extras) iterator
  through a jitted generate step with ``depth`` calls in flight, yielding
  results in submission order.
- ``ReportServer``: model + tokenizer + trained state -> ``serve(loader)``
  returning one record per study (id, report text, ground truth when present)
  plus steady-state throughput/latency stats.
"""

from __future__ import annotations

import time
from collections import deque
from typing import Any, Dict, Iterable, Iterator, List, Optional, Tuple

import numpy as np

from evoke_tpu.data.batching import Prefetcher, device_prefetch
from evoke_tpu.train.steps import TrainState, make_generate_step

# the reference substitutes a canned line for empty generations
# (models/model_pretrain_finetune_v0425_ablation.py:125)
EMPTY_REPORT = "there is no evidence of pulmonary."


def generate_stream(gen, state: TrainState, batches: Iterable[Tuple[Dict, Dict]],
                    depth: int = 2) -> Iterator[Tuple[Dict, np.ndarray]]:
    """Yield ``(host_extras, seqs)`` in order with up to ``depth`` calls in flight.

    ``gen`` dispatches asynchronously; the host sync (np.asarray) happens on
    dequeue, so while batch i transfers back, batches i+1..i+depth are already
    queued on the device. The device executes serially — wall time over N
    batches is the true chip throughput, not a dispatch artifact.
    """
    q: deque = deque()
    for dev, host in batches:
        q.append((host, gen(state, dev)))
        while len(q) > depth:
            h, out = q.popleft()
            yield h, np.asarray(out)
    while q:
        h, out = q.popleft()
        yield h, np.asarray(out)


class ReportServer:
    """Batched, pipelined report generation over trained weights.

    ``loaders`` follow the eval-loader contract (MultiviewBatcher): batches
    carry device arrays plus host-side ``_image_ids`` / optional ``_gts``.
    """

    def __init__(self, model, tokenizer, state: TrainState, decode_cfg,
                 max_seq_len: int = 100, depth: int = 2, mesh=None):
        self.tokenizer = tokenizer
        self.state = state
        self.depth = depth
        self.mesh = mesh
        # grouped fusion attention truncates partners beyond its static bound;
        # serve() checks every batch host-side and fails loudly instead
        self._max_partners = getattr(model, "fusion_max_partners", None)
        # mesh rides into the generate steps so the Pallas serving kernels
        # stay engaged under a pure-dp mesh (ops/sharding.py)
        self._gen = {
            True: make_generate_step(model, tokenizer, decode_cfg, max_seq_len,
                                     with_indication=True, serving=True,
                                     mesh=mesh),
            False: make_generate_step(model, tokenizer, decode_cfg, max_seq_len,
                                      with_indication=False, serving=True,
                                      mesh=mesh),
        }
        self.stats: Dict[str, float] = {}

    def serve(self, loader, with_indication: bool = False,
              prefetch: int = 2) -> List[Dict[str, Any]]:
        """Generate a report for every study in ``loader``.

        Returns records ``{"id", "report", "gt"?}`` in loader order and fills
        ``self.stats`` with wall-clock throughput over the run.
        """
        gen = self._gen[with_indication]
        records: List[Dict[str, Any]] = []

        def with_host_valid(batches):
            # keep the anchor-validity mask host-side so padded slots can be
            # dropped without a device round-trip per batch
            for b in batches:
                b = dict(b)
                b["_valid"] = np.asarray(b["valid"])
                if self._max_partners is not None:
                    from evoke_tpu.models.fusion import max_partners_in

                    n_anchor = b["ids"].shape[0]
                    got = max_partners_in(b["pids"], b["valid"], n_anchor)
                    if got > self._max_partners:
                        raise ValueError(
                            f"batch has an anchor with {got} same-study partner "
                            f"views, above model.fusion_max_partners="
                            f"{self._max_partners}: grouped fusion attention "
                            "would silently drop views. Raise the bound (or set "
                            "it to null for dense attention).")
                yield b

        batches = device_prefetch(with_host_valid(Prefetcher(loader, prefetch)),
                                  self.mesh, prefetch)
        t0 = time.perf_counter()
        n_batches = 0
        for host, seqs in generate_stream(gen, self.state, batches, self.depth):
            n_batches += 1
            texts = self.tokenizer.decode_batch(seqs.tolist())
            gts = host.get("_gts")
            valid = host["_valid"]
            for i, (iid, text) in enumerate(zip(host["_image_ids"], texts)):
                if not valid[i]:
                    continue
                rec: Dict[str, Any] = {
                    "id": iid,
                    "report": text if text.strip() else EMPTY_REPORT,
                }
                if gts is not None:
                    rec["gt"] = gts[i]
                records.append(rec)
        wall = time.perf_counter() - t0
        self.stats = {
            "reports": float(len(records)),
            "batches": float(n_batches),
            "wall_s": wall,
            "reports_per_s": len(records) / wall if wall > 0 else float("nan"),
        }
        return records
