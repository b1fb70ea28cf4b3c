"""Throughput benchmark: batched beam-search report generation on one chip.

Metric (BASELINE.json): reports/sec/chip at 224, beam=3, max 100 tokens, on the
flagship FinetuneModel (ResNet-101 + multiview fusion + indication co-attention
+ KV-cached relational-memory beam decoder, bfloat16 compute).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
The reference publishes no throughput numbers (SURVEY.md §6); BASELINE_RPS pins
this framework's round-1 measurement so later rounds show relative progress.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

# Round-1 reference point (reports/sec/chip on TPU v5e-1). None -> vs_baseline=1.0.
BASELINE_RPS = None


def main():
    import jax

    from evoke_tpu.core.config import DecodeConfig
    from evoke_tpu.train.steps import TrainState, make_generate_step
    from __graft_entry__ import _example_batch, _flagship

    n_anchor = int(os.environ.get("BENCH_ANCHORS", 32))
    n_aux = n_anchor
    image_size = int(os.environ.get("BENCH_IMAGE_SIZE", 224))
    vocab = 4000
    iters = int(os.environ.get("BENCH_ITERS", 6))

    class _Tok:
        bos_id, eos_id, pad_id, unk_id = vocab - 2, vocab - 1, 0, 4

        def get_vocab_size(self):
            return vocab

    model = _flagship(vocab_size=vocab)
    rng = np.random.default_rng(0)
    batch = _example_batch(rng, n_anchor, n_aux, image_size, 100, vocab)
    variables = jax.jit(model.init)(jax.random.key(0), batch["images"], batch["ids"],
                                    batch["mask"], batch["pids"], batch["valid"],
                                    batch["inc_ids"], batch["inc_mask"])
    state = TrainState(step=0, params=variables["params"],
                       batch_stats=variables.get("batch_stats", {}), opt_state=None)
    gen = make_generate_step(model, _Tok(), DecodeConfig(beam_size=3), 100,
                             with_indication=True)

    # device-resident inputs: steady-state serving rate (host->device transfer
    # overlaps via device_prefetch in the real pipeline; uint8 transport cuts it 4x).
    # Latency is measured per call with block_until_ready — async-loop timing
    # over-reports through the remote runtime (measured round 1: artifacts up to 20x).
    batch = jax.device_put(batch)

    seqs = gen(state, batch)           # warmup / compile
    seqs.block_until_ready()
    assert (np.asarray(seqs) != 0).any(), "generation produced only PAD"

    lats = []
    for _ in range(iters):
        t0 = time.perf_counter()
        gen(state, batch).block_until_ready()
        lats.append(time.perf_counter() - t0)
    p50 = float(np.percentile(np.asarray(lats), 50))
    rps = n_anchor / p50
    vs = rps / BASELINE_RPS if BASELINE_RPS else 1.0
    print(json.dumps({
        "metric": f"reports/sec/chip @ {image_size}px beam=3 len=100 (bf16, "
                  f"batch {n_anchor}, p50 batch latency {p50 * 1e3:.1f} ms)",
        "value": round(rps, 3),
        "unit": "reports/s",
        "vs_baseline": round(vs, 3),
    }))


if __name__ == "__main__":
    main()
