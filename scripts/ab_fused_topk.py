"""On-chip A/B: fused Pallas vocab tail vs the XLA three-op chain.

Interleaved steady-state measurement at the serving config (224, batch 64,
beam 3, vocab 30000, phases 8) plus token parity between the two paths.
Usage: python scripts/ab_fused_topk.py [batch [image_size]]
"""
import os
import sys
import time
from collections import deque

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), ".cache", "jax"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from evoke_tpu.core.config import DecodeConfig
    from evoke_tpu.train.steps import TrainState, make_generate_step
    from __graft_entry__ import _example_batch, _flagship

    VOCAB = int(os.environ.get("BENCH_VOCAB", 30000))
    GEN_LEN = 100
    b = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    size = int(sys.argv[2]) if len(sys.argv) > 2 else 224

    class Tok:
        bos_id, eos_id, pad_id, unk_id = VOCAB - 2, VOCAB - 1, 0, 4

        def get_vocab_size(self):
            return VOCAB

    t0 = time.perf_counter()
    model = _flagship(vocab_size=VOCAB)
    rng = np.random.default_rng(0)
    batch = _example_batch(rng, b, b, size, GEN_LEN, VOCAB)
    variables = jax.jit(lambda k, d=batch: model.init(
        k, d["images"], d["ids"], d["mask"], d["pids"], d["valid"],
        d["inc_ids"], d["inc_mask"], method=model.warmup))(jax.random.key(0))
    state = TrainState(step=0, params=variables["params"],
                       batch_stats=variables.get("batch_stats", {}), opt_state=None)
    batch = jax.device_put(batch)
    print(f"init done {time.perf_counter() - t0:.1f}s", flush=True)

    def mk(mode):
        os.environ["EVOKE_LOGIT_TOPK"] = mode
        return make_generate_step(model, Tok(), DecodeConfig(beam_size=3),
                                  GEN_LEN, with_indication=True, serving=True)

    gen_x, gen_f = mk("xla"), mk("fused")
    t0 = time.perf_counter()
    sx = np.asarray(gen_x(state, batch))
    print(f"xla compile+run {time.perf_counter() - t0:.1f}s", flush=True)
    t0 = time.perf_counter()
    sf = np.asarray(gen_f(state, batch))
    print(f"fused compile+run {time.perf_counter() - t0:.1f}s", flush=True)
    mism = (sx != sf).any(axis=1).mean()
    print(f"token parity: {(sx == sf).all()} (rows differing: {mism * 100:.2f}% "
          "— bf16 near-tie beams may round differently across compilations)",
          flush=True)

    def steady(gen, n=8, depth=2):
        q = deque()
        t0 = time.perf_counter()
        for _ in range(n):
            q.append(gen(state, batch))
            if len(q) > depth:
                np.asarray(q.popleft())
        while q:
            np.asarray(q.popleft())
        return b * n / (time.perf_counter() - t0)

    steady(gen_x, n=2)
    steady(gen_f, n=2)  # warm both
    for r in range(3):
        rx = steady(gen_x)
        rf = steady(gen_f)
        print(f"round {r}: xla {rx:.1f} r/s | fused {rf:.1f} r/s "
              f"({(rf / rx - 1) * 100:+.1f}%)", flush=True)


if __name__ == "__main__":
    main()
