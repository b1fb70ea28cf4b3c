"""On-chip A/B: price the RelationalMemory update's serialized chain cost.

EVOKE_RM_PROBE=skip carries the memory unchanged through the decode step
(NOT exact — measurement only): the difference vs the default is the
latency the RM update's ~12 tiny serial stages (DESIGN 5i) add to every
decoded token. That delta is the CEILING a fused RM Pallas kernel could
recover; measured here to decide whether the kernel is worth building.
Usage: python scripts/ab_rm_probe.py [batch [image_size]]
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

    # serving defaults (fused vocab tail + lineage kernel) on both arms; the
    # probe env is read at TRACE time inside decode_step, so set it around the
    # first (compiling) call of each generate fn.
    gen_on = make_generate_step(model, Tok(), DecodeConfig(beam_size=3),
                                GEN_LEN, with_indication=True, serving=True)
    gen_off = make_generate_step(model, Tok(), DecodeConfig(beam_size=3),
                                 GEN_LEN, with_indication=True, serving=True)

    os.environ.pop("EVOKE_RM_PROBE", None)
    t0 = time.perf_counter()
    s_on = np.asarray(gen_on(state, batch))
    print(f"rm-on compile+run {time.perf_counter() - t0:.1f}s", flush=True)
    os.environ["EVOKE_RM_PROBE"] = "skip"
    t0 = time.perf_counter()
    s_off = np.asarray(gen_off(state, batch))
    os.environ.pop("EVOKE_RM_PROBE", None)
    print(f"rm-skip compile+run {time.perf_counter() - t0:.1f}s", flush=True)
    mism = (s_on != s_off).any(axis=1).mean()
    print(f"rows differing {mism * 100:.2f}% (expected high — the probe is not exact)",
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

    steady(gen_on, n=2)
    steady(gen_off, n=2)  # warm both
    for r in range(3):
        ron = steady(gen_on)
        roff = steady(gen_off)
        print(f"round {r}: rm-on {ron:.1f} r/s | rm-skip {roff:.1f} r/s "
              f"(chain headroom {(roff / ron - 1) * 100:+.1f}%)", flush=True)


if __name__ == "__main__":
    main()
