"""evoke-tpu: a TPU-native (JAX/XLA/Pallas/pjit) chest X-ray report-generation framework.

Capability parity target: mk-runner/EVOKE (see SURVEY.md). The design is TPU-first:
SPMD data parallelism over an ICI device mesh, static-shape multi-view batching,
jitted train/decode loops with KV-cached beam search, and host-side eval services.
"""

__version__ = "0.1.0"
