"""stove_tpu — a TPU-native rebuild of STOVE (jlko/STOVE, arXiv:1910.02425).

Structured object-aware physics prediction for video modeling and planning,
re-designed for TPU from scratch: JAX/XLA for the compute path, `lax.scan`
for the temporal recursion, dense log-space einsums for the sum-product
networks, Pallas kernels for the hot ops, and `jax.sharding` data
parallelism over the device mesh.

Layers mirror the reference's capabilities (see SURVEY.md):
  envs/      physics simulators + dataset pipeline      [ref: envs.py]
  models/    SuPAIR recognition, RAT-SPN, dynamics, STOVE
  ops/       glimpse extraction, Gaussian algebra, Pallas kernels, matching
  parallel/  mesh + sharding utilities (additive over the reference)
  train/     trainer, checkpointing, metrics, visualization
  planning/  MCTS with batched jitted model rollouts
  main.py    CLI with key=value overrides               [ref: model/main.py]
"""

__version__ = "0.1.0"

from stove_tpu.config import Config, PRESETS, make_config  # noqa: F401
