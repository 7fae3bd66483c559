"""Mesh + sharding (data parallel over ICI; additive vs the reference)."""

from stove_tpu.parallel.mesh import (  # noqa: F401
    batch_sharding,
    make_mesh,
    pad_to_multiple,
    replicate,
    replicated,
    shard_batch,
)
