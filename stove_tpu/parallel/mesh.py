"""Device mesh + sharding utilities (data parallelism over ICI).

The reference has **no** distributed backend at all (SURVEY.md §2: no
NCCL/MPI/Gloo; single process, single GPU).  The TPU-native equivalent
specified in SURVEY §5.8 is single-controller JAX: a 1-D `Mesh(('data',))`
over the local chips, batches sharded on their leading axis, params
replicated, and the gradient all-reduce riding ICI automatically via XLA's
collectives under sharded `jit`.

The mesh is built 1-D by default but takes any `cfg.mesh_shape`/`mesh_axes`
so a second axis (e.g. ('data', 'model')) can be added without touching call
sites — per SURVEY §5.8's "design the mesh code so a second axis can be
added later".
"""

from __future__ import annotations

import math
from typing import Any, Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from stove_tpu.config import Config


def make_mesh(cfg: Optional[Config] = None,
              devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    """Build the device mesh.  mesh_shape (0, ...) → fill with all devices."""
    devices = list(devices if devices is not None else jax.devices())
    if cfg is None:
        shape: Tuple[int, ...] = (len(devices),)
        axes: Tuple[str, ...] = ("data",)
    else:
        shape = tuple(cfg.mesh_shape)
        axes = tuple(cfg.mesh_axes)
        if 0 in shape:
            known = math.prod(s for s in shape if s != 0)
            fill = len(devices) // known
            shape = tuple(fill if s == 0 else s for s in shape)
    n = math.prod(shape)
    mesh_devs = np.array(devices[:n]).reshape(shape)
    return Mesh(mesh_devs, axes)


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading-axis ('data') sharding for batched arrays."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, tree: Any) -> Any:
    """Place every array in the pytree with its leading dim sharded on
    'data'.  Leading dims must divide the data-axis size."""
    sh = batch_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), tree)


def replicate(mesh: Mesh, tree: Any) -> Any:
    rep = replicated(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, rep), tree)


def pad_to_multiple(x, multiple: int, axis: int = 0):
    """Pad axis 0 up to a multiple (for sharding ragged eval batches).

    Returns (padded, original_length)."""
    import jax.numpy as jnp

    n = x.shape[axis]
    target = ((n + multiple - 1) // multiple) * multiple
    if target == n:
        return x, n
    pad = [(0, 0)] * x.ndim
    pad[axis] = (0, target - n)
    return jnp.pad(x, pad), n
