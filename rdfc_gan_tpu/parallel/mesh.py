"""Device mesh + sharding helpers — the TPU replacement for the reference's
NCCL/DDP layer (SURVEY.md §2.9).

The reference's one parallelism strategy is data parallelism: one process per
GPU, DDP gradient all-reduce, DistributedSampler, loss all_reduce, tmpdir
pickle eval gather. Here the same strategy is a 1-axis ("data") Mesh:
batches carry a NamedSharding over that axis, the replicated train state and
jit do the rest — XLA inserts the psum for gradients and metric reductions
over ICI. A second ("model") axis is reserved in the API for tensor-parallel
extensions; at this model scale (<300M params) DP is the right mapping.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(mesh_shape: Optional[Dict[str, int]] = None,
              devices=None) -> Mesh:
    """Default: all devices on the 'data' axis. ``mesh_shape`` like
    {'data': 4, 'model': 2} reshapes."""
    devices = devices if devices is not None else jax.devices()
    if not mesh_shape:
        mesh_shape = {"data": len(devices)}
    names = tuple(mesh_shape.keys())
    shape = tuple(mesh_shape.values())
    arr = np.asarray(devices).reshape(shape)
    return Mesh(arr, names)


def data_sharding(mesh: Mesh) -> NamedSharding:
    """Batch-dim sharding over the 'data' axis."""
    return NamedSharding(mesh, P("data"))


def replicate_state(state, mesh: Mesh):
    """Fully replicate a pytree (params/opt state) over the mesh."""
    repl = NamedSharding(mesh, P())
    return jax.device_put(state, repl)


def shard_batch(batch, mesh: Mesh):
    """Place a host batch with batch-dim sharding over 'data'."""
    sh = data_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sh), batch)
