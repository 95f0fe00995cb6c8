"""Worker for the two-process data-parallel test (run via subprocess).

Each process: jax.distributed.initialize over a shared coordinator, a
per-process-sharded DataLoader (DistributedSampler analog, helper.py:217-230),
one global-batch psum, and a process_allgather eval merge. Prints one JSON
line with everything the parent asserts on.

Usage: python multiprocess_worker.py <coordinator> <num_procs> <pid> [ds_len]
"""

import json
import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.pop("XLA_FLAGS", None)  # one CPU device per process

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

coord, nproc, pid = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])
ds_len = int(sys.argv[4]) if len(sys.argv) > 4 else 10
jax.distributed.initialize(coordinator_address=coord, num_processes=nproc,
                           process_id=pid)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
from jax.experimental import multihost_utils  # noqa: E402

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from rdfc_gan_tpu.data import DataLoader  # noqa: E402
from rdfc_gan_tpu.parallel import data_sharding, make_mesh  # noqa: E402


class TinyDataset:
    """ds_len rows; value = global index (so shard contents are checkable)."""

    def __len__(self):
        return ds_len

    def __getitem__(self, i):
        return {"x": np.full((2, 2, 1), float(i), np.float32)}


mesh = make_mesh()  # all (global) devices on 'data'
sh = data_sharding(mesh)
loader = DataLoader(TinyDataset(), batch_size=2, shuffle=False,
                    drop_last=False, sharding=sh, per_process=True,
                    with_indices=True)

seen = []
psums = []
for batch in loader:
    seen.extend(np.asarray(
        multihost_utils.process_allgather(batch["sample_idx"], tiled=True))
        .ravel().tolist())
    s = jax.jit(lambda x: jnp.sum(jnp.mean(x, axis=(1, 2, 3))))(batch["x"])
    psums.append(float(s))

local_idx = loader._indices().tolist()
print(json.dumps({
    "pid": pid,
    "n_batches": len(loader),
    "local_indices": local_idx,
    "gathered_idx": sorted(set(i for i in seen if i >= 0)),
    "psums": psums,
}))
