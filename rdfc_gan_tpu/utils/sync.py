"""Hard device synchronization for benchmarking.

On tunneled/remote PJRT backends (the axon relay used in this environment),
``jax.block_until_ready`` can return once the dispatch is acknowledged rather
than when the computation finishes — wall-clock timings taken with it are
fiction. ``hard_sync`` forces a device->host readback of one scalar, which
cannot materialize before every producing computation has completed. For a
chained sequence of steps (state threading through each call), syncing the
final output forces the entire chain.
"""

from __future__ import annotations

import jax
import numpy as np


def hard_sync(tree) -> float:
    """Force completion by reading back one scalar from the first array leaf.
    Returns the scalar (to defeat dead-code elimination in callers)."""
    leaves = [x for x in jax.tree.leaves(tree)
              if hasattr(x, "dtype") and hasattr(x, "ravel")]
    if not leaves:
        return 0.0
    x = leaves[0]
    flat = x.ravel()
    return float(np.asarray(flat[:1])[0].real if flat.size else 0.0)
