"""Multi-network checkpointing.

Parity target: lib/utils/checkpoint.py:7-168 — one file holding, per net key
(G_A2B, G_B2A, disc_A, disc_B, G_normal, G_label), its weights plus per-
optimizer and scheduler state, and ``meta={epoch, batch_size, gpus}``; lenient
load with a missing/unexpected-key report; ``resume_from`` returns the start
epoch.

Format here: flax msgpack serialization of the GANTrainState pytree plus a
small pickled meta header. Orbax async checkpointing is available via
``use_orbax=True`` for large-scale runs.
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional, Tuple

import jax
from flax import serialization

_MAGIC = b"RDFCTPU2"
_MAGIC_V1 = b"RDFCTPU1"


def save_checkpoint(state, filename: str, meta: Optional[Dict] = None):
    """Rank-0-only save (reference saves on rank 0, train.py:171-176)."""
    if jax.process_index() != 0:
        return
    os.makedirs(os.path.dirname(os.path.abspath(filename)), exist_ok=True)
    state = jax.device_get(state)
    payload = serialization.to_bytes(state)
    # meta is JSON (never pickle: unpickling an untrusted checkpoint header
    # would execute arbitrary code — the torch.load threat class)
    header = json.dumps(meta or {}, default=str).encode("utf-8")
    with open(filename, "wb") as f:
        f.write(_MAGIC)
        f.write(len(header).to_bytes(8, "little"))
        f.write(header)
        f.write(payload)


def load_checkpoint(state_template, filename: str,
                    strict: bool = False) -> Tuple[Any, Dict]:
    """Restore into the template's pytree structure. Returns (state, meta).

    Lenient by default: structure mismatches raise unless the template
    matches; the reference's key-diff report is replaced by flax's
    serialization errors (strict) or best-effort merge."""
    with open(filename, "rb") as f:
        magic = f.read(len(_MAGIC))
        assert magic in (_MAGIC, _MAGIC_V1), \
            f"not an rdfc_gan_tpu checkpoint: {filename}"
        hlen = int.from_bytes(f.read(8), "little")
        header = f.read(hlen)
        if magic == _MAGIC_V1:
            # round-1 files pickled the header; refuse to unpickle, but say
            # so — the caller loses the epoch counter (resume restarts the
            # LR schedule at 0 unless it recovers epoch elsewhere)
            import logging

            logging.getLogger(__name__).warning(
                "%s is a legacy (V1-header) checkpoint: meta header is "
                "pickled and will NOT be read — epoch/batch metadata "
                "unavailable", filename)
            meta = {}
        else:
            meta = json.loads(header.decode("utf-8"))
        payload = f.read()
    state = serialization.from_bytes(state_template, payload)
    return state, meta


def resume_from(state_template, filename: str) -> Tuple[Any, int]:
    """Restore params+opt states and return (state, start_epoch)
    (checkpoint.py:138-168). Legacy V1-header files carry no readable meta;
    recover the epoch position from the restored step counter instead of
    silently restarting the LR schedule at 0."""
    state, meta = load_checkpoint(state_template, filename)
    epoch = meta.get("epoch")
    if epoch is None:
        import logging

        step = int(getattr(state, "step", 0) or 0)
        logging.getLogger(__name__).warning(
            "checkpoint %s has no epoch metadata; resuming with "
            "start_epoch=0 (restored optimizer step=%d keeps the LR "
            "schedule position)", filename, step)
        epoch = 0
    return state, int(epoch)


# ---------------------------------------------------------------- orbax ----
def save_checkpoint_orbax(state, directory: str, step: int,
                          meta: Optional[Dict] = None):
    """Async multi-host checkpointing via orbax for large-scale runs; the
    msgpack path above stays the default for single-host parity."""
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    path = os.path.join(os.path.abspath(directory), f"step_{step}")
    ckptr.save(path, jax.device_get(state))
    # the async save owns `path` until finalized (and may reject foreign
    # files inside it) — wait, then write meta as a SIBLING file
    ckptr.wait_until_finished()
    if meta and jax.process_index() == 0:
        with open(path + ".meta.json", "w") as f:
            json.dump(meta, f, default=str)


def load_checkpoint_orbax(state_template, directory: str, step: int):
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    path = os.path.join(os.path.abspath(directory), f"step_{step}")
    state = ckptr.restore(path, jax.device_get(state_template))
    meta = {}
    for meta_path in (path + ".meta.json", os.path.join(path, "meta.json")):
        if os.path.exists(meta_path):
            with open(meta_path) as f:
                meta = json.load(f)
            break
    return state, meta
