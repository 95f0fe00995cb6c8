"""Host-side batching loader with device sharding + prefetch.

Replaces the reference's (missing) ``build_dataloader`` factory
(helper.py:173-230): torch DataLoader + DistributedSampler become a simple
epoch-shuffled index sampler whose batches are placed with a NamedSharding —
per-process slicing replaces DistributedSampler, XLA collectives replace DDP.
"""

from __future__ import annotations

import collections
from typing import Dict, Iterator, Optional

import jax
import numpy as np


def _stack(samples):
    out = {}
    for k in samples[0]:
        out[k] = np.stack([s[k] for s in samples], axis=0)
    return out


# ---------------------------------------------------------- process workers
# True multi-process decode (the reference's ``workers_per_gpu`` contract,
# helper.py:217-230): thread workers overlap cv2's GIL-released decode with
# the device step, but the pure-python augment/normalize part serializes on
# the GIL — on hosts feeding many chips (~250 img/s for a v5e-8) the decode
# pool must scale across cores. Workers are plain CPython processes holding
# an unpickled copy of the dataset; one task = one full batch (fewer IPC
# round-trips than per-sample), returned as pickled numpy arrays.
_WORKER_DS = None
_WORKER_EPOCH = -1


def _proc_init(ds_bytes: bytes):
    import os

    # workers never touch an accelerator: keep jax (imported transitively
    # by the registry) off the TPU tunnel before the dataset unpickles
    os.environ["JAX_PLATFORMS"] = "cpu"
    global _WORKER_DS
    import pickle

    _WORKER_DS = pickle.loads(ds_bytes)


def _proc_fetch(rows, epoch: int):
    global _WORKER_EPOCH
    if epoch != _WORKER_EPOCH and hasattr(_WORKER_DS, "set_epoch"):
        # per-sample RNG is a pure fn of (seed, epoch, idx) (base.py:92) —
        # syncing the epoch makes process workers bit-identical to threads
        _WORKER_DS.set_epoch(epoch)
        _WORKER_EPOCH = epoch
    return _stack([_WORKER_DS[int(j)] for j in rows])


class DataLoader:
    """Deterministic, epoch-seeded shuffling batcher.

    ``set_epoch`` mirrors DistributedSampler.set_epoch (train.py:139) — the
    shuffle order is a pure function of (seed, epoch).
    """

    def __init__(self, dataset, batch_size: int, shuffle: bool = True,
                 drop_last: bool = True, seed: int = 0,
                 sharding: Optional[jax.sharding.Sharding] = None,
                 num_prefetch: int = 2, num_workers: int = 4,
                 per_process: bool = False, with_indices: bool = False,
                 worker_backend: str = "thread"):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.seed = seed
        self.epoch = 0
        self.sharding = sharding
        self.num_prefetch = num_prefetch
        # cv2/h5py release the GIL: thread workers overlap decode with the
        # device step (replaces torch DataLoader's worker processes).
        # worker_backend="process" spawns a persistent process pool instead
        # — the GIL-free analog of the reference's workers_per_gpu process
        # DataLoader (helper.py:217-230) for hosts feeding many chips.
        self.num_workers = num_workers
        if worker_backend not in ("thread", "process"):
            raise ValueError(f"worker_backend {worker_backend!r} not in "
                             f"('thread', 'process')")
        self.worker_backend = worker_backend
        self._proc_pool = None
        self.per_process = per_process
        # when True each batch carries a ``sample_idx`` int32 key: the global
        # dataset index per row, or -1 for pad rows of a non-full final batch
        # (drop_last=False) — consumers (Eval) mask/dedupe on it.
        self.with_indices = with_indices

    def set_epoch(self, epoch: int):
        self.epoch = epoch

    def _per_host_count(self) -> int:
        n = len(self.dataset)
        if self.per_process:
            # shards are padded to equal per-host length (DistributedSampler
            # semantics) so every host runs the same number of collective
            # steps — unequal __len__ across hosts would deadlock SPMD.
            n = -(-n // jax.process_count())
        return n

    def __len__(self):
        n = self._per_host_count()
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def _indices(self):
        n = len(self.dataset)
        idx = np.arange(n)
        if self.shuffle:
            np.random.RandomState(self.seed * 1000003 + self.epoch).shuffle(idx)
        if self.per_process:
            # multi-host: each process loads only its shard of the global
            # order (DistributedSampler analog; same seed => same global
            # permutation on every host). Pad the global list to a multiple
            # of process_count by repeating leading indices so every host
            # gets the same shard length.
            pc = jax.process_count()
            per = -(-n // pc)
            if per * pc > n:
                idx = np.concatenate([idx, idx[: per * pc - n]])
            idx = idx[jax.process_index()::pc]
        return idx

    def _get_proc_pool(self):
        """Persistent spawn pool (created once, reused across epochs —
        spawn + dataset unpickle is the expensive part)."""
        if self._proc_pool is None:
            import multiprocessing as mp
            import pickle
            from concurrent.futures import ProcessPoolExecutor

            self._proc_pool = ProcessPoolExecutor(
                max_workers=max(self.num_workers, 1),
                mp_context=mp.get_context("spawn"),
                initializer=_proc_init,
                initargs=(pickle.dumps(self.dataset),))
        return self._proc_pool

    def close(self):
        if self._proc_pool is not None:
            self._proc_pool.shutdown()
            self._proc_pool = None

    def __del__(self):  # pragma: no cover - interpreter teardown
        try:
            self.close()
        except Exception:
            pass

    def _batch_rows(self, idx, i):
        rows = idx[i * self.batch_size:(i + 1) * self.batch_size]
        pads = self.batch_size - len(rows)
        if pads:  # non-full final batch (drop_last=False): repeat the
            # tail so sharded device_put stays divisible; pad rows
            # are flagged -1 in sample_idx for the consumer to drop.
            rows = np.concatenate([rows, np.repeat(rows[-1:], pads)])
        return rows, pads

    def _finish(self, batch, rows, pads):
        if self.with_indices:
            si = rows.astype(np.int32)
            if pads:
                si[-pads:] = -1
            batch["sample_idx"] = si
        if self.sharding is not None:
            if jax.process_count() > 1:
                # host-local rows -> one global sharded array
                # (device_put requires fully-addressable shardings)
                batch = jax.tree.map(
                    lambda x: jax.make_array_from_process_local_data(
                        self.sharding, x), batch)
            else:
                batch = jax.device_put(batch, self.sharding)
        return batch

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        if self.worker_backend == "process":
            yield from self._iter_process()
            return
        yield from self._iter_thread()

    def _iter_thread(self):
        from concurrent.futures import ThreadPoolExecutor

        idx = self._indices()
        nb = len(self)
        queue = collections.deque()

        with ThreadPoolExecutor(max_workers=max(self.num_workers, 1)) as pool:

            def submit(i):
                rows, pads = self._batch_rows(idx, i)
                futures = [pool.submit(self.dataset.__getitem__, int(j))
                           for j in rows]
                return futures, rows, pads

            for i in range(min(self.num_prefetch, nb)):
                queue.append(submit(i))
            for i in range(nb):
                futures, rows, pads = queue.popleft()
                nxt = i + self.num_prefetch
                if nxt < nb:
                    queue.append(submit(nxt))
                yield self._finish(_stack([f.result() for f in futures]),
                                   rows, pads)

    def _iter_process(self):
        idx = self._indices()
        nb = len(self)
        queue = collections.deque()
        pool = self._get_proc_pool()

        def submit(i):
            rows, pads = self._batch_rows(idx, i)
            return pool.submit(_proc_fetch, rows, self.epoch), rows, pads

        for i in range(min(self.num_prefetch, nb)):
            queue.append(submit(i))
        for i in range(nb):
            fut, rows, pads = queue.popleft()
            nxt = i + self.num_prefetch
            if nxt < nb:
                queue.append(submit(nxt))
            yield self._finish(fut.result(), rows, pads)


def build_dataloader(dataset, samples_per_gpu: int, workers_per_gpu: int = 0,
                     num_gpus: int = 1, dist: bool = False,
                     pin_memory: bool = True, drop_last: bool = True,
                     shuffle: bool = True, seed: int = 0,
                     sharding=None,
                     worker_backend: str = "thread") -> DataLoader:
    """API-parity wrapper for the missing reference factory
    (SURVEY.md §0). ``samples_per_gpu`` scales to the global batch across the
    addressable device count when a sharding is given; ``dist`` maps to
    per-process index slicing (DistributedSampler analog);
    ``worker_backend="process"`` matches the reference's process-pool
    worker semantics (helper.py:217-230)."""
    del pin_memory
    batch = samples_per_gpu * max(num_gpus, 1)
    return DataLoader(dataset, batch, shuffle=shuffle, drop_last=drop_last,
                      seed=seed, sharding=sharding,
                      num_workers=max(workers_per_gpu, 1),
                      per_process=bool(dist), worker_backend=worker_backend)
