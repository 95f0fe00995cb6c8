"""Two-process data parallelism over jax.distributed (CPU backend) —
VERDICT round-1 item #5. Spawns two real processes sharing a coordinator;
each must load a DISJOINT per-process shard with EQUAL batch counts
(DistributedSampler semantics, helper.py:217-230), compute identical global
reductions, and reconstruct the full index set via process_allgather
(the reference's tmpdir-pickle gather, misc.py:12-57)."""

import json
import os
import socket
import subprocess
import sys

import pytest

WORKER = os.path.join(os.path.dirname(__file__), "multiprocess_worker.py")


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.slow
def test_two_process_data_parallel():
    coord = f"localhost:{_free_port()}"
    env = {k: v for k, v in os.environ.items() if k != "XLA_FLAGS"}
    procs = [
        subprocess.Popen([sys.executable, WORKER, coord, "2", str(pid)],
                         stdout=subprocess.PIPE, stderr=subprocess.PIPE,
                         env=env, text=True)
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        out, err = p.communicate(timeout=240)
        assert p.returncode == 0, f"worker failed:\n{err[-2000:]}"
        line = [l for l in out.splitlines() if l.startswith("{")][-1]
        outs.append(json.loads(line))

    a, b = outs
    # equal step counts (unequal __len__ would deadlock SPMD collectives)
    assert a["n_batches"] == b["n_batches"] == 3
    # disjoint shards covering the dataset
    assert set(a["local_indices"]).isdisjoint(b["local_indices"])
    assert sorted(a["local_indices"] + b["local_indices"]) == list(range(10))
    # the eval gather reconstructs the full split on every process
    assert a["gathered_idx"] == b["gathered_idx"] == list(range(10))
    # global reductions agree across processes (single-controller semantics)
    assert a["psums"] == b["psums"]
    # oracle: global batch sums over the interleaved order
    assert a["psums"] == [6.0, 22.0, 34.0]
