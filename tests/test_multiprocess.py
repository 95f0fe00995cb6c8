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


@pytest.mark.slow
def test_four_process_data_parallel():
    """4 processes (VERDICT r2 item #8): exercises the loader's
    make_array_from_process_local_data branch (loader.py:119-124) at a
    process count where host-local rows are a strict subset of the global
    batch, including a padded final batch (drop_last=False)."""
    coord = f"localhost:{_free_port()}"
    env = {k: v for k, v in os.environ.items() if k != "XLA_FLAGS"}
    procs = [
        subprocess.Popen([sys.executable, WORKER, coord, "4", str(pid), "12"],
                         stdout=subprocess.PIPE, stderr=subprocess.PIPE,
                         env=env, text=True)
        for pid in range(4)
    ]
    outs = []
    for p in procs:
        out, err = p.communicate(timeout=360)
        assert p.returncode == 0, f"worker failed:\n{err[-2000:]}"
        line = [l for l in out.splitlines() if l.startswith("{")][-1]
        outs.append(json.loads(line))

    all_local = [i for o in outs for i in o["local_indices"]]
    assert sorted(all_local) == list(range(12))  # disjoint cover
    for o in outs:
        assert o["n_batches"] == 2
        assert o["gathered_idx"] == list(range(12))
        assert o["psums"] == outs[0]["psums"]
    # oracle: batch0 = rows 0,4 | 1,5 | 2,6 | 3,7 -> 28; batch1 = the padded
    # tail rows 8,8 | 9,9 | 10,10 | 11,11 -> 76 (pad rows repeat the value)
    assert outs[0]["psums"] == [28.0, 76.0]
