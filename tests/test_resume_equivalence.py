"""Protocol-level resume equivalence (VERDICT r4 #6).

Train 2N epochs straight vs N epochs + ``--resume_from`` + N more, through
the REAL train.py driver (loader shuffling, per-step fold_in RNG, scheduler
state in the checkpoint), and require the final checkpoints to be
BIT-IDENTICAL — stronger than the reference's contract, where
``resume_from`` restores weights/optimizers/schedulers and returns the
start epoch (lib/utils/checkpoint.py:138-168) but nothing guarantees the
resumed trajectory matches an uninterrupted one (torch's global RNG stream
is not reconstructed).

Here it is exact by design: root_key = f(seed); per-step key =
fold_in(root_key, global_step) with global_step continuing from
start_epoch * steps_per_epoch; loader order = f(seed, epoch); optax
schedule counts ride inside the checkpointed state.

The full-length (150-epoch envelope) and real-data variants run in
tools/endurance_protocol.py; this test is the fast in-suite guard.
"""

import os
import sys

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

N = 1  # resume A/B: 2N straight vs N + resume + N


def _payload(path):
    """Checkpoint bytes past the magic+meta header (the flax msgpack
    serialization of the full GANTrainState pytree)."""
    with open(path, "rb") as f:
        f.read(8)
        hlen = int.from_bytes(f.read(8), "little")
        f.read(hlen)
        return f.read()


def _train(tmp_path, name, n_epochs, save_interval, resume_from=None):
    import train as train_driver

    work = str(tmp_path / name)
    argv = [
        "--dataset", "synthetic", "--data_root", "unused",
        "--model_cfg_path", "configs/rdfc_gan_tiny.yaml",
        "--work_dir", work, "--batch_size", "2",
        "--n_epochs", str(n_epochs), "--num_classes", "5",
        "--out_height", "32", "--out_width", "32",
        "--seed", "11", "--log_interval", "1000",
        "--sample_interval", "1000000", "--val_interval", "1000",
        "--save_interval", str(save_interval), "--num_workers", "0",
    ]
    if resume_from:
        argv += ["--resume_from", resume_from]
    assert train_driver.main(argv) == 0
    return os.path.join(work, f"epoch_{n_epochs}.ckpt")


@pytest.mark.slow
def test_resume_equivalence_bitwise(tmp_path):
    ck_straight = _train(tmp_path, "straight", 2 * N, save_interval=2 * N)
    ck_half = _train(tmp_path, "half", N, save_interval=N)
    ck_resumed = _train(tmp_path, "resumed", 2 * N, save_interval=2 * N,
                        resume_from=ck_half)

    a, b = _payload(ck_straight), _payload(ck_resumed)
    if a != b:  # diagnose before failing: where does the state diverge?
        import jax
        import numpy as np
        from flax import serialization

        ta = serialization.msgpack_restore(a)
        tb = serialization.msgpack_restore(b)
        diffs = []
        for (ka, va), (_, vb) in zip(
                jax.tree_util.tree_leaves_with_path(ta),
                jax.tree_util.tree_leaves_with_path(tb)):
            va, vb = np.asarray(va), np.asarray(vb)
            if va.shape != vb.shape or not np.array_equal(va, vb):
                d = float(np.max(np.abs(
                    va.astype(np.float64) - vb.astype(np.float64)))) \
                    if va.shape == vb.shape else float("nan")
                diffs.append((jax.tree_util.keystr(ka), d))
        assert not diffs, (
            f"{len(diffs)} leaves differ after resume; worst: "
            f"{sorted(diffs, key=lambda t: -t[1])[:5]}")
