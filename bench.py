"""Benchmark harness — prints ONE JSON line for the round driver.

Measures flagship RDFC-GAN *training* throughput (images/sec/chip) on the
real device: full RDFCGAN train step (6 nets, 4 optimizers) at the
reference's training shape (224x304, batch 4/chip — config.py:19-28).

vs_baseline: the reference repo publishes no numbers (BASELINE.md); the
denominator is the BASELINE.json north-star proxy — an estimated 8 img/s
V100 training throughput for this model family at bs4 (PyTorch 1.6 era).
The north-star target is vs_baseline >= 5.

Round-3 state: ~31.3 img/s/chip (vs_baseline ~3.9) with the W-packed
(exact space-to-depth along W, ops/packed.py) full-res stages of
G_A2B/G_B2A/both discriminators, exact G_B2A path-batching, fused
stems/heads, and remat OFF (bs8 bf16 fits in v5e HBM since the r2
BatchNorm/fused-head memory work; recomputing G_normal/G_label forwards
cost ~15 ms/step of repeated HBM traffic). The step is memory-bound at
~95% of its own bandwidth floor; the byte attribution and layout story is
in docs/PERF_NOTES.md.
"""

from __future__ import annotations

import json
import time

V100_TRAIN_IMGS_PER_SEC_ESTIMATE = 8.0


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from rdfc_gan_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()

    from __graft_entry__ import _flagship_cfg, _synth_batch
    from rdfc_gan_tpu.engines import build_engine

    cfg = _flagship_cfg()
    batch_size = 8  # step time is launch-overhead-bound; bs8 ~doubles img/s
    cfg.merge(dict(batch_size=batch_size))
    # bs8 bf16 fits with no remat; selective remat re-runs the G_normal /
    # G_label forwards in the backward (~15 ms of extra HBM traffic).
    cfg.merge(dict(remat=False))
    engine = build_engine(cfg, is_train=True, steps_per_epoch=100)

    batch = jax.tree.map(jnp.asarray, _synth_batch(cfg, batch_size))
    rng = jax.random.PRNGKey(0)

    from rdfc_gan_tpu.utils.sync import hard_sync

    # warmup / compile (hard_sync: block_until_ready is unreliable on
    # tunneled PJRT backends — force a host readback instead). init_state
    # is inside the guard too: it jit-runs the train-mode forward, which
    # already dispatches the optional Pallas kernels.
    try:
        state = engine.init_state(rng, batch)
        state, stats = engine.train_step(state, batch, rng)
        hard_sync(state.params)
    except Exception as e:
        # never lose the round's bench artifact to an optional-kernel
        # lowering failure: disable the Pallas fast paths and rebuild
        import os
        import sys

        print(f"[bench] first step failed ({type(e).__name__}: {e}); "
              f"retrying with Pallas fast paths disabled", file=sys.stderr)
        os.environ["RDFC_DISABLE_PALLAS_NLSPN_BWD"] = "1"
        engine = build_engine(cfg, is_train=True, steps_per_epoch=100)
        state = engine.init_state(rng, batch)
        state, stats = engine.train_step(state, batch, rng)
        hard_sync(state.params)

    iters = 20
    t0 = time.perf_counter()
    for i in range(iters):
        state, stats = engine.train_step(state, batch,
                                         jax.random.fold_in(rng, i))
    hard_sync(state.params)  # state chains through every step
    dt = time.perf_counter() - t0

    n_chips = jax.local_device_count()
    imgs_per_sec_per_chip = iters * batch_size / dt / max(n_chips, 1)

    # secondary metric (stderr): inference FPS, the reference's own harness
    import sys

    try:
        fwd = jax.jit(lambda p, s, r, d: engine._forward_test_impl(p, s, r, d))
        out = fwd(state.params, state.batch_stats, batch["rgb"],
                  batch["raw_depth"])
        hard_sync(out)
        t0 = time.perf_counter()
        for _ in range(20):
            out = fwd(state.params, state.batch_stats, batch["rgb"],
                      batch["raw_depth"])
            hard_sync(out)  # per-call readback = deployment semantics
        infer_fps = 20 * batch_size / (time.perf_counter() - t0)
        print(f"[aux] infer_fps={infer_fps:.1f} img/s (bs{batch_size})",
              file=sys.stderr)
    except Exception as e:  # pragma: no cover
        print(f"[aux] infer bench failed: {e}", file=sys.stderr)

    # self-describing artifact (VERDICT r3 #1): record which optional fast
    # paths were ACTIVE for this measurement so the driver JSON and the
    # README claims can be reconciled without re-running. Defaults follow
    # the round-4/5 chip A/Bs (PERF_AB.jsonl): the outres VJPs are OFF
    # (neutral on chip); the Pallas IN and fused-block kernels are
    # retired entirely (attic/).
    import os

    from rdfc_gan_tpu.models.layers import _outres_vjp_disabled

    fast_paths = {
        "outres_vjp_bn": not _outres_vjp_disabled("bn"),
        "outres_vjp_in": not _outres_vjp_disabled("in"),
        "w_packed": True,  # YAML-default packed set (ops/packed.py)
        # NLSPN Pallas backward (r4: 331.0 -> 305.6 ms on the NLSPN
        # config); inert here unless use_nlspn_refine is on
        "nlspn_pallas_bwd": not os.environ.get(
            "RDFC_DISABLE_PALLAS_NLSPN_BWD"),
        "remat": cfg.remat,
        "batch": batch_size,
    }
    print(json.dumps({
        "metric": "train_imgs_per_sec_per_chip",
        "value": round(imgs_per_sec_per_chip, 3),
        "unit": "img/s/chip",
        "vs_baseline": round(
            imgs_per_sec_per_chip / V100_TRAIN_IMGS_PER_SEC_ESTIMATE, 3),
        "fast_paths": fast_paths,
    }))


if __name__ == "__main__":
    main()
