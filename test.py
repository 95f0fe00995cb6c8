"""Evaluation driver — parity with RDFC-GAN/test.py:1-92.

Loads a checkpoint, runs the val split through forward_test, prints the
metric suite. ``--cal_fps`` additionally runs the FPS harness the v1 driver
ships (RDF-GAN/lib/tools/main.py:318-350): 300 images, 5 warmup, device-sync
bracketed — ``block_until_ready`` replaces cuda.synchronize.
"""

from __future__ import annotations

import sys
import time

import jax
import numpy as np

from rdfc_gan_tpu.cli import parse_config
from rdfc_gan_tpu.data import DataLoader
from rdfc_gan_tpu.engines import build_engine
from rdfc_gan_tpu.evaluator import Eval
from rdfc_gan_tpu.parallel import data_sharding, make_mesh, replicate_state
from rdfc_gan_tpu.registry import build_dataset
from rdfc_gan_tpu.utils import Logger, set_random_seed
from rdfc_gan_tpu.utils.checkpoint import load_checkpoint


def cal_fps(engine, state, loader, n_images: int = 300, warmup: int = 5,
            logger=None, depth_only: bool = False):
    it = iter(loader)
    batch = next(it)
    from rdfc_gan_tpu.utils.sync import hard_sync

    for _ in range(warmup):
        ret = engine.forward_test(state, rgb=batch["rgb"],
                                  raw_depth=batch["raw_depth"],
                                  depth_only=depth_only)
        hard_sync(ret)
    done = 0
    t0 = time.perf_counter()
    while done < n_images:
        try:
            batch = next(it)
        except StopIteration:
            it = iter(loader)
            batch = next(it)
        ret = engine.forward_test(state, rgb=batch["rgb"],
                                  raw_depth=batch["raw_depth"],
                                  depth_only=depth_only)
        hard_sync(ret)
        done += batch["rgb"].shape[0]
    dt = time.perf_counter() - t0
    fps = done / dt
    (logger.log if logger else print)(f"FPS: {fps:.2f} ({done} imgs in {dt:.2f}s)")
    return fps


def main(argv=None):
    cfg = parse_config(argv)
    from rdfc_gan_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()
    set_random_seed(cfg.seed)
    logger = Logger(cfg.work_dir)
    mesh = make_mesh(cfg.get("mesh_shape"))
    sh = data_sharding(mesh)

    common = dict(num_classes=cfg.num_classes, seed=cfg.seed)
    ds_kwargs = dict(data_root=cfg.data_root, **common)
    if cfg.dataset == "synthetic":
        ds_kwargs = dict(height=cfg.out_height, width=cfg.out_width, **common)
    val_ds = build_dataset(dict(type=cfg.dataset, mode="val", **ds_kwargs))
    # reference test.py:66 asserts batch_size == 1; batched eval is allowed
    # here (static shapes make it free), but default mirrors the contract.
    # shard the eval batch only when it divides the mesh (the reference
    # asserts batch_size==1 on one GPU, test.py:66; here any batch works —
    # non-divisible batches just stay host-placed / device-0)
    shardable = (mesh.devices.size > 1
                 and cfg.batch_size % mesh.devices.size == 0)
    loader = DataLoader(val_ds, cfg.batch_size, shuffle=False, drop_last=False,
                        sharding=sh if shardable else None,
                        with_indices=True)

    engine = build_engine(cfg, is_train=False)
    sample = next(iter(loader))
    state = engine.init_state(jax.random.PRNGKey(cfg.seed), sample)
    state = replicate_state(state, mesh)
    if cfg.load_from:
        state, meta = load_checkpoint(state, cfg.load_from)
        logger.log(f"loaded {cfg.load_from} (epoch {meta.get('epoch')})")
        # stencil-exactness guard: trained/converted offsets may exceed the
        # clamp radius — escalate R or fall back to gather (VERDICT #6)
        from rdfc_gan_tpu.ops.nlspn_guard import (escalate_nlspn_cfg,
                                                  probe_max_offset)

        g_node = cfg.model.get("G_A2B") or cfg.model.get("G")
        max_off = probe_max_offset(engine, state, sample)
        g_cfg, changed = (escalate_nlspn_cfg(dict(g_node.to_dict()), max_off)
                          if g_node is not None else ({}, False))
        if changed:
            logger.log(f"NLSPN max|offset|={max_off:.2f}: rebuilding the "
                       f"generator with {g_cfg.get('nlspn_impl', 'auto')!r} "
                       f"impl, R={g_cfg.get('nlspn_offset_radius')}")
            g_node.merge(g_cfg)
            engine = build_engine(cfg, is_train=False)

    depth_only = bool(cfg.get("depth_only", False))
    if cfg.cal_fps:
        cal_fps(engine, state, loader, logger=logger, depth_only=depth_only)
        return 0

    Eval(loader, depth_only=depth_only).evaluate(engine, state, logger)
    return 0


if __name__ == "__main__":
    sys.exit(main())
