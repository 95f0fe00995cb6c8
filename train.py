"""Training driver — parity with RDFC-GAN/train.py:1-189.

Flow: parse config (defaults <- YAML <- CLI), seed, build loaders, cache two
fixed vis batches, build engine, optional load/resume, dump merged config to
work_dir, then the epoch loop: train_step per batch, moving-average logging
every log_interval, sample dumps every sample_interval, rank-0 checkpoint
every save_interval epochs, eval every val_interval with best.pth tracking on
min RMSE (criterion_to_get_best_ckpt).

TPU deltas: the NCCL init / DDP wrapping / LOCAL_RANK plumbing is replaced by
a jax Mesh; batches are placed with a NamedSharding and XLA handles every
collective. LR scheduling lives inside the optimizer schedule (per-epoch
factor), so there is no explicit update_learning_rate call.
"""

from __future__ import annotations

import os
import sys
import time

import jax
import numpy as np

from rdfc_gan_tpu.cli import parse_config
from rdfc_gan_tpu.config import dump_config
from rdfc_gan_tpu.data import DataLoader
from rdfc_gan_tpu.engines import build_engine
from rdfc_gan_tpu.evaluator import Eval
from rdfc_gan_tpu.parallel import make_mesh, replicate_state, shard_batch
from rdfc_gan_tpu.registry import build_dataset
from rdfc_gan_tpu.utils import Logger, MovingAverage, set_random_seed
from rdfc_gan_tpu.utils.checkpoint import load_checkpoint, resume_from, save_checkpoint
from rdfc_gan_tpu.utils.profiling import StepTimer, trace


def get_dataloaders(cfg, mesh):
    from rdfc_gan_tpu.parallel import data_sharding

    common = dict(num_classes=cfg.num_classes, seed=cfg.seed)
    ds_kwargs = dict(data_root=cfg.data_root, **common)
    if cfg.dataset == "synthetic":
        ds_kwargs = dict(height=cfg.out_height, width=cfg.out_width, **common)
    train_ds = build_dataset(dict(type=cfg.dataset, mode="train", **ds_kwargs))
    val_ds = build_dataset(dict(type=cfg.dataset, mode="val", **ds_kwargs))
    sh = data_sharding(mesh)
    # per-host batch: each process loads its slice of the global batch
    # (DistributedSampler analog — helper.py:217-230); single-process runs
    # load the full mesh batch.
    multi = jax.process_count() > 1
    n_local = mesh.devices.size // jax.process_count() if multi \
        else mesh.devices.size
    train_loader = DataLoader(train_ds, cfg.batch_size * n_local,
                              shuffle=True, drop_last=True, seed=cfg.seed,
                              sharding=sh, per_process=multi,
                              num_workers=cfg.num_workers,
                              worker_backend=cfg.get("loader_backend",
                                                     "thread"))
    # drop_last=False + with_indices: best-ckpt selection must see every val
    # image (reference per-image mean over the full split,
    # rdf_gan_metric.py:135-151); pad rows are masked out by Eval.
    val_loader = DataLoader(val_ds, cfg.batch_size * n_local, shuffle=False,
                            drop_last=False, seed=cfg.seed, sharding=sh,
                            with_indices=True, per_process=multi)
    return train_loader, val_loader


def main(argv=None):
    cfg = parse_config(argv)
    from rdfc_gan_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()
    root_key = set_random_seed(cfg.seed)
    logger = Logger(cfg.work_dir)
    logger.log(f"devices: {jax.devices()}")

    mesh = make_mesh(cfg.get("mesh_shape"))
    train_loader, val_loader = get_dataloaders(cfg, mesh)
    logger.log(f"train batches/epoch: {len(train_loader)}")

    engine = build_engine(cfg, is_train=True,
                          steps_per_epoch=len(train_loader))

    sample_batch = next(iter(train_loader))
    # fixed train + test vis batches (RDFC-GAN/train.py:53-77): sample grids
    # are dumped for BOTH splits every sample_interval
    vis_batches = {"train": sample_batch, "test": next(iter(val_loader))}
    state = engine.init_state(root_key, sample_batch)
    state = replicate_state(state, mesh)

    start_epoch = cfg.epoch
    if cfg.resume_from:
        state, start_epoch = resume_from(state, cfg.resume_from)
        logger.log(f"resumed from {cfg.resume_from} at epoch {start_epoch}")
    elif cfg.load_from:
        state, meta = load_checkpoint(state, cfg.load_from)
        logger.log(f"loaded {cfg.load_from} (epoch {meta.get('epoch')})")

    os.makedirs(cfg.work_dir, exist_ok=True)
    dump_config(cfg, os.path.join(cfg.work_dir, "config.yaml"))

    evaluator = Eval(val_loader)
    avg = MovingAverage(window=cfg.log_interval)
    pending_stats = []
    minimize = cfg.criterion_to_get_best_ckpt in ("RMSE", "MAE", "iRMSE",
                                                  "iMAE", "REL")
    best = float("inf") if minimize else float("-inf")
    # global step continues across --resume_from: the per-step RNG is
    # fold_in(root_key, it), so a resumed run replays the exact key stream
    # of an uninterrupted one (resume-equivalence, VERDICT r4 #6)
    it = start_epoch * len(train_loader)
    t0 = time.time()
    timer = StepTimer()
    profile_dir = cfg.get("profile_dir")
    for epoch in range(start_epoch, cfg.n_epochs):
        train_loader.set_epoch(epoch)
        if hasattr(train_loader.dataset, "set_epoch"):
            train_loader.dataset.set_epoch(epoch)
        for i, batch in enumerate(train_loader):
            step_key = jax.random.fold_in(root_key, it)
            with trace(profile_dir if it == 50 else None):
                state, stats = engine.train_step(state, batch, step_key)
                if it == 50 and profile_dir:
                    jax.block_until_ready(state)
            timer.tick()
            it += 1
            # Defer the stats readback: float(v) per device scalar here
            # would cost one device->host round-trip per value per step
            # (~25 RTTs/step — on a tunneled backend that, not compute,
            # bounds small-step throughput). Buffer the device trees and
            # fetch the whole window in ONE transfer at the log boundary;
            # between logs the loop enqueues steps fully async.
            pending_stats.append(stats)
            if it % cfg.log_interval == 0:
                for s in jax.device_get(pending_stats):
                    avg.update(s)
                pending_stats.clear()
                m = avg.mean()
                r = cfg.model.get("G_A2B", {}).get("nlspn_offset_radius", 2)
                if m.get("nlspn_max_offset", 0.0) > r:
                    logger.log(
                        f"WARNING: NLSPN max|offset| {m['nlspn_max_offset']:.2f}"
                        f" exceeds stencil radius {r} — training gradients are"
                        f" clamped; raise nlspn_offset_radius or set"
                        f" nlspn_impl: gather (ops/nlspn_guard.py)")
                ips = cfg.log_interval * batch["rgb"].shape[0] / (
                    time.time() - t0)
                t0 = time.time()
                msg = " ".join(f"{k}={v:.4f}" for k, v in sorted(m.items()))
                logger.log(f"epoch {epoch} iter {i} ({ips:.1f} img/s) {msg}")
                logger.add_scalars(m, it)
            if (it % cfg.sample_interval == 0 and jax.process_index() == 0
                    and hasattr(engine, "save_samples")):
                for split, vb in vis_batches.items():
                    engine.save_samples(state, vb,
                                        os.path.join(cfg.work_dir, "samples"),
                                        it, prefix=f"sample-{split}")

        if (epoch + 1) % cfg.save_interval == 0:
            save_checkpoint(state, os.path.join(cfg.work_dir,
                                                f"epoch_{epoch + 1}.ckpt"),
                            meta=dict(epoch=epoch + 1,
                                      batch_size=cfg.batch_size))

        if (epoch + 1) % cfg.val_interval == 0 and \
                (epoch + 1) >= cfg.start_eval_epoch:
            ret = evaluator.evaluate(engine, state, logger)
            crit = ret[cfg.criterion_to_get_best_ckpt]
            improved = crit < best if minimize else crit > best
            if improved:
                best = crit
                save_checkpoint(state, os.path.join(cfg.work_dir, "best.ckpt"),
                                meta=dict(epoch=epoch + 1, best=best))
                logger.log(f"new best {cfg.criterion_to_get_best_ckpt}: {best}")

    logger.close()
    return 0


if __name__ == "__main__":
    sys.exit(main())
