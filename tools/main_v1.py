"""v1 (RDF-GAN) train/eval/FPS driver.

Parity target: RDF-GAN/lib/tools/main.py:25-653 — monolithic driver with
  * DCVGANGenerator (+ ESANet guidance) + PatchGAN discriminator,
  * D-first-then-G updates with ``--n_critic`` (G updated every n_critic
    steps, main.py:492-575),
  * wgan weight clipping / wgan-gp gradient penalty,
  * ``--warm_up`` LR ramp over warm_up_steps epochs,
  * ``--inference``: evaluate a checkpoint and exit,
  * ``--cal_fps``: 300-image FPS bench, 5 warmup, device-sync bracketed.

Built on the framework's RDFGAN engine (same loss family) with the v1
generator config and the v1 evaluator (resize-back to origin resolution).
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import numpy as np


def build_parser():
    p = argparse.ArgumentParser("rdf-gan v1 driver")
    add = p.add_argument
    add("--dataset", default="nyuv2_s2d",
        choices=["nyuv2_s2d", "nyuv2", "sunrgbd", "ddrnet_human", "synthetic"])
    add("--data_root", default=None)
    add("--height", type=int, default=None)
    add("--width", type=int, default=None)
    add("--num_classes", type=int, default=40)
    add("--batch_size", type=int, default=4)
    add("--lr", type=float, default=2e-3)
    add("--beta1", type=float, default=0.5)
    add("--beta2", type=float, default=0.999)
    add("--n_epochs", type=int, default=150)
    add("--optimizer", default="Adam")
    add("--scheduler", default="linear",
        choices=["linear", "step", "cosine", "onecycle", "lambda"])
    add("--decay_epoch", type=int, default=100)
    # scheduler zoo knobs (RDF-GAN/lib/tools/main.py:251-294)
    add("--lr_decay_epochs", type=int, nargs="+", default=[60, 90, 120])
    add("--lr_decay_rate", type=float, default=0.1)
    add("--div_factor", type=float, default=25.0)
    add("--pct_start", type=float, default=0.3)
    add("--t_max", type=int, default=None)
    add("--lambda_lr_decay", type=int, nargs="+", default=[30, 60, 90])
    add("--lambda_lr_gamma", type=float, nargs="+", default=[1.0, 0.5, 0.1])
    add("--gan_loss_type", default="lsgan",
        choices=["lsgan", "vanilla", "wgan", "wgangp"])
    add("--n_critic", type=int, default=1)
    add("--wgan_clip_value", type=float, default=0.01)
    add("--warm_up", action="store_true")
    add("--warm_up_lr", type=float, default=1e-6)
    add("--warm_up_steps", type=int, default=1)
    # v1 guidance / NLSPN knobs (RDF-GAN/lib/tools/config.py)
    add("--use_guidance", action="store_true", default=False)
    add("--guidance_classes", type=int, default=40)
    add("--guidance_encoder", default="resnet18")
    add("--guidance_encoder_block", default="BasicBlock")
    add("--guidance_channels_decoder", type=int, nargs="+",
        default=[128, 128, 128])
    add("--guidance_nr_decoder_blocks", type=int, nargs="+",
        default=[1, 1, 1])
    add("--guidance_encoder_decoder_fusion", default="add")
    add("--guidance_context_module", default="ppm")
    add("--guidance_weighting_in_encoder", default="SE-add")
    add("--guidance_upsampling", default="learned-3x3-zeropad")
    add("--guidance_pretrained_dir", default=None)
    add("--semantic_channels_in", type=int, default=3)
    add("--encoder_rgb", default="resnet18")
    add("--encoder_depth", default="resnet18")
    add("--encoder_block", default="BasicBlock")
    add("--rgb_channels_encoder", type=int, nargs="+",
        default=[64, 64, 128, 256, 512, 512])
    add("--depth_channels_encoder", type=int, nargs="+",
        default=[64, 64, 128, 256, 512, 512])
    add("--rgb_channels_decoder", type=int, nargs="+",
        default=[256, 128, 64, 64])
    add("--depth_channels_decoder", type=int, nargs="+",
        default=[256, 128, 64, 64])
    add("--rgb_encoder_decoder_fusion", default="concat")
    add("--depth_encoder_decoder_fusion", default="concat")
    add("--activation", default="LeakyReLU")
    add("--norm_layer_type", default="IN2d")
    add("--use_nlspn_to_refine", action="store_true", default=False)
    add("--prop_kernel", type=int, default=3)
    add("--prop_time", type=int, default=18)
    add("--affinity", default="TGASS", choices=["AS", "ASS", "TC", "TGASS"])
    add("--affinity_gamma", type=float, default=0.5)
    add("--conf_prop", action="store_true", default=True)
    add("--no_conf", action="store_true", default=False)
    add("--preserve_input", action="store_true", default=False)
    add("--disc_norm_type", default="BN2d")
    add("--disc_act_type", default="LeakyReLU")
    # the reference parses but never uses the l2 coefs and the
    # encoder-decoder warm-start flags (main.py:558-563 uses l1 only; the
    # load_encoder_decoder path is commented out, main.py:48) — accepted
    # here for recipe compatibility
    add("--use_pretrained_encoder_decoder", action="store_true")
    add("--load_encoder_decoder_path", default=None)
    add("--freeze_encoder_decoder", action="store_true")
    add("--rgb_branch_l2_loss_coef", type=float, default=0.0)
    add("--depth_branch_l2_loss_coef", type=float, default=0.0)
    add("--final_l2_loss_coef", type=float, default=0.0)
    add("--generator_l1_loss_coef", type=float, default=1.0)
    add("--momentum", type=float, default=0.9)
    add("--weight_decay", type=float, default=0.0)
    add("--repeat_times", type=int, default=20)
    add("--num_workers", type=int, default=8)
    add("--pretrained_on_imagenet", action="store_true", default=False)
    add("--pretrained_resnet_path", default=None)
    add("--init_disc", action="store_true", default=False)
    add("--sample_interval", type=int, default=1000)
    add("--sample_dir", default="./")
    add("--gpus", default="0")  # accepted for recipe parity; JAX-managed
    add("--start_epoch", type=int, default=0)
    # reference aliases
    add("--max_epoch", type=int, default=None,
        help="alias of --n_epochs (reference name)")
    add("--learning_rate", type=float, default=None,
        help="alias of --lr (reference name)")
    add("--rgb_branch_l1_loss_coef", type=float, default=None,
        help="alias of --lambda_l1_rgb_branch")
    add("--depth_branch_l1_loss_coef", type=float, default=None,
        help="alias of --lambda_l1_depth_branch")
    add("--final_l1_loss_coef", type=float, default=None,
        help="alias of --lambda_l1_fusion")
    add("--lambda_l1_rgb_branch", type=float, default=100.0)
    add("--lambda_l1_depth_branch", type=float, default=100.0)
    add("--lambda_l1_fusion", type=float, default=100.0)
    add("--work_dir", required=True)
    add("--load_from", default=None)
    add("--resume_from", default=None)
    add("--log_interval", type=int, default=30)
    add("--save_interval", type=int, default=10)
    add("--val_interval", type=int, default=1)
    add("--seed", type=int, default=0)
    add("--inference", action="store_true")
    add("--cal_fps", action="store_true")
    # --model vanilla drives the *_vanilla generator build (the reference's
    # missing main_vanilla.py driver contract, bash/test_nyuv2_Rs2T.sh:4)
    add("--model", default="guided", choices=["guided", "vanilla"])
    add("--upsampling_mode", default="bilinear")
    add("--nr_decoder_blocks", type=int, nargs="+", default=[1, 1, 1, 0, 0])
    add("--fuse_depth_in_rgb_decoder", default="AdaIN")
    add("--adain_weighting", action="store_true", default=False)
    return p


def make_cfg(args):
    from rdfc_gan_tpu.config import default_config

    # resolve reference-name aliases
    if args.max_epoch is not None:
        args.n_epochs = args.max_epoch
    if args.learning_rate is not None:
        args.lr = args.learning_rate
    if args.rgb_branch_l1_loss_coef is not None:
        args.lambda_l1_rgb_branch = args.rgb_branch_l1_loss_coef
    if args.depth_branch_l1_loss_coef is not None:
        args.lambda_l1_depth_branch = args.depth_branch_l1_loss_coef
    if args.final_l1_loss_coef is not None:
        args.lambda_l1_fusion = args.final_l1_loss_coef
    if args.no_conf:
        args.conf_prop = False

    cfg = default_config()
    cfg.merge(vars(args))
    if args.model == "vanilla":
        g_cfg = {
            "type": "DCVGANGeneratorVanilla",
            "use_guidance": args.use_guidance,
            "guidance_classes": args.guidance_classes,
            "nr_decoder_blocks": list(args.nr_decoder_blocks),
            "fuse_depth_in_rgb_decoder": args.fuse_depth_in_rgb_decoder,
            "upsampling_mode": args.upsampling_mode,
            "adain_weighting": args.adain_weighting,
        }
    else:
        g_cfg = {
            "type": "DCVGANGenerator",
            "use_guidance": args.use_guidance,
            "guidance_classes": args.guidance_classes,
            "guidance_encoder": args.guidance_encoder,
            "guidance_channels_decoder": list(args.guidance_channels_decoder),
            "guidance_nr_decoder_blocks": list(args.guidance_nr_decoder_blocks),
            "guidance_encoder_decoder_fusion":
                args.guidance_encoder_decoder_fusion,
            "guidance_context_module": args.guidance_context_module,
            "guidance_weighting_in_encoder":
                args.guidance_weighting_in_encoder,
            "guidance_upsampling": args.guidance_upsampling,
            "encoder_rgb": args.encoder_rgb,
            "encoder_depth": args.encoder_depth,
            "rgb_channels_encoder": list(args.rgb_channels_encoder),
            "depth_channels_encoder": list(args.depth_channels_encoder),
            "rgb_channels_decoder": list(args.rgb_channels_decoder),
            "depth_channels_decoder": list(args.depth_channels_decoder),
            "fuse_depth_in_rgb_decoder": args.fuse_depth_in_rgb_decoder,
            "adain_weighting": args.adain_weighting,
            # reference default: NLSPNIdentity unless --use_nlspn_to_refine
            # (the shipped bash recipes all pass it)
            "use_nlspn_refine": args.use_nlspn_to_refine,
            "nlspn_configs": {
                "prop_kernel": args.prop_kernel,
                "prop_time": args.prop_time,
                "affinity": args.affinity,
                "affinity_gamma": args.affinity_gamma,
                "conf_prop": args.conf_prop,
                "preserve_input": args.preserve_input,
            },
        }
    cfg.merge({
        "model": {
            "type": "RDFGAN",
            "G": g_cfg,
            "D": {"type": "PatchGANDiscriminator", "in_channels": 1,
                  "activation": "LeakyReLU"},
        }
    })
    return cfg


def main(argv=None):
    args = build_parser().parse_args(argv)
    cfg = make_cfg(args)

    from rdfc_gan_tpu.data import DataLoader
    from rdfc_gan_tpu.engines import build_engine
    from rdfc_gan_tpu.evaluator.v1_evaluator import EvalV1
    from rdfc_gan_tpu.registry import build_dataset
    from rdfc_gan_tpu.utils import Logger, MovingAverage, set_random_seed
    from rdfc_gan_tpu.utils.checkpoint import (load_checkpoint, resume_from,
                                               save_checkpoint)

    root_key = set_random_seed(cfg.seed)
    logger = Logger(cfg.work_dir)

    ds_kwargs = dict(seed=cfg.seed)
    if cfg.data_root:
        ds_kwargs["data_root"] = cfg.data_root
    if cfg.dataset == "synthetic":
        ds_kwargs.update(height=args.height or 32, width=args.width or 32,
                         num_classes=args.num_classes)
    if cfg.dataset == "ddrnet_human":
        ds_kwargs["times"] = args.repeat_times
    train_ds = build_dataset(dict(type=cfg.dataset, mode="train", **ds_kwargs))
    val_ds = build_dataset(dict(type=cfg.dataset, mode="val", **ds_kwargs))
    train_loader = DataLoader(train_ds, cfg.batch_size, seed=cfg.seed)
    val_loader = DataLoader(val_ds, cfg.batch_size, shuffle=False,
                            drop_last=False)

    engine = build_engine(cfg, is_train=not (args.inference or args.cal_fps),
                          steps_per_epoch=max(len(train_loader), 1))
    import jax.numpy as jnp

    sample = jax.tree.map(jnp.asarray, next(iter(val_loader)))
    state = engine.init_state(root_key, sample)

    start_epoch = 0
    if cfg.resume_from:
        state, start_epoch = resume_from(state, cfg.resume_from)
    elif cfg.load_from:
        state, _ = load_checkpoint(state, cfg.load_from)

    evaluator = EvalV1(val_loader)

    if args.cal_fps:
        # 300 imgs, 5 warmup, device-sync bracketed (main.py:318-350)
        it = iter(val_loader)
        batch = jax.tree.map(jnp.asarray, next(it))
        from rdfc_gan_tpu.utils.sync import hard_sync

        for _ in range(5):
            hard_sync(engine.forward_test(
                state, rgb=batch["rgb"], raw_depth=batch["raw_depth"]))
        done, t0 = 0, time.perf_counter()
        while done < 300:
            try:
                batch = jax.tree.map(jnp.asarray, next(it))
            except StopIteration:
                it = iter(val_loader)
                continue
            hard_sync(engine.forward_test(
                state, rgb=batch["rgb"], raw_depth=batch["raw_depth"]))
            done += batch["rgb"].shape[0]
        fps = done / (time.perf_counter() - t0)
        logger.log(f"FPS: {fps:.2f}")
        return 0

    if args.inference:
        evaluator.evaluate(engine, state, logger)
        return 0

    avg = MovingAverage(cfg.log_interval)
    pending_stats = []
    it = 0
    for epoch in range(start_epoch, cfg.n_epochs):
        train_loader.set_epoch(epoch)
        for i, batch in enumerate(train_loader):
            batch = jax.tree.map(jnp.asarray, batch)
            update_g = (it % max(args.n_critic, 1)) == 0
            state, stats = engine.train_step(
                state, batch, jax.random.fold_in(root_key, it),
                update_g=update_g)
            it += 1
            # batched readback at the log boundary (one transfer per
            # window, not one RTT per scalar per step — see train.py)
            pending_stats.append(stats)
            if it % cfg.log_interval == 0:
                for s in jax.device_get(pending_stats):
                    avg.update(s)
                pending_stats.clear()
                msg = " ".join(f"{k}={v:.4f}" for k, v in
                               sorted(avg.mean().items()))
                logger.log(f"epoch {epoch} iter {i} {msg}")
        if (epoch + 1) % cfg.save_interval == 0:
            save_checkpoint(state,
                            os.path.join(cfg.work_dir, f"epoch_{epoch+1}.ckpt"),
                            meta=dict(epoch=epoch + 1))
        if (epoch + 1) % cfg.val_interval == 0:
            evaluator.evaluate(engine, state, logger)
    return 0


if __name__ == "__main__":
    sys.exit(main())
