"""Emit a synthetic reference-schema checkpoint (``{net}_state_dict`` keys,
lib/utils/checkpoint.py:27-30) from the torch mirror models — the reference
repo ships no released checkpoints (BASELINE.md), so converter end-to-end
runs are validated against these.

Usage:
  python tools/make_synth_ref_ckpt.py --model_cfg_path configs/rdfc_gan_tiny.yaml \
      --out /tmp/synth_ref.pth [--num_classes 14] [--nlspn]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def build_torch_nets(cfg, num_classes: int = 14):
    """Build the six reference nets as torch mirrors sized per the model cfg.
    Returns {net_key: nn.Module}."""
    import torch_ref_models as trm

    g = dict(cfg.model.G_A2B.to_dict())
    nlspn_cfg = g.get("nlspn_configs") or None
    g_a2b = trm.TorchRDFGenerator(
        semantic_channels_in=g.get("semantic_channels_in", 3),
        rgb_channels_encoder=g.get("rgb_channels_encoder",
                                   (64, 64, 128, 256, 512, 512)),
        depth_channels_encoder=g.get("depth_channels_encoder",
                                     (64, 64, 128, 256, 512, 512)),
        rgb_channels_decoder=g.get("rgb_channels_decoder",
                                   (256, 128, 64, 64)),
        depth_channels_decoder=g.get("depth_channels_decoder",
                                     (256, 128, 64, 64)),
        adain_weighting=g.get("adain_weighting", False),
        use_nlspn_refine=g.get("use_nlspn_refine", False),
        nlspn_configs=nlspn_cfg,
        encoder_type=g.get("encoder_rgb", "resnet18"))

    b = dict(cfg.model.G_B2A.to_dict())
    g_b2a = trm.TorchResnetGenerator(
        in_ch=b.get("input_channels", 1), out_ch=b.get("output_channels", 3),
        ngf=b.get("ngf", 64), n_blocks=b.get("n_blocks", 6))

    def patchgan(key):
        d = dict(cfg.model.get(key, {}))
        return trm.TorchPatchGAN(
            in_channels=d.get("in_channels", 1),
            out_channels=d.get("out_channels", (64, 128, 256, 512, 1)),
            kernel_size=d.get("kernel_size", (4,) * 5),
            stride=d.get("stride", (2, 2, 2, 1, 1)),
            padding=d.get("padding", (1,) * 5))

    n = dict(cfg.model.get("Normal_G", {}))
    g_normal = trm.TorchNNET(
        out_height=cfg.get("out_height", 224),
        out_width=cfg.get("out_width", 304),
        width=n.get("width", 1.6), depth=n.get("depth", 2.2))

    lbl = dict(cfg.model.get("Label_G", {}))
    g_label = trm.TorchPSPNet(
        num_classes=num_classes,
        planes=lbl.get("planes", (64, 128, 256, 512)),
        stem=lbl.get("stem_features", 64))

    return {"G_A2B": g_a2b, "G_B2A": g_b2a, "disc_A": patchgan("D_A"),
            "disc_B": patchgan("D_B"), "G_normal": g_normal,
            "G_label": g_label}


def randomize(nets, seed: int = 0):
    import torch

    gen = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for net in nets.values():
            for name, p in net.named_parameters():
                if name.endswith((".w", ".b", ".w_conf")):
                    continue  # frozen NLSPN dummies stay identity
                p.copy_(torch.empty_like(p).uniform_(-0.1, 0.1,
                                                     generator=gen))
            for m in net.modules():
                if isinstance(m, torch.nn.BatchNorm2d):
                    m.running_mean.copy_(torch.empty_like(
                        m.running_mean).uniform_(-0.3, 0.3, generator=gen))
                    m.running_var.copy_(torch.empty_like(
                        m.running_var).uniform_(0.5, 1.5, generator=gen))


def make_ckpt(cfg, out_path: str, num_classes: int = 14, seed: int = 0):
    import torch

    nets = build_torch_nets(cfg, num_classes)
    randomize(nets, seed)
    ckpt = {f"{k}_state_dict": net.state_dict() for k, net in nets.items()}
    ckpt["meta"] = {"epoch": 0, "batch_size": 4, "gpus": 1}
    torch.save(ckpt, out_path)
    return nets


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--model_cfg_path", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--num_classes", type=int, default=14)
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args()

    from rdfc_gan_tpu.config import default_config, load_config

    cfg = default_config()
    load_config(cfg, args.model_cfg_path)
    make_ckpt(cfg, args.out, args.num_classes, args.seed)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
