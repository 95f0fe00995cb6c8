"""Per-net converter output parity at PRODUCTION widths (VERDICT r3 #5).

The CI converter tests (tests/test_ckpt_convert_flagship.py) compare
torch-mirror vs converted-flax outputs at reduced widths; this one-off
runs the same comparison at the real YAML scales — EfficientNet-B5
(w=1.6, d=2.2) NNET, dilated-R50 PSPNet, the 512-channel RDFGenerator
(+NLSPN), the ngf=64 ResnetGenerator and both PatchGAN discriminators —
and prints a per-net max|delta| table for COMPONENTS.md.

CPU, eval mode, randomized weights AND BN running stats (the hard case
for converter bugs). Runtime ~minutes on a 1-core host.

    python tools/parity_full_width.py [--height 224] [--width 304]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np


def _randomize(model, rng):
    import torch

    with torch.no_grad():
        for n, p in model.named_parameters():
            if n.endswith("aff_scale_const"):
                continue
            p.uniform_(-0.15, 0.15)
        for m in model.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.uniform_(-0.5, 0.5)
                m.running_var.uniform_(0.5, 2.0)
                m.weight.uniform_(0.5, 1.5)
                m.bias.uniform_(-0.2, 0.2)


def _vars(tree):
    import jax
    import jax.numpy as jnp

    v = {"params": jax.tree.map(jnp.asarray, tree["params"])}
    if tree.get("batch_stats"):
        v["batch_stats"] = jax.tree.map(jnp.asarray, tree["batch_stats"])
    return v


def _delta(got_nhwc, want_nchw):
    got = np.asarray(got_nhwc).transpose(0, 3, 1, 2)
    d = np.max(np.abs(got - want_nchw))
    ref = np.max(np.abs(want_nchw)) + 1e-12
    return float(d), float(d / ref)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--height", type=int, default=224)
    p.add_argument("--width", type=int, default=304)
    p.add_argument("--only", default="",
                   help="comma list: nnet,pspnet,rdf,resnetgen,disc")
    args = p.parse_args()
    H, W = args.height, args.width

    # pin to CPU before any backend initializes (the axon sitecustomize
    # force-selects the tunnel backend regardless of JAX_PLATFORMS)
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_default_matmul_precision", "highest")

    import torch

    import jax.numpy as jnp
    from torch_ref_models import (TorchNNET, TorchPSPNet, TorchRDFGenerator,
                                  TorchResnetGenerator, TorchPatchGAN)

    rng = np.random.RandomState(0)
    rows = []
    wanted = set(args.only.split(",")) if args.only else None

    def on(name):
        return wanted is None or name in wanted

    if on("nnet"):
        from rdfc_gan_tpu.models.normal_net import NNET
        from rdfc_gan_tpu.utils.torch_convert import convert_nnet

        tm = TorchNNET(out_height=H, out_width=W, width=1.6, depth=2.2)
        _randomize(tm, rng)
        tm.eval()
        x = rng.normal(size=(1, 3, H, W)).astype(np.float32)
        with torch.no_grad():
            want = tm(torch.from_numpy(x)).numpy()
        sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
        fm = NNET(out_height=H, out_width=W, width=1.6, depth=2.2)
        got = fm.apply(_vars(convert_nnet(sd, width=1.6, depth=2.2)),
                       jnp.asarray(x.transpose(0, 2, 3, 1)), train=False)
        rows.append(("G_normal (B5 w1.6/d2.2 NNET)", len(sd))
                    + _delta(got, want))
        print(rows[-1], flush=True)

    if on("pspnet"):
        from rdfc_gan_tpu.models.label_net import PSPNet
        from rdfc_gan_tpu.utils.torch_convert import convert_pspnet

        tm = TorchPSPNet(num_classes=14)
        _randomize(tm, rng)
        tm.eval()
        x = rng.normal(size=(1, 3, H, W)).astype(np.float32)
        with torch.no_grad():
            want = tm(torch.from_numpy(x)).numpy()
        sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
        fm = PSPNet(num_classes=14, backbone_depth=50)
        got = fm.apply(_vars(convert_pspnet(sd)),
                       jnp.asarray(x.transpose(0, 2, 3, 1)), train=False)
        rows.append(("G_label (dilated-R50 PSPNet)", len(sd))
                    + _delta(got, want))
        print(rows[-1], flush=True)

    if on("rdf"):
        from rdfc_gan_tpu.models.rdf_generator import RDFGenerator
        from rdfc_gan_tpu.utils.torch_convert import convert_rdf_generator

        enc = (64, 64, 128, 256, 512, 512)
        dec = (256, 128, 64, 64)
        ncfg = dict(prop_kernel=3, prop_time=18, affinity="TGASS",
                    affinity_gamma=0.5, conf_prop=True, preserve_input=False)
        tm = TorchRDFGenerator(rgb_channels_encoder=enc,
                               depth_channels_encoder=enc,
                               rgb_channels_decoder=dec,
                               depth_channels_decoder=dec,
                               use_nlspn_refine=True, nlspn_configs=ncfg)
        _randomize(tm, rng)
        tm.eval()
        rgb = rng.normal(size=(1, 3, H, W)).astype(np.float32)
        dep = np.abs(rng.normal(size=(1, 1, H, W))).astype(np.float32)
        nrm = rng.normal(size=(1, 3, H, W)).astype(np.float32)
        with torch.no_grad():
            want = tm(torch.from_numpy(rgb), torch.from_numpy(dep),
                      torch.from_numpy(nrm))["pred_depth"].numpy()
        sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
        fm = RDFGenerator(rgb_channels_encoder=list(enc),
                          depth_channels_encoder=list(enc),
                          rgb_channels_decoder=list(dec),
                          depth_channels_decoder=list(dec),
                          use_nlspn_refine=True, nlspn_configs=ncfg,
                          nlspn_impl="gather")
        got = fm.apply(
            _vars(convert_rdf_generator(sd, use_nlspn_refine=True)),
            jnp.asarray(rgb.transpose(0, 2, 3, 1)),
            jnp.asarray(dep.transpose(0, 2, 3, 1)),
            jnp.asarray(nrm.transpose(0, 2, 3, 1)), train=False)
        rows.append(("G_A2B (512ch RDFGenerator+NLSPN)", len(sd))
                    + _delta(got["pred_depth"], want))
        print(rows[-1], flush=True)

    if on("resnetgen"):
        from convert_torch_ckpt import convert_resnet_generator

        from rdfc_gan_tpu.models.resnet_generator import ResnetGenerator

        tm = TorchResnetGenerator(in_ch=1, out_ch=3, ngf=64, n_blocks=9)
        _randomize(tm, rng)
        tm.eval()
        x = rng.normal(size=(1, 1, H, W)).astype(np.float32)
        with torch.no_grad():
            want = tm(torch.from_numpy(x)).numpy()
        sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
        fm = ResnetGenerator(input_channels=1, output_channels=3, ngf=64,
                             n_blocks=9)
        got = fm.apply(_vars(convert_resnet_generator(sd, n_blocks=9)),
                       jnp.asarray(x.transpose(0, 2, 3, 1)), train=False)
        rows.append(("G_B2A (ngf64 ResnetGenerator)", len(sd))
                    + _delta(got, want))
        print(rows[-1], flush=True)

    if on("disc"):
        from convert_torch_ckpt import convert_patchgan

        from rdfc_gan_tpu.models.discriminators import PatchGANDiscriminator

        tm = TorchPatchGAN(in_channels=1)
        _randomize(tm, rng)
        tm.eval()
        x = rng.normal(size=(1, 1, H, W)).astype(np.float32)
        with torch.no_grad():
            want = tm(torch.from_numpy(x)).numpy()
        sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
        fm = PatchGANDiscriminator(in_channels=1)
        got = fm.apply(_vars(convert_patchgan(sd)),
                       jnp.asarray(x.transpose(0, 2, 3, 1)), train=False)
        rows.append(("disc (PatchGAN)", len(sd)) + _delta(got, want))
        print(rows[-1], flush=True)

    print(f"\n| net | tensors | max abs delta | max rel delta |")
    print(f"|---|---|---|---|")
    for name, n, d, r in rows:
        print(f"| {name} | {n} | {d:.2e} | {r:.2e} |")


if __name__ == "__main__":
    main()
