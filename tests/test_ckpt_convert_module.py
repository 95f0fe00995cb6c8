"""Module-level torch->flax conversion parity: a torch PatchGAN built with
the reference's exact layer layout must produce IDENTICAL outputs through our
flax PatchGANDiscriminator after weight conversion."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import sys
import os

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402


def _torch_patchgan(in_ch=1):
    """Reference PatchGAN layout (patch_gan_discriminator.py:6-40):
    convs 64-128-256-1 (shortened stack for test speed), k4 strides 2,2,1,
    BN on middle layers, LeakyReLU."""
    import torch.nn as nn

    class ConvModule(nn.Module):
        def __init__(self, cin, cout, k, s, p, bn, act):
            super().__init__()
            self.conv = nn.Conv2d(cin, cout, k, s, p)
            self.bn = nn.BatchNorm2d(cout) if bn else None
            self.act = nn.LeakyReLU(0.2) if act else None

        def forward(self, x):
            x = self.conv(x)
            if self.bn is not None:
                x = self.bn(x)
            if self.act is not None:
                x = self.act(x)
            return x

    layers = [
        ConvModule(in_ch, 8, 4, 2, 1, bn=False, act=True),
        ConvModule(8, 16, 4, 2, 1, bn=True, act=True),
        ConvModule(16, 1, 4, 1, 1, bn=False, act=False),
    ]
    model = torch.nn.Sequential(*layers)
    # randomize BN stats so conversion is actually exercised
    with torch.no_grad():
        for m in model.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.uniform_(-0.5, 0.5)
                m.running_var.uniform_(0.5, 2.0)
                m.weight.uniform_(0.5, 1.5)
                m.bias.uniform_(-0.2, 0.2)
    return torch.nn.Sequential(model)  # wraps as 'model' attr -> names 0.*


def test_patchgan_conversion_output_parity(rng):
    from convert_torch_ckpt import convert_patchgan

    from rdfc_gan_tpu.models import PatchGANDiscriminator

    tm = _torch_patchgan()
    tm.eval()
    x = rng.normal(size=(2, 1, 16, 16)).astype(np.float32)
    want = tm(torch.from_numpy(x)).detach().numpy()

    sd = {f"model.{k}": v.detach().numpy()
          for k, v in tm[0].state_dict().items()}
    tree = convert_patchgan(sd)

    flax_mod = PatchGANDiscriminator(
        out_channels=(8, 16, 1), kernel_size=(4, 4, 4), stride=(2, 2, 1),
        padding=(1, 1, 1), activation="LeakyReLU")
    variables = {"params": tree["params"]}
    if tree["batch_stats"]:
        variables["batch_stats"] = jax.tree.map(jnp.asarray,
                                                tree["batch_stats"])
    got = flax_mod.apply(jax.tree.map(jnp.asarray, variables),
                         jnp.asarray(x.transpose(0, 2, 3, 1)), train=False)
    np.testing.assert_allclose(np.asarray(got).transpose(0, 3, 1, 2), want,
                               rtol=1e-4, atol=1e-4)
