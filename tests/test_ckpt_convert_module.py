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


def _torch_resnet_generator(in_ch=1, out_ch=3, ngf=4, n_blocks=2):
    """Reference ResnetGenerator layout (resnet_generator.py:6-100) with
    IN2d norms (no params), LeakyReLU/PReLU activations."""
    import torch.nn as nn

    class Block(nn.Module):
        def __init__(self, dim):
            super().__init__()
            self.conv_block = nn.Sequential(
                nn.ReflectionPad2d(1), nn.Conv2d(dim, dim, 3),
                nn.InstanceNorm2d(dim), nn.LeakyReLU(0.01),
                nn.ReflectionPad2d(1), nn.Conv2d(dim, dim, 3),
                nn.InstanceNorm2d(dim))

        def forward(self, x):
            return x + self.conv_block(x)

    layers = [nn.ReflectionPad2d(3),
              nn.Conv2d(in_ch, ngf, 7), nn.InstanceNorm2d(ngf),
              nn.LeakyReLU(0.01)]
    for i in range(2):
        m = 2 ** i
        layers += [nn.Conv2d(ngf * m, ngf * m * 2, 3, 2, 1),
                   nn.InstanceNorm2d(ngf * m * 2), nn.PReLU(init=0.25)]
    for _ in range(n_blocks):
        layers.append(Block(ngf * 4))
    for i in range(2):
        m = 2 ** (2 - i)
        layers += [nn.ConvTranspose2d(ngf * m, ngf * m // 2, 3, 2, 1, 1),
                   nn.InstanceNorm2d(ngf * m // 2), nn.PReLU(init=0.25)]
    layers += [nn.ReflectionPad2d(3), nn.Conv2d(ngf, out_ch, 7), nn.Tanh()]
    model = torch.nn.Module()
    model.model = torch.nn.Sequential(*layers)
    with torch.no_grad():
        for m in model.modules():
            if isinstance(m, torch.nn.PReLU):
                m.weight.fill_(float(np.random.uniform(0.1, 0.4)))
    return model


def test_resnet_generator_conversion_parity(rng):
    from convert_torch_ckpt import convert_resnet_generator

    from rdfc_gan_tpu.models import ResnetGenerator

    tm = _torch_resnet_generator()
    tm.eval()
    x = rng.normal(size=(1, 1, 32, 32)).astype(np.float32)
    with torch.no_grad():
        want = tm.model(torch.from_numpy(x)).numpy()

    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    tree = convert_resnet_generator(sd, n_blocks=2)

    fg = ResnetGenerator(input_channels=1, output_channels=3, ngf=4,
                         n_blocks=2, norm_layer="IN2d")
    got = fg.apply({"params": jax.tree.map(jnp.asarray, tree["params"])},
                   jnp.asarray(x.transpose(0, 2, 3, 1)), train=False)
    np.testing.assert_allclose(np.asarray(got).transpose(0, 3, 1, 2), want,
                               rtol=2e-4, atol=2e-4)
