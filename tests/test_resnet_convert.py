"""Torchvision-layout ResNet stage conversion parity: a torch layer built
with torchvision's exact module names (conv1/bn1/conv2/bn2/downsample) must
reproduce our ResNetStage outputs after torchvision_resnet_to_stages —
validating pretrained-torso loading without torchvision itself."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from rdfc_gan_tpu.models.resnet import ResNetStage, BasicBlock  # noqa: E402
from rdfc_gan_tpu.utils.torch_convert import torchvision_resnet_to_stages  # noqa: E402


class TorchBasicBlock(torch.nn.Module):
    def __init__(self, cin, cout, stride=1):
        super().__init__()
        self.conv1 = torch.nn.Conv2d(cin, cout, 3, stride, 1, bias=False)
        self.bn1 = torch.nn.BatchNorm2d(cout)
        self.conv2 = torch.nn.Conv2d(cout, cout, 3, 1, 1, bias=False)
        self.bn2 = torch.nn.BatchNorm2d(cout)
        self.downsample = None
        if stride != 1 or cin != cout:
            self.downsample = torch.nn.Sequential(
                torch.nn.Conv2d(cin, cout, 1, stride, bias=False),
                torch.nn.BatchNorm2d(cout))

    def forward(self, x):
        out = torch.relu(self.bn1(self.conv1(x)))
        out = self.bn2(self.conv2(out))
        idn = x if self.downsample is None else self.downsample(x)
        return torch.relu(out + idn)


def _randomize_bn(m):
    with torch.no_grad():
        for mod in m.modules():
            if isinstance(mod, torch.nn.BatchNorm2d):
                mod.running_mean.uniform_(-0.3, 0.3)
                mod.running_var.uniform_(0.5, 1.5)
                mod.weight.uniform_(0.5, 1.5)
                mod.bias.uniform_(-0.2, 0.2)


def test_stage_conversion_parity(rng):
    # torchvision-style layer1 (2 blocks, no stride) + layer2 (stride 2)
    tm = torch.nn.Module()
    tm.layer1 = torch.nn.Sequential(TorchBasicBlock(8, 8),
                                    TorchBasicBlock(8, 8))
    tm.layer2 = torch.nn.Sequential(TorchBasicBlock(8, 16, 2),
                                    TorchBasicBlock(16, 16))
    tm.layer3 = torch.nn.Sequential()
    tm.layer4 = torch.nn.Sequential()
    _randomize_bn(tm)
    tm.eval()

    x = rng.normal(size=(1, 8, 12, 12)).astype(np.float32)
    with torch.no_grad():
        want1 = tm.layer1(torch.from_numpy(x)).numpy()
        want2 = tm.layer2(torch.from_numpy(want1)).numpy()

    from rdfc_gan_tpu.utils.torch_convert import split_stage_tree as split

    sd = {k: v.numpy() for k, v in tm.state_dict().items()}
    tree = torchvision_resnet_to_stages(sd)

    xin = jnp.asarray(x.transpose(0, 2, 3, 1))
    s1 = ResNetStage(block=BasicBlock, planes=8, num_blocks=2, stride=1)
    p1, st1 = split(tree["layer1"])
    got1 = s1.apply({"params": jax.tree.map(jnp.asarray, p1),
                     "batch_stats": jax.tree.map(jnp.asarray, st1)},
                    xin, False)
    np.testing.assert_allclose(np.asarray(got1).transpose(0, 3, 1, 2), want1,
                               rtol=1e-4, atol=1e-4)

    s2 = ResNetStage(block=BasicBlock, planes=16, num_blocks=2, stride=2)
    p2, st2 = split(tree["layer2"])
    got2 = s2.apply({"params": jax.tree.map(jnp.asarray, p2),
                     "batch_stats": jax.tree.map(jnp.asarray, st2)},
                    got1, False)
    np.testing.assert_allclose(np.asarray(got2).transpose(0, 3, 1, 2), want2,
                               rtol=1e-4, atol=1e-4)
