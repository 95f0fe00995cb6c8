"""PyTorch mirrors of the reference networks, used to GENERATE synthetic
reference-schema checkpoints for converter validation.

The reference repo ships no checkpoints (BASELINE.md), and its G_normal
encoder comes from torch.hub (`tf_efficientnet_b5_ap`,
normal_net/submodules/encoder.py:10-13) which is unreachable offline. These
mirrors reproduce the reference modules' exact *state-dict layout and
forward semantics* so that:
  * tests/test_ckpt_convert_flagship.py can assert output parity between a
    randomly-initialized torch net and its converted flax twin, and
  * tools/make_synth_ref_ckpt.py can emit a full 6-net reference-schema
    ``.pth`` for end-to-end converter runs.

State-dict name contracts mirrored here (validated against the reference
sources, cited per class):
  * EfficientNet (gen-efficientnet layout): conv_stem / bn1 /
    blocks.{s}.{b}.{conv_pw,bn1,conv_dw,bn2,se.conv_reduce,se.conv_expand,
    conv_pwl,bn3} / conv_head / bn2 — tf_ variants use TF-SAME padding and
    BN eps 1e-3.
  * NNET decoder: decoder.conv2 / decoder.up{1-4}._net.{0,1,3,4} /
    decoder.conv3 (normal_net/submodules/{decoder,submodules}.py).
  * PSPNet: initial.0.{0,1,3,4,6} + initial.1 deep stem, layer1-4
    bottlenecks w/ dilated multi-grid (label_net/backbone_resnet50.py:
    126-235), master_branch.0.stages/bottleneck + master_branch.1,
    auxiliary_branch.{0,1,4} (labels_model.py:12-96).
  * RDFGenerator: rdf_generator/rdf_generator.py:31-414 module names, with
    the NLSPN modulated-deform gather implemented in pure torch (the
    reference CUDA op is 9-tap bilinear gather x affinity with an all-ones
    frozen kernel; nlspn_model.py:140-144).
"""

from __future__ import annotations

import math

import torch
import torch.nn as nn
import torch.nn.functional as F


# ------------------------------------------------------------------ utils --
def round_channels(c: float, width: float, divisor: int = 8) -> int:
    c *= width
    new_c = max(divisor, int(c + divisor / 2) // divisor * divisor)
    if new_c < 0.9 * c:
        new_c += divisor
    return new_c


def round_repeats(r: int, depth: float) -> int:
    return int(math.ceil(depth * r))


B0_BLOCKS = (
    (1, 16, 1, 1, 3),
    (6, 24, 2, 2, 3),
    (6, 40, 2, 2, 5),
    (6, 80, 3, 2, 3),
    (6, 112, 3, 1, 5),
    (6, 192, 4, 2, 5),
    (6, 320, 1, 1, 3),
)


class Conv2dSame(nn.Conv2d):
    """TF-SAME padding (timm Conv2dSame): pad_total = max((ceil(i/s)-1)*s +
    (k-1)*d + 1 - i, 0), split lo = total//2 — identical to JAX 'SAME'."""

    def __init__(self, cin, cout, k, stride=1, groups=1, bias=True):
        super().__init__(cin, cout, k, stride, 0, 1, groups, bias)

    def forward(self, x):
        ih, iw = x.shape[-2:]
        k, s = self.kernel_size, self.stride
        pads = []
        for i, kk, ss in ((iw, k[1], s[1]), (ih, k[0], s[0])):
            o = -(-i // ss)
            total = max((o - 1) * ss + kk - i, 0)
            pads += [total // 2, total - total // 2]
        x = F.pad(x, pads)
        return F.conv2d(x, self.weight, self.bias, self.stride, 0,
                        self.dilation, self.groups)


# ------------------------------------------------- EfficientNet (G_normal) --
class _SqueezeExcite(nn.Module):
    def __init__(self, chs, reduced):
        super().__init__()
        self.conv_reduce = nn.Conv2d(chs, reduced, 1)
        self.conv_expand = nn.Conv2d(reduced, chs, 1)

    def forward(self, x):
        s = x.mean((2, 3), keepdim=True)
        s = F.silu(self.conv_reduce(s))
        return x * torch.sigmoid(self.conv_expand(s))


class _DepthwiseSeparable(nn.Module):
    """gen-efficientnet DepthwiseSeparableConv (stage 0, expand == 1)."""

    def __init__(self, cin, cout, k, stride, se_ratio=0.25, bn_eps=1e-3):
        super().__init__()
        self.conv_dw = Conv2dSame(cin, cin, k, stride, groups=cin, bias=False)
        self.bn1 = nn.BatchNorm2d(cin, eps=bn_eps)
        self.se = _SqueezeExcite(cin, max(1, int(cin * se_ratio)))
        self.conv_pw = nn.Conv2d(cin, cout, 1, bias=False)
        self.bn2 = nn.BatchNorm2d(cout, eps=bn_eps)
        self.has_residual = stride == 1 and cin == cout

    def forward(self, x):
        h = F.silu(self.bn1(self.conv_dw(x)))
        h = self.se(h)
        h = self.bn2(self.conv_pw(h))
        return h + x if self.has_residual else h


class _InvertedResidual(nn.Module):
    """gen-efficientnet InvertedResidual (expand > 1); SE reduction is based
    on the block INPUT channels."""

    def __init__(self, cin, cout, expand, k, stride, se_ratio=0.25,
                 bn_eps=1e-3):
        super().__init__()
        mid = cin * expand
        self.conv_pw = nn.Conv2d(cin, mid, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(mid, eps=bn_eps)
        self.conv_dw = Conv2dSame(mid, mid, k, stride, groups=mid, bias=False)
        self.bn2 = nn.BatchNorm2d(mid, eps=bn_eps)
        self.se = _SqueezeExcite(mid, max(1, int(cin * se_ratio)))
        self.conv_pwl = nn.Conv2d(mid, cout, 1, bias=False)
        self.bn3 = nn.BatchNorm2d(cout, eps=bn_eps)
        self.has_residual = stride == 1 and cin == cout

    def forward(self, x):
        h = F.silu(self.bn1(self.conv_pw(x)))
        h = F.silu(self.bn2(self.conv_dw(h)))
        h = self.se(h)
        h = self.bn3(self.conv_pwl(h))
        return h + x if self.has_residual else h


class TorchEfficientNet(nn.Module):
    """gen-efficientnet GenEfficientNet layout: _modules order conv_stem,
    bn1, act1, blocks, conv_head, bn2, act2, global_pool, classifier —
    the reference Encoder iterates these and collects every output
    (normal_net/submodules/encoder.py forward)."""

    def __init__(self, width=1.6, depth=2.2, bn_eps=1e-3):
        super().__init__()
        stem = round_channels(32, width)
        self.conv_stem = Conv2dSame(3, stem, 3, 2, bias=False)
        self.bn1 = nn.BatchNorm2d(stem, eps=bn_eps)
        self.act1 = nn.SiLU(inplace=True)
        blocks = []
        cin = stem
        for (e, c, r, s, k) in B0_BLOCKS:
            cout = round_channels(c, width)
            stage = []
            for bi in range(round_repeats(r, depth)):
                cls = _DepthwiseSeparable if e == 1 else _InvertedResidual
                args = (cin, cout, k, s if bi == 0 else 1) if e == 1 else \
                    (cin, cout, e, k, s if bi == 0 else 1)
                stage.append(cls(*args, bn_eps=bn_eps))
                cin = cout
            blocks.append(nn.Sequential(*stage))
        self.blocks = nn.Sequential(*blocks)
        head = round_channels(1280, width)
        self.conv_head = nn.Conv2d(cin, head, 1, bias=False)
        self.bn2 = nn.BatchNorm2d(head, eps=bn_eps)
        self.act2 = nn.SiLU(inplace=True)
        self.global_pool = nn.Identity()
        self.classifier = nn.Identity()


class TorchNNETEncoder(nn.Module):
    """normal_net/submodules/encoder.py Encoder: collect every module
    output; the decoder indexes features[4,5,6,8,11]."""

    def __init__(self, width=1.6, depth=2.2):
        super().__init__()
        self.original_model = TorchEfficientNet(width, depth)

    def forward(self, x):
        features = [x]
        for k, v in self.original_model._modules.items():
            if k == "blocks":
                for vi in v._modules.values():
                    features.append(vi(features[-1]))
            else:
                features.append(v(features[-1]))
        return features


class _UpSampleBN(nn.Module):
    def __init__(self, skip_input, output_features):
        super().__init__()
        self._net = nn.Sequential(
            nn.Conv2d(skip_input, output_features, 3, 1, 1),
            nn.BatchNorm2d(output_features), nn.LeakyReLU(),
            nn.Conv2d(output_features, output_features, 3, 1, 1),
            nn.BatchNorm2d(output_features), nn.LeakyReLU())

    def forward(self, x, concat_with):
        up = F.interpolate(x, size=concat_with.shape[2:], mode="bilinear",
                           align_corners=True)
        return self._net(torch.cat([up, concat_with], dim=1))


class TorchNNETDecoder(nn.Module):
    def __init__(self, num_classes=4, width=1.6):
        super().__init__()
        head = round_channels(1280, width)
        # B0 stage output widths at the decoder taps (stages 0,1,2,4):
        # scale to (24, 40, 64, 176) at B5 width 1.6
        taps = [round_channels(c, width) for c in (16, 24, 40, 112)]
        self.conv2 = nn.Conv2d(head, head, 1)
        self.up1 = _UpSampleBN(head + taps[3], head // 2)
        self.up2 = _UpSampleBN(head // 2 + taps[2], head // 4)
        self.up3 = _UpSampleBN(head // 4 + taps[1], head // 8)
        self.up4 = _UpSampleBN(head // 8 + taps[0], head // 16)
        self.conv3 = nn.Conv2d(head // 16, num_classes, 3, 1, 1)

    def forward(self, features):
        b0, b1, b2, b3, b4 = (features[4], features[5], features[6],
                              features[8], features[11])
        h = self.conv2(b4)
        h = self.up1(h, b3)
        h = self.up2(h, b2)
        h = self.up3(h, b1)
        h = self.up4(h, b0)
        return self.conv3(h)


class TorchNNET(nn.Module):
    """normal_net/NNET.py: encoder + decoder + bilinear resize."""

    def __init__(self, out_height, out_width, width=1.6, depth=2.2):
        super().__init__()
        self.encoder = TorchNNETEncoder(width, depth)
        self.decoder = TorchNNETDecoder(4, width)
        self.out_height, self.out_width = out_height, out_width

    def forward(self, img):
        out = self.decoder(self.encoder(img))
        return F.interpolate(out, size=(self.out_height, self.out_width),
                             mode="bilinear", align_corners=True)


# ------------------------------------------------------- PSPNet (G_label) --
class _Bottleneck(nn.Module):
    expansion = 4

    def __init__(self, inplanes, planes, stride=1, dilation=1,
                 downsample=None):
        super().__init__()
        self.conv1 = nn.Conv2d(inplanes, planes, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(planes)
        self.conv2 = nn.Conv2d(planes, planes, 3, stride, dilation, dilation,
                               bias=False)
        self.bn2 = nn.BatchNorm2d(planes)
        self.conv3 = nn.Conv2d(planes, planes * 4, 1, bias=False)
        self.bn3 = nn.BatchNorm2d(planes * 4)
        self.relu = nn.ReLU(inplace=True)
        self.downsample = downsample

    def forward(self, x):
        r = x if self.downsample is None else self.downsample(x)
        h = self.relu(self.bn1(self.conv1(x)))
        h = self.relu(self.bn2(self.conv2(h)))
        h = self.bn3(self.conv3(h))
        return self.relu(h + r)


def _make_dilated_layer(inplanes, planes, blocks, stride=1, dilation=1,
                        multi_grid=False):
    """backbone_resnet50.py _make_layer semantics: dilation-2 stages run
    their first block at dilation 1; multi-grid uses [4, 8, 16]."""
    downsample = None
    if stride != 1 or inplanes != planes * 4:
        downsample = nn.Sequential(
            nn.Conv2d(inplanes, planes * 4, 1, stride, bias=False),
            nn.BatchNorm2d(planes * 4))
    mg = [4, 8, 16]
    layers = []
    if multi_grid:
        d0 = mg[0]
    elif dilation in (1, 2):
        d0 = 1
    else:  # dilation == 4 (non-multi-grid layer4)
        d0 = 2
    layers.append(_Bottleneck(inplanes, planes, stride, d0, downsample))
    inplanes = planes * 4
    for i in range(1, blocks):
        d = mg[i] if multi_grid else dilation
        layers.append(_Bottleneck(inplanes, planes, 1, d))
    return nn.Sequential(*layers)


class _PSPModule(nn.Module):
    def __init__(self, in_channels, bin_sizes=(1, 2, 3, 6)):
        super().__init__()
        out_channels = in_channels // len(bin_sizes)
        self.stages = nn.ModuleList([
            nn.Sequential(nn.AdaptiveAvgPool2d(b),
                          nn.Conv2d(in_channels, out_channels, 1, bias=False),
                          nn.BatchNorm2d(out_channels),
                          nn.ReLU(inplace=True))
            for b in bin_sizes])
        self.bottleneck = nn.Sequential(
            nn.Conv2d(in_channels + out_channels * len(bin_sizes),
                      out_channels, 1),
            nn.BatchNorm2d(out_channels), nn.ReLU(inplace=True),
            nn.Dropout2d(0.1))

    def forward(self, x):
        h, w = x.shape[2:]
        ps = [x] + [F.interpolate(s(x), size=(h, w), mode="bilinear",
                                  align_corners=True) for s in self.stages]
        return self.bottleneck(torch.cat(ps, dim=1))


class TorchPSPNet(nn.Module):
    """labels_model.py PSPNet over the deep-stem dilated R50."""

    def __init__(self, num_classes=14):
        super().__init__()
        conv1 = nn.Sequential(
            nn.Conv2d(3, 64, 3, 2, 1, bias=False), nn.BatchNorm2d(64),
            nn.ReLU(inplace=True),
            nn.Conv2d(64, 64, 3, 1, 1, bias=False), nn.BatchNorm2d(64),
            nn.ReLU(inplace=True),
            nn.Conv2d(64, 128, 3, 1, 1, bias=False))
        self.initial = nn.Sequential(
            conv1, nn.BatchNorm2d(128), nn.ReLU(inplace=True),
            nn.MaxPool2d(3, 2, 1))
        self.layer1 = _make_dilated_layer(128, 64, 3)
        self.layer2 = _make_dilated_layer(256, 128, 4, stride=2)
        self.layer3 = _make_dilated_layer(512, 256, 6, dilation=2)
        self.layer4 = _make_dilated_layer(1024, 512, 3, dilation=4,
                                          multi_grid=True)
        self.master_branch = nn.Sequential(
            _PSPModule(2048), nn.Conv2d(512, num_classes, 1))
        self.auxiliary_branch = nn.Sequential(
            nn.Conv2d(1024, 512, 3, padding=1, bias=False),
            nn.BatchNorm2d(512), nn.ReLU(inplace=True), nn.Dropout2d(0.1),
            nn.Conv2d(512, num_classes, 1))
        self.use_aux = True

    def forward(self, x):
        size = x.shape[2:]
        h = self.initial(x)
        h = self.layer1(h)
        h = self.layer2(h)
        x_aux = self.layer3(h)
        h = self.layer4(x_aux)
        out = F.interpolate(self.master_branch(h), size=size,
                            mode="bilinear", align_corners=True)
        if self.training and self.use_aux:
            aux = F.interpolate(self.auxiliary_branch(x_aux), size=size,
                                mode="bilinear", align_corners=True)
            return [out, aux]
        return out
