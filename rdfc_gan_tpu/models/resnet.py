"""Flax ResNet torsos with a per-stage API.

Replaces the reference's torchvision resnet18/34 (encoder_decoder/common.py:
5-26), the dilated resnet50 PSPNet backbone (label_net/backbone_resnet50.py)
and the custom per-stage ResNet (lib/models/backbone/resnet/resnet.py:15-501).

Stages are first-class submodules so encoder/decoder graphs can interleave
them (reference forward_encoder_layer getattr dispatch,
encoder_decoder.py:104-122). Weight converters map torchvision OIHW -> HWIO.
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

from .layers import BatchNorm, kaiming_init


class BasicBlock(nn.Module):
    planes: int
    stride: int = 1
    dilation: int = 1
    axis_name: Optional[str] = None
    # W-packed layout (ops/packed.py): 'none' | 'full' (in & out packed)
    # | 'exit' (packed in, unpacked out — the stride-2 stage entry).
    # Param names/shapes are identical in every mode.
    pack_mode: str = "none"

    @nn.compact
    def __call__(self, x, train: bool = True):
        full = self.pack_mode == "full"

        def bn(z, packed: bool):
            return BatchNorm(use_running_average=not train, momentum=0.9,
                             epsilon=1e-5, axis_name=self.axis_name,
                             dtype=z.dtype, pack=2 if packed else 1)(z)

        if self.pack_mode == "none":
            out = nn.Conv(self.planes, (3, 3),
                          strides=(self.stride, self.stride),
                          padding=self.dilation,
                          kernel_dilation=(self.dilation,) * 2,
                          use_bias=False, kernel_init=kaiming_init)(x)
            out = nn.relu(bn(out, False))
            out = nn.Conv(self.planes, (3, 3), padding=self.dilation,
                          kernel_dilation=(self.dilation,) * 2,
                          use_bias=False, kernel_init=kaiming_init)(out)
            out = bn(out, False)
            if self.stride != 1 or x.shape[-1] != self.planes:
                x = nn.Conv(self.planes, (1, 1), strides=(self.stride,) * 2,
                            use_bias=False, kernel_init=kaiming_init)(x)
                x = bn(x, False)
            return nn.relu(out + x)

        from .layers import PackedConv

        assert self.dilation == 1, "packed blocks assume dilation 1"
        full = self.pack_mode == "full"
        assert full or self.stride == 2
        out = PackedConv(self.planes, (3, 3),
                         strides=(self.stride, self.stride), padding=1,
                         use_bias=False, kernel_init=kaiming_init,
                         out_packed=full, name="Conv_0")(x)
        out = nn.relu(bn(out, full))
        if full:
            out = PackedConv(self.planes, (3, 3), padding=1, use_bias=False,
                             kernel_init=kaiming_init, name="Conv_1")(out)
        else:
            out = nn.Conv(self.planes, (3, 3), padding=1, use_bias=False,
                          kernel_init=kaiming_init, name="Conv_1")(out)
        out = bn(out, full)
        if self.stride != 1 or x.shape[-1] // 2 != self.planes:
            x = PackedConv(self.planes, (1, 1),
                           strides=(self.stride,) * 2, padding=0,
                           use_bias=False, kernel_init=kaiming_init,
                           out_packed=full, name="Conv_2")(x)
            x = bn(x, full)
        return nn.relu(out + x)


class Bottleneck(nn.Module):
    planes: int
    stride: int = 1
    dilation: int = 1
    expansion: int = 4
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = True):
        def bn(z):
            return BatchNorm(use_running_average=not train, momentum=0.9,
                                epsilon=1e-5, axis_name=self.axis_name, dtype=z.dtype)(z)

        # convs carry their auto-assigned names explicitly so the dilated
        # 3x3 can swap compute paths (tap-GEMM rewrite, ops/tapconv.py)
        # without moving any parameter in the variable tree
        out = nn.Conv(self.planes, (1, 1), use_bias=False,
                      kernel_init=kaiming_init, name="Conv_0")(x)
        out = nn.relu(bn(out))
        from ..ops.tapconv import TapDilatedConv3x3, tapconv_enabled

        if self.dilation > 1 and self.stride == 1 and tapconv_enabled():
            # MXU-geometry rewrite of the dilated conv (9 shifted pointwise
            # GEMMs) — identical math/params; docs/PERF_NOTES.md round 5
            out = TapDilatedConv3x3(self.planes, dilation=self.dilation,
                                    kernel_init=kaiming_init,
                                    name="Conv_1")(out)
        else:
            out = nn.Conv(self.planes, (3, 3), strides=(self.stride,) * 2,
                          padding=self.dilation,
                          kernel_dilation=(self.dilation,) * 2,
                          use_bias=False, kernel_init=kaiming_init,
                          name="Conv_1")(out)
        out = nn.relu(bn(out))
        out = nn.Conv(self.planes * self.expansion, (1, 1), use_bias=False,
                      kernel_init=kaiming_init, name="Conv_2")(out)
        out = bn(out)
        if self.stride != 1 or x.shape[-1] != self.planes * self.expansion:
            x = nn.Conv(self.planes * self.expansion, (1, 1),
                        strides=(self.stride,) * 2, use_bias=False,
                        kernel_init=kaiming_init, name="Conv_3")(x)
            x = bn(x)
        return nn.relu(out + x)


class ResNetStage(nn.Module):
    """A torchvision `layerN`: first block strides/projects, rest are k=1."""

    block: type
    planes: int
    num_blocks: int
    stride: int = 1
    dilation: int = 1
    # the reference dilated backbone gives the FIRST block of a dilation-2
    # stage dilation 1 (backbone_resnet50.py _make_layer: `elif dilation ==
    # 1 or dilation == 2` branch passes dilation=1 to block 0)
    first_dilation: Optional[int] = None
    multi_grid: Optional[Sequence[int]] = None  # PSPNet layer4 multi-grid
    axis_name: Optional[str] = None
    # 'none' | 'full' (every block W-packed) | 'exit' (block 0 takes packed
    # input and unpacks — for the stage after a packed one)
    pack_mode: str = "none"

    @nn.compact
    def __call__(self, x, train: bool = True):
        for i in range(self.num_blocks):
            d = self.dilation
            if i == 0 and self.first_dilation is not None:
                d = self.first_dilation
            if self.multi_grid is not None:
                d = self.dilation * self.multi_grid[i % len(self.multi_grid)]
            pm = "none"
            if self.pack_mode == "full":
                pm = "full"
            elif self.pack_mode == "exit" and i == 0:
                pm = "exit"
            extra = {"pack_mode": pm} if pm != "none" else {}
            x = self.block(
                planes=self.planes,
                stride=self.stride if i == 0 else 1,
                dilation=d,
                axis_name=self.axis_name,
                **extra,
            )(x, train)
        return x


_DEPTH_CFG = {
    18: (BasicBlock, (2, 2, 2, 2)),
    34: (BasicBlock, (3, 4, 6, 3)),
    50: (Bottleneck, (3, 4, 6, 3)),
}


def make_stages(depth: int, dilated: bool = False,
                axis_name: Optional[str] = None,
                planes: Sequence[int] = (64, 128, 256, 512),
                packed_stage1: bool = False,
                ) -> Tuple[ResNetStage, ...]:
    """Build layer1..layer4. ``dilated``: PSPNet-style output-stride 8
    (layer3 dilation 2, layer4 dilation 4 with multi-grid (1,2,4) and no
    stride — backbone_resnet50.py:126-235). ``planes`` defaults to the
    torchvision widths; narrower values give cheap test-size torsos.
    ``packed_stage1``: layer1 runs W-packed (full-res lane density,
    ops/packed.py) and layer2's entry block unpacks."""
    block, blocks = _DEPTH_CFG[depth]
    if dilated:
        strides = (1, 2, 1, 1)
        dils = (1, 1, 2, 4)
        fd = (None, None, 1, None)  # layer3 block0 runs dilation 1
        mg = (None, None, None, (1, 2, 4))
    else:
        strides = (1, 2, 2, 2)
        dils = (1, 1, 1, 1)
        fd = (None,) * 4
        mg = (None,) * 4
    pms = ("full", "exit", "none", "none") if packed_stage1 \
        else ("none",) * 4
    return tuple(
        ResNetStage(block=block, planes=p, num_blocks=nb, stride=s,
                    dilation=d, first_dilation=f, multi_grid=m,
                    axis_name=axis_name, pack_mode=pm)
        for p, nb, s, d, f, m, pm in zip(planes, blocks, strides, dils, fd,
                                         mg, pms)
    )


class ResNetStem(nn.Module):
    """7x7/2 conv + BN + ReLU + 3x3/2 maxpool (torchvision stem)."""

    features: int = 64
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = True):
        x = nn.Conv(self.features, (7, 7), strides=(2, 2), padding=3,
                    use_bias=False, kernel_init=kaiming_init)(x)
        x = BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, axis_name=self.axis_name, dtype=x.dtype)(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        return x


class DeepStem(nn.Module):
    """deep_base stem of the PSPNet backbone (backbone_resnet50.py:139-154):
    3x(3x3 conv) 3->64->64->128 (stride 2 first, BN+ReLU between, the last
    conv bare) then BN(128) + ReLU + 3x3/2 maxpool."""

    features: int = 64  # width of the two inner convs; output is 2x
    axis_name: Optional[str] = None
    # W-packed half-res stem (ops/packed.py): the 64/64/128-ch tensors run
    # lane-dense; the 3x3/2 max-pool unpacks on exit. Exact; params same.
    packed_width: bool = False

    @nn.compact
    def __call__(self, x, train: bool = True):
        pk = self.packed_width and x.shape[2] % 4 == 0

        def bn(z):
            return BatchNorm(use_running_average=not train, momentum=0.9,
                             epsilon=1e-5, axis_name=self.axis_name,
                             dtype=z.dtype, pack=2 if pk else 1)(z)

        f = self.features
        if pk:
            from .layers import PackedConv

            x = PackedConv(f, (3, 3), strides=(2, 2), padding=1,
                           use_bias=False, kernel_init=kaiming_init,
                           in_packed=False, name="Conv_0")(x)
            x = nn.relu(bn(x))
            x = PackedConv(f, (3, 3), padding=1, use_bias=False,
                           kernel_init=kaiming_init, name="Conv_1")(x)
            x = nn.relu(bn(x))
            x = PackedConv(2 * f, (3, 3), padding=1, use_bias=False,
                           kernel_init=kaiming_init, name="Conv_2")(x)
            x = nn.relu(bn(x))
            from ..ops.packed import maxpool_k3s2p1_exit

            return maxpool_k3s2p1_exit(x)
        x = nn.Conv(f, (3, 3), strides=(2, 2), padding=1, use_bias=False,
                    kernel_init=kaiming_init)(x)
        x = nn.relu(bn(x))
        x = nn.Conv(f, (3, 3), padding=1, use_bias=False,
                    kernel_init=kaiming_init)(x)
        x = nn.relu(bn(x))
        x = nn.Conv(2 * f, (3, 3), padding=1, use_bias=False,
                    kernel_init=kaiming_init)(x)
        x = nn.relu(bn(x))
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        return x
