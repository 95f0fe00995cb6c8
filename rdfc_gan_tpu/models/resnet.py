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
    # Pallas fused-block fast path (ops/fused_block.py): the whole
    # conv-bn-relu-conv-bn-add-relu chain in 5 tensor passes instead of
    # XLA's ~9 (docs/PERF_NOTES.md round-4). Train-mode, stride-1,
    # identity-shortcut blocks only; params/batch_stats trees identical,
    # so checkpoints and the torch converter are unaffected.
    fused: bool = False

    @nn.compact
    def __call__(self, x, train: bool = True):
        full = self.pack_mode == "full"
        if (self.fused and train and self.stride == 1
                and self.dilation == 1
                and self.pack_mode in ("none", "full")
                and x.shape[-1] == self.planes * (2 if full else 1)):
            from ..ops.fused_block import fused_block_dispatch_ok

            if fused_block_dispatch_ok(x, x.shape[-1]):
                return self._fused_call(x)

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


    def _fused_call(self, x):
        """Pallas fused-block path. Declares the SAME variable tree as the
        standard branches via holder modules (Conv_N/kernel,
        BatchNorm_N/{scale,bias} + batch_stats {mean,var}), so the two
        paths are checkpoint-interchangeable; eval/converter flows keep
        using the standard branch."""
        import jax

        from ..ops.fused_block import basic_block_fused

        full = self.pack_mode == "full"
        C = self.planes
        w1 = _KernelHolder((3, 3, C, C), kaiming_init, name="Conv_0")()
        w2 = _KernelHolder((3, 3, C, C), kaiming_init, name="Conv_1")()
        s1, b1, rm1, rv1 = _BNHolder(C, name="BatchNorm_0")()
        s2, b2, rm2, rv2 = _BNHolder(C, name="BatchNorm_1")()
        if full:
            from ..ops.packed import pack_kernel

            pw1, _, _ = pack_kernel(w1, 1, 1, True)
            pw2, _, _ = pack_kernel(w2, 1, 1, True)
            out, (m1, v1, m2, v2) = basic_block_fused(
                x, pw1.astype(x.dtype), jnp.repeat(s1, 2),
                jnp.repeat(b1, 2), pw2.astype(x.dtype), jnp.repeat(s2, 2),
                jnp.repeat(b2, 2), 1e-5, self.axis_name, 2)
            m1, v1, m2, v2 = m1[::2], v1[::2], m2[::2], v2[::2]
        else:
            out, (m1, v1, m2, v2) = basic_block_fused(
                x, w1.astype(x.dtype), s1, b1, w2.astype(x.dtype), s2, b2,
                1e-5, self.axis_name, 1)
        if not self.is_initializing():
            mom = 0.9
            sg = jax.lax.stop_gradient
            rm1.value = mom * rm1.value + (1 - mom) * sg(m1)
            rv1.value = mom * rv1.value + (1 - mom) * sg(v1)
            rm2.value = mom * rm2.value + (1 - mom) * sg(m2)
            rv2.value = mom * rv2.value + (1 - mom) * sg(v2)
        return out


class _KernelHolder(nn.Module):
    """Declares Conv_N/kernel with nn.Conv's exact param name/shape."""

    shape: tuple
    kernel_init: Callable

    @nn.compact
    def __call__(self):
        return self.param("kernel", self.kernel_init, self.shape)


class _BNHolder(nn.Module):
    """Declares BatchNorm_N's params + batch_stats (layers.BatchNorm)."""

    feat: int

    @nn.compact
    def __call__(self):
        scale = self.param("scale", nn.initializers.ones, (self.feat,))
        bias = self.param("bias", nn.initializers.zeros, (self.feat,))
        m = self.variable("batch_stats", "mean",
                          lambda: jnp.zeros((self.feat,), jnp.float32))
        v = self.variable("batch_stats", "var",
                          lambda: jnp.ones((self.feat,), jnp.float32))
        return scale, bias, m, v


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

        out = nn.Conv(self.planes, (1, 1), use_bias=False,
                      kernel_init=kaiming_init)(x)
        out = nn.relu(bn(out))
        out = nn.Conv(self.planes, (3, 3), strides=(self.stride,) * 2,
                      padding=self.dilation, kernel_dilation=(self.dilation,) * 2,
                      use_bias=False, kernel_init=kaiming_init)(out)
        out = nn.relu(bn(out))
        out = nn.Conv(self.planes * self.expansion, (1, 1), use_bias=False,
                      kernel_init=kaiming_init)(out)
        out = bn(out)
        if self.stride != 1 or x.shape[-1] != self.planes * self.expansion:
            x = nn.Conv(self.planes * self.expansion, (1, 1),
                        strides=(self.stride,) * 2, use_bias=False,
                        kernel_init=kaiming_init)(x)
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
    # Pallas fused BasicBlock fast path (ops/fused_block.py; BasicBlock only)
    fused: bool = False

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
            if self.fused and self.block is BasicBlock:
                extra["fused"] = True
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
                fused: bool = False,
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
                    axis_name=axis_name, pack_mode=pm, fused=fused)
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
