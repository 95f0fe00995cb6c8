"""CycleGAN-style ResnetGenerator (G_B2A: depth -> RGB).

Parity target: lib/models/generator/resnet_generator.py:6-100 —
ReflectionPad+7x7 stem (LeakyReLU 0.01), 2x stride-2 downsampling (PReLU),
n_blocks residual blocks (LeakyReLU 0.01 inside), 2x transposed-conv
upsampling (PReLU), ReflectionPad+7x7 head, tanh. norm 'IN2d' per the shipped
YAML (rdf_cycle_patchgan_config.yaml:25) -> instance norm, convs biased."""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp

from ..registry import GENERATORS
from .layers import BatchNorm, TorchConvTranspose, gan_kernel_init, instance_norm, reflect_pad


class PReLU(nn.Module):
    init: float = 0.25

    @nn.compact
    def __call__(self, x):
        a = self.param("alpha", nn.initializers.constant(self.init), ())
        return jnp.where(x >= 0, x, a.astype(x.dtype) * x)


class ResnetBlock(nn.Module):
    dim: int
    norm: str = "IN2d"
    use_dropout: bool = False
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = True):
        use_bias = self.norm.lower() == "in2d"

        def norm(z):
            if self.norm.lower() == "in2d":
                return instance_norm(z)
            return BatchNorm(use_running_average=not train, momentum=0.9,
                                epsilon=1e-5, axis_name=self.axis_name, dtype=z.dtype)(z)

        h = reflect_pad(x, 1)
        h = nn.Conv(self.dim, (3, 3), padding="VALID", use_bias=use_bias,
                    kernel_init=gan_kernel_init)(h)
        h = nn.leaky_relu(norm(h), negative_slope=0.01)
        h = reflect_pad(h, 1)
        h = nn.Conv(self.dim, (3, 3), padding="VALID", use_bias=use_bias,
                    kernel_init=gan_kernel_init)(h)
        return x + norm(h)


class ResnetGenerator(nn.Module):
    input_channels: int = 1
    output_channels: int = 3
    ngf: int = 64
    norm_layer: str = "IN2d"
    use_dropout: bool = False
    n_blocks: int = 6
    padding_type: str = "reflect"
    axis_name: Optional[str] = None
    # W-packed full-res stages (ops/packed.py): the ngf-channel stem/last-up
    # tensors become lane-dense 2*ngf. Exact; params unchanged; needs even W.
    packed_width: bool = False

    @nn.compact
    def __call__(self, x, train: bool = True):
        use_bias = self.norm_layer.lower() == "in2d"
        pk = self.packed_width

        def norm(z, packed: bool = False):
            if self.norm_layer.lower() == "in2d":
                return instance_norm(z, pack=2 if packed else 1)
            return BatchNorm(use_running_average=not train, momentum=0.9,
                             epsilon=1e-5, axis_name=self.axis_name,
                             dtype=z.dtype, pack=2 if packed else 1)(z)

        h = reflect_pad(x, 3)
        if pk:
            # pad in the cheap 1-3ch unpacked form, pack (W+6 stays even),
            # run the 7x7 VALID stem lane-dense
            from ..ops.packed import wunpack
            from .layers import PackedConv

            h = PackedConv(self.ngf, (7, 7), padding=0, use_bias=use_bias,
                           kernel_init=gan_kernel_init,
                           in_packed=False, name="Conv_0")(h)
        else:
            h = nn.Conv(self.ngf, (7, 7), padding="VALID", use_bias=use_bias,
                        kernel_init=gan_kernel_init)(h)
        h = nn.leaky_relu(norm(h, pk), negative_slope=0.01)

        for i in range(2):  # downsample
            mult = 2 ** i
            if pk and i == 0:
                h = PackedConv(self.ngf * 2, (3, 3), strides=(2, 2),
                               padding=1, use_bias=use_bias,
                               kernel_init=gan_kernel_init,
                               out_packed=False, name="Conv_1")(h)
            else:
                h = nn.Conv(self.ngf * mult * 2, (3, 3), strides=(2, 2),
                            padding=1, use_bias=use_bias,
                            kernel_init=gan_kernel_init,
                            name=f"Conv_{i + 1}" if pk else None)(h)
            h = PReLU()(norm(h))

        for _ in range(self.n_blocks):
            h = ResnetBlock(self.ngf * 4, norm=self.norm_layer,
                            use_dropout=self.use_dropout,
                            axis_name=self.axis_name)(h, train)

        for i in range(2):  # upsample
            mult = 2 ** (2 - i)
            h = TorchConvTranspose(self.ngf * mult // 2, kernel=3, stride=2,
                                   padding=1, output_padding=1,
                                   use_bias=use_bias,
                                   kernel_init=gan_kernel_init,
                                   out_packed=pk and i == 1)(h)
            h = PReLU()(norm(h, pk and i == 1))

        if pk:
            h = reflect_pad(wunpack(h), 3)
            h = PackedConv(self.output_channels, (7, 7), padding=0,
                           kernel_init=gan_kernel_init, in_packed=False,
                           name="Conv_3")(h)
            return jnp.tanh(wunpack(h))
        h = reflect_pad(h, 3)
        h = nn.Conv(self.output_channels, (7, 7), padding="VALID",
                    kernel_init=gan_kernel_init)(h)
        return jnp.tanh(h)


GENERATORS.register("ResnetGenerator")(ResnetGenerator)
