"""Discriminators: 70x70 PatchGAN, 1x1 PixelGAN, PointNet critic.

Parity targets:
  * PatchGANDiscriminator — lib/models/discriminator/patch_gan_discriminator.py
    :6-40 (convs 64-128-256-512-1, k4, strides 2,2,2,1,1; no norm on first and
    last; activation on all but last; shipped YAML uses LeakyReLU + BN2d).
  * PixelGANDiscriminator — RDF-GAN pixel variant (1x1 convs).
  * PointNetDiscriminator — pointnet critic over (N,3) clouds
    (pointnet_discriminator.py:6-54; unused by shipped configs).
"""

from __future__ import annotations

from typing import Optional, Sequence

import flax.linen as nn
import jax.numpy as jnp

from ..registry import DISCRIMINATORS
from .layers import BatchNorm, gan_kernel_init


def _act(name: str):
    if name is None:
        return lambda x: x
    name = name.lower()
    if name == "relu":
        return nn.relu
    if name == "leakyrelu":
        return lambda x: nn.leaky_relu(x, negative_slope=0.2)
    raise NotImplementedError(name)


class PatchGANDiscriminator(nn.Module):
    in_channels: int = 1  # informational; flax infers
    out_channels: Sequence[int] = (64, 128, 256, 512, 1)
    kernel_size: Sequence[int] = (4, 4, 4, 4, 4)
    stride: Sequence[int] = (2, 2, 2, 1, 1)
    padding: Sequence[int] = (1, 1, 1, 1, 1)
    norm_cfg: Optional[dict] = None  # {'type': 'BN2d'} default
    activation: str = "LeakyReLU"
    axis_name: Optional[str] = None
    # W-packed first two stages (ops/packed.py): the full-res input and the
    # half-res 64ch stage-0 output run lane-dense. Exact; needs even W and
    # the shipped (k4,s2) geometry for stages 0-1.
    packed_width: bool = False

    @nn.compact
    def __call__(self, x, train: bool = True):
        assert self.out_channels[-1] == 1
        n = len(self.out_channels)
        act = _act(self.activation)
        pk = (self.packed_width and x.shape[2] % 4 == 0 and n >= 3
              and tuple(self.stride[:2]) == (2, 2))
        for i in range(n):
            if pk and i == 0:
                from .layers import PackedConv

                x = PackedConv(self.out_channels[0],
                               (self.kernel_size[0],) * 2,
                               strides=(2, 2), padding=self.padding[0],
                               kernel_init=gan_kernel_init,
                               in_packed=False, out_packed=True,
                               name="Conv_0")(x)
            elif pk and i == 1:
                from .layers import PackedConv

                x = PackedConv(self.out_channels[1],
                               (self.kernel_size[1],) * 2,
                               strides=(2, 2), padding=self.padding[1],
                               kernel_init=gan_kernel_init,
                               in_packed=True, out_packed=False,
                               name="Conv_1")(x)
            else:
                x = nn.Conv(self.out_channels[i],
                            (self.kernel_size[i],) * 2,
                            strides=(self.stride[i],) * 2,
                            padding=self.padding[i],
                            kernel_init=gan_kernel_init,
                            name=f"Conv_{i}" if pk else None)(x)
            if 0 < i < n - 1:
                # stage-1's packed conv already UNPACKS (out_packed=False),
                # so every BN here sees a plain NHWC tensor
                x = BatchNorm(use_running_average=not train, momentum=0.9,
                              epsilon=1e-5, axis_name=self.axis_name,
                              dtype=x.dtype)(x)
            if i < n - 1:
                x = act(x)
        return x


class PixelGANDiscriminator(nn.Module):
    """1x1-receptive-field discriminator (RDF-GAN pixel_gan_discriminator)."""

    ndf: int = 64
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = True):
        x = nn.Conv(self.ndf, (1, 1), kernel_init=gan_kernel_init)(x)
        x = nn.leaky_relu(x, 0.2)
        x = nn.Conv(self.ndf * 2, (1, 1), use_bias=False,
                    kernel_init=gan_kernel_init)(x)
        x = BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, axis_name=self.axis_name, dtype=x.dtype)(x)
        x = nn.leaky_relu(x, 0.2)
        return nn.Conv(1, (1, 1), kernel_init=gan_kernel_init)(x)


class PointNetDiscriminator(nn.Module):
    """Per-point real/fake critic over point clouds (B, N, 3); no STN."""

    @nn.compact
    def __call__(self, pts, train: bool = True):
        def bn(z):
            return BatchNorm(use_running_average=not train, momentum=0.9,
                                epsilon=1e-5, dtype=z.dtype)(z)

        h = nn.relu(bn(nn.Dense(64)(pts)))
        point_feat = h
        h = nn.relu(bn(nn.Dense(128)(h)))
        h = bn(nn.Dense(1024)(h))
        glob = h.max(axis=1, keepdims=True)  # (B,1,1024)
        glob = jnp.broadcast_to(glob, (h.shape[0], h.shape[1], 1024))
        h = jnp.concatenate([point_feat, glob], axis=-1)
        h = nn.relu(bn(nn.Dense(512)(h)))
        h = nn.relu(bn(nn.Dense(256)(h)))
        h = nn.relu(bn(nn.Dense(128)(h)))
        return nn.Dense(1)(h)  # (B, N, 1) per-point critic


DISCRIMINATORS.register("PatchGANDiscriminator")(PatchGANDiscriminator)
DISCRIMINATORS.register("PixelGANDiscriminator")(PixelGANDiscriminator)
DISCRIMINATORS.register("PointNetDiscriminator")(PointNetDiscriminator)
