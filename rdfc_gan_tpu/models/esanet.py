"""ESANet — efficient semantic segmentation nets (v1's guidance module).

Parity targets: lib/models/generator/rdf_generator/segmentator/esa_net/
  * ESANetOneModality (esa_net_one_modality.py:11-193): resnet encoder with
    optional per-stage SE gates ('SE-add'), PPM context module (bins (1,5)),
    3-stage decoder of NonBottleneck1D blocks with optional pyramid
    supervision (side outputs at 1/8, 1/16, 1/32), final 2x2 upsample chain.
  * ESANet two-modality (esa_net.py:11-240): parallel RGB + depth encoders
    fused per stage by SqueezeAndExciteFusionAdd.
  * SE / PPM utilities (model_utils.py:31-159).

The v1 DCVGANGenerator consumes ESANetOneModality(num_classes=40) output as
its semantic guidance map (rdf_gan_generator.py:231-240).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from .layers import BatchNorm, NonBottleneck1D, bilinear_resize, kaiming_init
from .resnet import ResNetStem, make_stages


class SqueezeAndExcitation(nn.Module):
    reduction: int = 16

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        w = x.mean(axis=(1, 2), keepdims=True)
        w = nn.relu(nn.Conv(max(c // self.reduction, 1), (1, 1))(w))
        w = nn.sigmoid(nn.Conv(c, (1, 1))(w))
        return x * w


class SqueezeAndExciteFusionAdd(nn.Module):
    @nn.compact
    def __call__(self, rgb, depth):
        return SqueezeAndExcitation()(rgb) + SqueezeAndExcitation()(depth)


class ConvBNActESA(nn.Module):
    features: int
    kernel: int = 1
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = True):
        x = nn.Conv(self.features, (self.kernel,) * 2,
                    padding=self.kernel // 2, use_bias=False,
                    kernel_init=kaiming_init)(x)
        x = BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, axis_name=self.axis_name, dtype=x.dtype)(x)
        return nn.relu(x)


class PyramidPoolingModule(nn.Module):
    out_dim: int
    bins: Sequence[int] = (1, 5)
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = True):
        from .label_net import _adaptive_avg_pool

        h, w = x.shape[1], x.shape[2]
        red = x.shape[-1] // len(self.bins)
        outs = [x]
        for b in self.bins:
            y = _adaptive_avg_pool(x, b)
            y = ConvBNActESA(red, 1, self.axis_name)(y, train)
            outs.append(bilinear_resize(y, (h, w), align_corners=False))
        cat = jnp.concatenate(outs, axis=-1)
        return ConvBNActESA(self.out_dim, 1, self.axis_name)(cat, train)


class LearnedUpsample(nn.Module):
    """2x upsample: bilinear, nearest, or learned-3x3(-zeropad) — a nearest
    resize followed by a depthwise 3x3 initialized to the bilinear kernel
    (rdf model_utils.py:226-282)."""

    mode: str = "bilinear"

    @nn.compact
    def __call__(self, x, size: Optional[Tuple[int, int]] = None):
        size = size or (x.shape[1] * 2, x.shape[2] * 2)
        if "learned-3x3" in self.mode:
            y = jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)  # nearest 2x
            y = y[:, : size[0], : size[1], :]
            c = x.shape[-1]

            def bilin_init(key, shape, dtype=jnp.float32):
                del key
                k = np.array([[0.0625, 0.125, 0.0625],
                              [0.125, 0.25, 0.125],
                              [0.0625, 0.125, 0.0625]], np.float32)
                return jnp.asarray(
                    np.tile(k[:, :, None, None], (1, 1, 1, shape[-1])))

            if self.mode == "learned-3x3":
                y = jnp.pad(y, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="reflect")
                pad = "VALID"
            else:  # learned-3x3-zeropad
                pad = "SAME"
            return nn.Conv(c, (3, 3), padding=pad, feature_group_count=c,
                           kernel_init=bilin_init,
                           bias_init=nn.initializers.zeros)(y)
        if self.mode == "nearest":
            y = jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)
            return y[:, : size[0], : size[1], :]
        return bilinear_resize(x, size, align_corners=self.mode != "bilinear")


class ESADecoderModule(nn.Module):
    channels_dec: int
    nr_blocks: int = 1
    num_classes: int = 37
    upsampling_mode: str = "bilinear"
    pyramid_supervision: bool = True
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, skip, train: bool = True):
        out = ConvBNActESA(self.channels_dec, 3, self.axis_name)(x, train)
        for _ in range(self.nr_blocks):
            out = NonBottleneck1D(self.channels_dec,
                                  axis_name=self.axis_name)(out, train)
        side = None
        if train and self.pyramid_supervision:
            side = nn.Conv(self.num_classes, (1, 1))(out)
        out = LearnedUpsample(self.upsampling_mode)(
            out, (skip.shape[1], skip.shape[2]))
        return out + skip, side


class ESANetOneModality(nn.Module):
    height: int = 480
    width: int = 640
    num_classes: int = 37
    encoder: str = "resnet18"
    channels_decoder: Sequence[int] = (128, 128, 128)
    nr_decoder_blocks: Sequence[int] = (1, 1, 1)
    encoder_decoder_fusion: str = "add"
    context_module: str = "ppm"
    weighting_in_encoder: str = "None"
    upsampling: str = "bilinear"
    pyramid_supervision: bool = True
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, image, train: bool = True):
        depth = {"resnet18": 18, "resnet34": 34, "resnet50": 50}[self.encoder]
        stages = make_stages(depth, axis_name=self.axis_name)
        use_se = self.weighting_in_encoder == "SE-add"

        def se(x):
            return SqueezeAndExcitation()(x) if use_se else x

        out = ResNetStem(axis_name=self.axis_name)(image, train)  # stem+pool
        out = se(out)
        out = stages[0](out, train)
        skip1 = se(out)
        out = stages[1](skip1, train)
        skip2 = se(out)
        out = stages[2](skip2, train)
        skip3 = se(out)
        out = stages[3](skip3, train)
        out = se(out)

        cd = self.channels_decoder
        if self.context_module == "ppm":
            out = PyramidPoolingModule(cd[0], axis_name=self.axis_name)(
                out, train)

        def proj(x, c):
            return (ConvBNActESA(c, 1, self.axis_name)(x, train)
                    if x.shape[-1] != c else x)

        skip3, skip2, skip1 = (proj(skip3, cd[0]), proj(skip2, cd[1]),
                               proj(skip1, cd[2]))

        sides = []
        out, s32 = ESADecoderModule(cd[0], self.nr_decoder_blocks[0],
                                    self.num_classes, self.upsampling,
                                    self.pyramid_supervision,
                                    self.axis_name)(out, skip3, train)
        out, s16 = ESADecoderModule(cd[1], self.nr_decoder_blocks[1],
                                    self.num_classes, self.upsampling,
                                    self.pyramid_supervision,
                                    self.axis_name)(out, skip2, train)
        out, s8 = ESADecoderModule(cd[2], self.nr_decoder_blocks[2],
                                   self.num_classes, self.upsampling,
                                   self.pyramid_supervision,
                                   self.axis_name)(out, skip1, train)

        out = nn.Conv(self.num_classes, (3, 3), padding=1)(out)
        out = LearnedUpsample(self.upsampling)(out)
        out = LearnedUpsample(self.upsampling)(out)

        if train and self.pyramid_supervision:
            return out, s8, s16, s32
        return out


class ESANet(nn.Module):
    """Two-modality (RGB + depth) variant: parallel encoders, SE-add fusion
    into the RGB stream at stem and after each stage (esa_net.py:11-240)."""

    height: int = 480
    width: int = 640
    num_classes: int = 37
    encoder: str = "resnet18"
    channels_decoder: Sequence[int] = (128, 128, 128)
    nr_decoder_blocks: Sequence[int] = (1, 1, 1)
    upsampling: str = "bilinear"
    pyramid_supervision: bool = True
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, rgb, depth_img, train: bool = True):
        d = {"resnet18": 18, "resnet34": 34, "resnet50": 50}[self.encoder]
        rgb_stages = make_stages(d, axis_name=self.axis_name)
        dep_stages = make_stages(d, axis_name=self.axis_name)

        r = ResNetStem(axis_name=self.axis_name)(rgb, train)
        z = ResNetStem(axis_name=self.axis_name)(depth_img, train)
        r = SqueezeAndExciteFusionAdd()(r, z)

        skips = []
        for i in range(4):
            r = rgb_stages[i](r, train)
            z = dep_stages[i](z, train)
            r = SqueezeAndExciteFusionAdd()(r, z)
            if i < 3:
                skips.append(r)

        cd = self.channels_decoder
        out = PyramidPoolingModule(cd[0], axis_name=self.axis_name)(r, train)

        def proj(x, c):
            return (ConvBNActESA(c, 1, self.axis_name)(x, train)
                    if x.shape[-1] != c else x)

        s1, s2, s3 = skips
        s3, s2, s1 = proj(s3, cd[0]), proj(s2, cd[1]), proj(s1, cd[2])

        out, s32 = ESADecoderModule(cd[0], self.nr_decoder_blocks[0],
                                    self.num_classes, self.upsampling,
                                    self.pyramid_supervision,
                                    self.axis_name)(out, s3, train)
        out, s16 = ESADecoderModule(cd[1], self.nr_decoder_blocks[1],
                                    self.num_classes, self.upsampling,
                                    self.pyramid_supervision,
                                    self.axis_name)(out, s2, train)
        out, s8 = ESADecoderModule(cd[2], self.nr_decoder_blocks[2],
                                   self.num_classes, self.upsampling,
                                   self.pyramid_supervision,
                                   self.axis_name)(out, s1, train)
        out = nn.Conv(self.num_classes, (3, 3), padding=1)(out)
        out = LearnedUpsample(self.upsampling)(out)
        out = LearnedUpsample(self.upsampling)(out)
        if train and self.pyramid_supervision:
            return out, s8, s16, s32
        return out
