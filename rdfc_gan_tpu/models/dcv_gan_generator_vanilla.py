"""DCVGANGenerator "vanilla" build (v1 alternative architecture).

Parity target: RDF-GAN/.../rdf_gan_generator_vanilla.py:9-374 — two full
ResNet encoders (rgb branch consumes the guidance map; depth branch consumes
concat(depth, guidance)), 5 DecoderModule stages per branch with skips from
the rgb encoder only at 1/4,1/8,1/16, SIX AdaIN/W-AdaIN fusion points
(before every decoder stage + one before the heads), simple per-branch 3x3
depth/confidence heads, softmax-confidence fusion. Returns the v1 5-tuple.
"""

from __future__ import annotations

from typing import Optional, Sequence

import flax.linen as nn
import jax.numpy as jnp

from ..registry import GENERATORS
from .esanet import ConvBNActESA, ESANetOneModality, LearnedUpsample
from .layers import AdaIN, AdaptiveInstanceNorm, NonBottleneck1D
from .resnet import ResNetStem, make_stages


class VanillaDecoderModule(nn.Module):
    """ConvNormAct -> NonBottleneck1D blocks -> 2x upsample (+ optional
    skip-add) (model_utils.py DecoderModule:289-344)."""

    features: int
    nr_blocks: int = 1
    upsampling_mode: str = "bilinear"
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, skip=None, up_size=None, train: bool = True):
        out = ConvBNActESA(self.features, 3, self.axis_name)(x, train)
        for _ in range(self.nr_blocks):
            out = NonBottleneck1D(self.features,
                                  axis_name=self.axis_name)(out, train)
        if skip is not None:
            up_size = (skip.shape[1], skip.shape[2])
        out = LearnedUpsample(self.upsampling_mode)(out, up_size)
        if skip is not None:
            out = out + skip
        return out


class DCVGANGeneratorVanilla(nn.Module):
    guidance_classes: int = 40
    encoder_rgb: str = "resnet18"
    encoder_depth: str = "resnet18"
    rgb_channels_decoder: Sequence[int] = (128, 128, 128, 128, 128)
    depth_channels_decoder: Sequence[int] = (128, 128, 128, 128, 128)
    nr_decoder_blocks: Sequence[int] = (1, 1, 1, 0, 0)
    fuse_depth_in_rgb_decoder: str = "AdaIN"
    upsampling_mode: str = "bilinear"
    adain_weighting: bool = False
    use_guidance: bool = True
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, rgb, depth, train: bool = True):
        if self.use_guidance:
            g = ESANetOneModality(num_classes=self.guidance_classes,
                                  encoder=self.encoder_rgb,
                                  pyramid_supervision=False,
                                  axis_name=self.axis_name)(rgb, train=train)
            if isinstance(g, (tuple, list)):
                g = g[0]
        else:
            g = rgb
        fuse_in = jnp.concatenate([depth, g], axis=-1)

        rgb_stages = make_stages(
            {"resnet18": 18, "resnet34": 34, "resnet50": 50}[self.encoder_rgb],
            axis_name=self.axis_name)
        dep_stages = make_stages(
            {"resnet18": 18, "resnet34": 34,
             "resnet50": 50}[self.encoder_depth], axis_name=self.axis_name)

        r = ResNetStem(axis_name=self.axis_name)(g, train)
        d = ResNetStem(axis_name=self.axis_name)(fuse_in, train)

        skips = []
        for i in range(4):
            r = rgb_stages[i](r, train)
            d = dep_stages[i](d, train)
            if i < 3:
                skips.append(r)
        skip1, skip2, skip3 = skips  # 1/4, 1/8, 1/16

        rcd, dcd = self.rgb_channels_decoder, self.depth_channels_decoder

        def proj(x, c):
            return (ConvBNActESA(c, 1, self.axis_name)(x, train)
                    if x.shape[-1] != c else x)

        skip3, skip2, skip1 = (proj(skip3, rcd[0]), proj(skip2, rcd[1]),
                               proj(skip1, rcd[2]))

        def fuse(content, style):
            if self.fuse_depth_in_rgb_decoder == "WAdaIN":
                return AdaptiveInstanceNorm(
                    in_channel=content.shape[-1], style_dim=style.shape[-1],
                    weighting=self.adain_weighting)(content, style)
            return AdaIN()(content, style)

        dec = lambda c, nb: VanillaDecoderModule(
            c, nb, self.upsampling_mode, self.axis_name)

        # 5 decoder stages; skips on the first three
        f = fuse(r, d)
        r = dec(rcd[0], self.nr_decoder_blocks[0])(f, skip=skip3, train=train)
        d = dec(dcd[0], self.nr_decoder_blocks[0])(
            d, up_size=(skip3.shape[1], skip3.shape[2]), train=train)

        f = fuse(r, d)
        r = dec(rcd[1], self.nr_decoder_blocks[1])(f, skip=skip2, train=train)
        d = dec(dcd[1], self.nr_decoder_blocks[1])(
            d, up_size=(skip2.shape[1], skip2.shape[2]), train=train)

        f = fuse(r, d)
        r = dec(rcd[2], self.nr_decoder_blocks[2])(f, skip=skip1, train=train)
        d = dec(dcd[2], self.nr_decoder_blocks[2])(
            d, up_size=(skip1.shape[1], skip1.shape[2]), train=train)

        f = fuse(r, d)
        r = dec(rcd[3], self.nr_decoder_blocks[3])(f, train=train)
        d = dec(dcd[3], self.nr_decoder_blocks[3])(d, train=train)

        f = fuse(r, d)
        r = dec(rcd[4], self.nr_decoder_blocks[4])(f, train=train)
        d = dec(dcd[4], self.nr_decoder_blocks[4])(d, train=train)

        r = fuse(r, d)  # fuse_layer6 before the heads

        depth_map_1 = jnp.tanh(nn.Conv(1, (3, 3), padding=1)(r))
        confidence_map_1 = nn.Conv(1, (3, 3), padding=1)(r)
        depth_map_2 = jnp.tanh(nn.Conv(1, (3, 3), padding=1)(d))
        confidence_map_2 = nn.Conv(1, (3, 3), padding=1)(d)

        conf = jnp.concatenate([confidence_map_1, confidence_map_2], axis=-1)
        score = nn.softmax(conf.astype(jnp.float32), axis=-1)
        depths = jnp.concatenate([depth_map_1, depth_map_2], axis=-1)
        final = jnp.sum(depths.astype(jnp.float32) * score, axis=-1,
                        keepdims=True).astype(depth_map_1.dtype)
        return (depth_map_1, confidence_map_1, depth_map_2,
                confidence_map_2, final)


GENERATORS.register("DCVGANGeneratorVanilla")(DCVGANGeneratorVanilla)
