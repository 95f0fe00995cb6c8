"""DCVGANGenerator — the v1 (RDF-GAN, CVPR'22) guided generator.

Parity target: RDF-GAN/lib/models/generator/rdf_gan_generator/
rdf_gan_generator.py:12-361 — the same two-branch fusion topology as
RDFGenerator, but the semantic branch consumes a 40-channel segmentation map
from an ESANetOneModality guidance module (:231-240), and forward returns the
5-tuple (depth1, conf1, depth2, conf2, final) (:360). The no-guidance variant
(RDF-GAN/.../rdf_gan_generator_no_guidance/, semantic_channels_in=3) is the
``guidance=None`` configuration.

Here the guided variant composes our ESANetOneModality + RDFGenerator core;
the guidance module's logits feed the semantic branch.
"""

from __future__ import annotations

from typing import Optional, Sequence

import flax.linen as nn

from ..registry import GENERATORS
from .esanet import ESANetOneModality
from .rdf_generator import RDFGenerator


class DCVGANGenerator(nn.Module):
    use_guidance: bool = True
    guidance_classes: int = 40
    guidance_encoder: str = "resnet18"
    # guidance-module configuration (the reference's --guidance_* CLI
    # surface, RDF-GAN/lib/tools/config.py)
    guidance_channels_decoder: Sequence[int] = (128, 128, 128)
    guidance_nr_decoder_blocks: Sequence[int] = (1, 1, 1)
    guidance_encoder_decoder_fusion: str = "add"
    guidance_context_module: str = "ppm"
    guidance_weighting_in_encoder: str = "SE-add"
    guidance_upsampling: str = "learned-3x3-zeropad"
    encoder_rgb: str = "resnet18"
    encoder_depth: str = "resnet18"
    fuse_depth_in_rgb_decoder: str = "WAdaIN"
    adain_weighting: bool = False
    use_nlspn_refine: bool = True
    nlspn_configs: Optional[dict] = None
    rgb_channels_encoder: Sequence[int] = (64, 64, 128, 256, 512, 512)
    depth_channels_encoder: Sequence[int] = (64, 64, 128, 256, 512, 512)
    rgb_channels_decoder: Sequence[int] = (256, 128, 64, 64)
    depth_channels_decoder: Sequence[int] = (256, 128, 64, 64)
    axis_name: Optional[str] = None

    def setup(self):
        if self.use_guidance:
            self.global_guidance_module = ESANetOneModality(
                num_classes=self.guidance_classes,
                encoder=self.guidance_encoder,
                channels_decoder=tuple(self.guidance_channels_decoder),
                nr_decoder_blocks=tuple(self.guidance_nr_decoder_blocks),
                encoder_decoder_fusion=self.guidance_encoder_decoder_fusion,
                context_module=self.guidance_context_module,
                weighting_in_encoder=self.guidance_weighting_in_encoder,
                upsampling=self.guidance_upsampling,
                pyramid_supervision=False,
                axis_name=self.axis_name)
        self.core = RDFGenerator(
            encoder_rgb=self.encoder_rgb,
            encoder_depth=self.encoder_depth,
            semantic_channels_in=(self.guidance_classes if self.use_guidance
                                  else 3),
            fuse_depth_in_rgb_decoder=self.fuse_depth_in_rgb_decoder,
            adain_weighting=self.adain_weighting,
            use_nlspn_refine=self.use_nlspn_refine,
            nlspn_configs=self.nlspn_configs,
            rgb_channels_encoder=self.rgb_channels_encoder,
            depth_channels_encoder=self.depth_channels_encoder,
            rgb_channels_decoder=self.rgb_channels_decoder,
            depth_channels_decoder=self.depth_channels_decoder,
            axis_name=self.axis_name)

    # v1 API returns the 5-tuple (rdf_gan_generator.py:360); the framework's
    # engine contract is the dict — set return_tuple for v1-exact callers.
    return_tuple: bool = False

    def __call__(self, rgb, depth, train: bool = True):
        if self.use_guidance:
            guidance = self.global_guidance_module(rgb, train=train)
            if isinstance(guidance, (tuple, list)):
                guidance = guidance[0]
        else:
            guidance = rgb
        ret = self.core(rgb, depth, guidance, train=train)
        if self.return_tuple:
            return (ret["depth_map_1"], ret["confidence_map_1"],
                    ret["depth_map_2"], ret["confidence_map_2"],
                    ret["pred_depth"])
        return ret


GENERATORS.register("DCVGANGenerator")(DCVGANGenerator)
