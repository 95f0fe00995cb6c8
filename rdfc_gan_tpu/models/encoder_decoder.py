"""Per-stage ResNet encoder / transposed-conv decoder torso.

Parity target: rdf_generator/encoder_decoder/encoder_decoder.py:5-122 —
en2..en5 are torchvision resnet layer1..4, en6 is a stride-2 conv to 1/16,
de5..de2 are k3 s2 transposed convs; decoder input channels account for
concat skips. Exposes encode/decode per stage for graph interleaving."""

from __future__ import annotations

from typing import Optional, Sequence

import flax.linen as nn
import jax.numpy as jnp

from .layers import ConvBNAct, ConvTBNAct
from .resnet import make_stages


class EncoderDecoder(nn.Module):
    encoder_type: str = "resnet18"
    skip_type: str = "concat"
    encoder_channels: Sequence[int] = (64, 128, 256, 512, 512)
    decoder_channels: Sequence[int] = (256, 128, 64, 64)
    axis_name: Optional[str] = None
    # W-packed full-res region (ops/packed.py): en2 consumes/produces
    # packed tensors, en3 unpacks on entry, de2 emits packed output.
    packed: bool = False

    def setup(self):
        depth = {"resnet18": 18, "resnet34": 34}[self.encoder_type]
        # stage widths follow the config (== torchvision for the shipped
        # [64,128,256,512,512]); narrower configs give cheap test torsos
        stages = make_stages(depth, axis_name=self.axis_name,
                             planes=tuple(self.encoder_channels[:4]),
                             packed_stage1=self.packed)
        self.en2, self.en3, self.en4, self.en5 = stages
        self.en6 = ConvBNAct(self.encoder_channels[-1], kernel=3, stride=2,
                             axis_name=self.axis_name)
        self.de5 = ConvTBNAct(self.decoder_channels[0], axis_name=self.axis_name)
        self.de4 = ConvTBNAct(self.decoder_channels[1], axis_name=self.axis_name)
        self.de3 = ConvTBNAct(self.decoder_channels[2], axis_name=self.axis_name)
        self.de2 = ConvTBNAct(self.decoder_channels[3], axis_name=self.axis_name,
                              out_packed=self.packed)

    def encode(self, x, layer_idx: int, train: bool = True):
        assert 2 <= layer_idx <= 6
        return getattr(self, f"en{layer_idx}")(x, train)

    def decode(self, x, layer_idx: int, train: bool = True):
        assert 2 <= layer_idx <= 5
        return getattr(self, f"de{layer_idx}")(x, train)


def concat_skip(fd: jnp.ndarray, fe: jnp.ndarray) -> jnp.ndarray:
    """Trim decoder padding overhang, then channel-concat (reference
    _concat, rdf_generator.py:244-262)."""
    fd = fd[:, : fe.shape[1], : fe.shape[2], :]
    return jnp.concatenate([fd, fe], axis=-1)


def add_skip(fd: jnp.ndarray, fe: jnp.ndarray) -> jnp.ndarray:
    fd = fd[:, : fe.shape[1], : fe.shape[2], :]
    return fd + fe
