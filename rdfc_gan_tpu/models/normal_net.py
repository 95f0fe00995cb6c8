"""NNET — surface-normal estimation net (G_normal).

Parity target: lib/models/generator/normal_net/ — EfficientNet-B5 encoder
(torch.hub ``tf_efficientnet_b5_ap``, submodules/encoder.py:10-13) feeding a
skip-connected UpSampleBN decoder from feature taps 4/5/6/8/11 of the hub
model's feature list (decoder.py:18), 4 output channels (normal xyz + kappa),
bilinear-resized (align_corners=True) to (out_height, out_width) (NNET.py:23-26).

This is a from-scratch Flax EfficientNet-B5 (width 1.6 / depth 2.2 scaling of
the B0 recipe) whose stage outputs land on the same tap channels the decoder
expects: 24 (1/2), 40 (1/4), 64 (1/8), 176 (1/16), 2048 head (1/32). There is
no torch.hub in this environment; pretrained weights come via the checkpoint
converter instead (utils/torch_convert.py).
"""

from __future__ import annotations

import math
from typing import Optional, Sequence

import flax.linen as nn
import jax.numpy as jnp

from .layers import BatchNorm, bilinear_resize


def _round_channels(c: float, width: float, divisor: int = 8) -> int:
    c *= width
    new_c = max(divisor, int(c + divisor / 2) // divisor * divisor)
    if new_c < 0.9 * c:
        new_c += divisor
    return new_c


def _round_repeats(r: int, depth: float) -> int:
    return int(math.ceil(depth * r))


# B0 recipe: (expand, channels, repeats, stride, kernel)
_B0_BLOCKS = (
    (1, 16, 1, 1, 3),
    (6, 24, 2, 2, 3),
    (6, 40, 2, 2, 5),
    (6, 80, 3, 2, 3),
    (6, 112, 3, 1, 5),
    (6, 192, 4, 2, 5),
    (6, 320, 1, 1, 3),
)


class SqueezeExcite(nn.Module):
    reduced: int
    packed: bool = False  # W-packed input: per-ORIG-channel pooled stats

    @nn.compact
    def __call__(self, x):
        if self.packed:
            B, H, Wp, C2 = x.shape
            s = x.reshape(B, H, Wp, C2 // 2, 2).mean(axis=(1, 2, 4))
            s = s[:, None, None, :]
        else:
            s = x.mean(axis=(1, 2), keepdims=True)
        cout = x.shape[-1] // (2 if self.packed else 1)
        s = nn.silu(nn.Conv(self.reduced, (1, 1))(s))
        s = nn.sigmoid(nn.Conv(cout, (1, 1))(s))
        if self.packed:
            s = jnp.repeat(s, 2, axis=-1)
        return x * s


class MBConv(nn.Module):
    features: int
    expand: int
    kernel: int
    stride: int
    se_ratio: float = 0.25
    axis_name: Optional[str] = None
    # W-packed layout (ops/packed.py): 'none' | 'full' (in & out packed,
    # s1) | 'exit' (packed in; the depthwise stride-2 conv unpacks).
    # Param tree identical in every mode.
    pack_mode: str = "none"

    @nn.compact
    def __call__(self, x, train: bool = True):
        pk = self.pack_mode != "none"
        full = self.pack_mode == "full"

        def bn(z, packed=False):
            return BatchNorm(use_running_average=not train, momentum=0.9,
                             epsilon=1e-3, axis_name=self.axis_name,
                             dtype=z.dtype, pack=2 if packed else 1)(z)

        cin = x.shape[-1] // (2 if pk else 1)
        h = x
        mid = cin * self.expand
        ci = 0
        if self.expand != 1:
            if pk:
                from .layers import PackedConv

                h = PackedConv(mid, (1, 1), padding=0, use_bias=False,
                               name=f"Conv_{ci}")(h)
            else:
                h = nn.Conv(mid, (1, 1), use_bias=False,
                            name=f"Conv_{ci}" if pk else None)(h)
            h = nn.silu(bn(h, pk))
            ci += 1
        if pk:
            from .layers import PackedConv

            assert full or self.stride == 2
            k = self.kernel
            # timm SAME geometry on even dims: s1 -> symmetric k//2;
            # s2 -> (k-2) total, split (k//2-1, k//2)
            if self.stride == 1:
                pl = pr = k // 2
                hp = (k // 2, k // 2)
            else:
                pl, pr = k // 2 - 1, k // 2
                hp = (pl, pr)
            h = PackedConv(mid, (k, k), strides=(self.stride,) * 2,
                           padding=pl, padding_right=pr, h_pad=hp,
                           use_bias=False, feature_group_count=mid,
                           out_packed=full, name=f"Conv_{ci}")(h)
        else:
            h = nn.Conv(mid, (self.kernel,) * 2,
                        strides=(self.stride,) * 2,
                        padding="SAME", feature_group_count=mid,
                        use_bias=False)(h)
        ci += 1
        h = nn.silu(bn(h, full))
        if self.se_ratio > 0:
            h = SqueezeExcite(max(1, int(cin * self.se_ratio)),
                              packed=full)(h)
        if full:
            from .layers import PackedConv

            h = PackedConv(self.features, (1, 1), padding=0, use_bias=False,
                           name=f"Conv_{ci}")(h)
        else:
            h = nn.Conv(self.features, (1, 1), use_bias=False,
                        name=f"Conv_{ci}" if pk else None)(h)
        h = bn(h, full)
        if self.stride == 1 and cin == self.features:
            h = h + x
        return h


class EfficientNetEncoder(nn.Module):
    """Returns the 5 decoder tap features (1/2, 1/4, 1/8, 1/16, head 1/32)."""

    width: float = 1.6
    depth: float = 2.2
    axis_name: Optional[str] = None
    # W-packed stem + stage-0 (the low-channel half-res region, up to 10x
    # lane-padded unpacked — ops/packed.py); stage-1's entry block unpacks.
    packed_width: bool = False

    @nn.compact
    def __call__(self, x, train: bool = True) -> Sequence[jnp.ndarray]:
        def bn(z, packed=False):
            return BatchNorm(use_running_average=not train, momentum=0.9,
                             epsilon=1e-3, axis_name=self.axis_name,
                             dtype=z.dtype, pack=2 if packed else 1)(z)

        pk = self.packed_width and x.shape[1] % 2 == 0 and x.shape[2] % 4 == 0
        stem = _round_channels(32, self.width)
        if pk:
            from .layers import PackedConv

            # timm SAME: k3 s2 on even dims pads (0, 1)
            h = PackedConv(stem, (3, 3), strides=(2, 2), padding=0,
                           padding_right=1, h_pad=(0, 1), use_bias=False,
                           in_packed=False, name="Conv_0")(x)
        else:
            h = nn.Conv(stem, (3, 3), strides=(2, 2), padding="SAME",
                        use_bias=False, name="Conv_0" if pk else None)(x)
        h = nn.silu(bn(h, pk))
        taps = []
        from ..ops.packed import wunpack

        for si, (e, c, r, s, k) in enumerate(_B0_BLOCKS):
            feats = _round_channels(c, self.width)
            reps = _round_repeats(r, self.depth)
            for bi in range(reps):
                pm = "none"
                if pk and si == 0:
                    pm = "full"
                elif pk and si == 1 and bi == 0:
                    pm = "exit"
                h = MBConv(features=feats, expand=e, kernel=k,
                           stride=s if bi == 0 else 1,
                           axis_name=self.axis_name, pack_mode=pm)(h, train)
            if si in (0, 1, 2, 4):  # blocks 0,1,2,4 -> taps 24/40/64/176
                # tap b0 is packed in packed mode: unpack for the decoder
                taps.append(wunpack(h) if (pk and si == 0) else h)
        head = _round_channels(1280, self.width)  # 2048 for B5
        # the reference decoder taps features[11] = conv_head output BEFORE
        # bn2/act2 (encoder.py forward collects every module output; the
        # decoder indexes 4/5/6/8/11) — so the head tap is the bare conv
        h = nn.Conv(head, (1, 1), use_bias=False,
                    name="Conv_1" if pk else None)(h)
        taps.append(h)
        return taps


class UpSampleBN(nn.Module):
    """2x (to skip size, align_corners=True) -> concat -> 2x conv+BN+LeakyReLU
    (submodules.py:10-24; torch LeakyReLU default slope 0.01)."""

    features: int
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, skip, train: bool = True):
        def bn(z):
            return BatchNorm(use_running_average=not train, momentum=0.9,
                                epsilon=1e-5, axis_name=self.axis_name, dtype=z.dtype)(z)

        up = bilinear_resize(x, (skip.shape[1], skip.shape[2]),
                             align_corners=True)
        h = jnp.concatenate([up, skip], axis=-1)
        h = nn.leaky_relu(bn(nn.Conv(self.features, (3, 3), padding=1)(h)), 0.01)
        h = nn.leaky_relu(bn(nn.Conv(self.features, (3, 3), padding=1)(h)), 0.01)
        return h


class NormalDecoder(nn.Module):
    num_classes: int = 4
    head: int = 2048
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, taps, train: bool = True):
        b0, b1, b2, b3, b4 = taps
        h = nn.Conv(self.head, (1, 1))(b4)
        h = UpSampleBN(self.head // 2, self.axis_name)(h, b3, train)
        h = UpSampleBN(self.head // 4, self.axis_name)(h, b2, train)
        h = UpSampleBN(self.head // 8, self.axis_name)(h, b1, train)
        h = UpSampleBN(self.head // 16, self.axis_name)(h, b0, train)
        return nn.Conv(self.num_classes, (3, 3), padding=1)(h)


class NNET(nn.Module):
    out_height: int = 224
    out_width: int = 304
    # B5 scaling by default; smaller multipliers give cheap test/dryrun nets
    width: float = 1.6
    depth: float = 2.2
    axis_name: Optional[str] = None
    packed_width: bool = False  # W-packed encoder stem/stage0 (ops/packed.py)

    @nn.compact
    def __call__(self, img, train: bool = True):
        taps = EfficientNetEncoder(width=self.width, depth=self.depth,
                                   axis_name=self.axis_name,
                                   packed_width=self.packed_width)(img, train)
        out = NormalDecoder(head=_round_channels(1280, self.width),
                            axis_name=self.axis_name)(taps, train)
        return bilinear_resize(out, (self.out_height, self.out_width),
                               align_corners=True)


def norm_normalize_kappa(norm_out: jnp.ndarray, min_kappa: float = 0.01):
    """4-channel variant: unit-normalize xyz, ELU-floor kappa
    (submodules.py:66-73)."""
    xyz = norm_out[..., :3]
    kappa = norm_out[..., 3:4]
    n = jnp.sqrt(jnp.sum(xyz**2, axis=-1, keepdims=True) + 1e-12)
    kappa = nn.elu(kappa) + 1.0 + min_kappa
    return jnp.concatenate([xyz / n, kappa], axis=-1)
