"""PSPNet — semantic segmentation head (G_label).

Parity target: lib/models/generator/label_net/ — dilated ResNet-50 backbone
(output stride 8; layer3 dilation 2, layer4 dilation 4 with multi-grid,
backbone_resnet50.py:126-235), PSP pyramid pooling with bins 1/2/3/6
(labels_model.py:12-40), bilinear (align_corners=True) upsample to input
size; train mode additionally returns the auxiliary head on layer3
(labels_model.py:89-94).
"""

from __future__ import annotations

from typing import Optional, Sequence

import flax.linen as nn
import jax.numpy as jnp

from .layers import BatchNorm, bilinear_resize
from .resnet import DeepStem, make_stages


def _adaptive_avg_pool(x: jnp.ndarray, out: int) -> jnp.ndarray:
    """AdaptiveAvgPool2d to (out, out) for small static bin sizes."""
    B, H, W, C = x.shape
    # torch adaptive pooling: window i = [floor(i*H/out), ceil((i+1)*H/out))
    # — never empty, even when out > H.
    y0 = [(i * H) // out for i in range(out)]
    y1 = [-(-((i + 1) * H) // out) for i in range(out)]
    x0 = [(j * W) // out for j in range(out)]
    x1 = [-(-((j + 1) * W) // out) for j in range(out)]
    rows = []
    for i in range(out):
        cols = []
        for j in range(out):
            patch = x[:, y0[i]:y1[i], x0[j]:x1[j], :]
            cols.append(patch.mean(axis=(1, 2)))
        rows.append(jnp.stack(cols, axis=1))
    return jnp.stack(rows, axis=1)  # (B, out, out, C)


class PSPModule(nn.Module):
    bin_sizes: Sequence[int] = (1, 2, 3, 6)
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = True):
        def bn(z):
            return BatchNorm(use_running_average=not train, momentum=0.9,
                                epsilon=1e-5, axis_name=self.axis_name, dtype=z.dtype)(z)

        C = x.shape[-1]
        out_c = C // len(self.bin_sizes)
        h, w = x.shape[1], x.shape[2]
        pyramids = [x]
        for b in self.bin_sizes:
            p = _adaptive_avg_pool(x, b)
            p = nn.relu(bn(nn.Conv(out_c, (1, 1), use_bias=False)(p)))
            pyramids.append(bilinear_resize(p, (h, w), align_corners=True))
        h_ = jnp.concatenate(pyramids, axis=-1)
        h_ = nn.relu(bn(nn.Conv(out_c, (1, 1))(h_)))
        # Dropout2d(0.1) in reference; deterministic eval, train-mode dropout
        h_ = nn.Dropout(0.1, deterministic=not train,
                        broadcast_dims=(1, 2))(h_)
        return h_


class PSPNet(nn.Module):
    num_classes: int = 14
    use_aux: bool = True
    backbone_depth: int = 50  # 18/34 give cheap test/dryrun backbones
    # stage widths; defaults match the reference R50 (narrow for tests)
    planes: Sequence[int] = (64, 128, 256, 512)
    stem_features: int = 64
    packed_width: bool = False  # W-packed DeepStem (ops/packed.py)
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = True, force_aux: bool = False):
        """``force_aux`` returns the auxiliary head in eval mode too (the
        reference gates aux on self.training, labels_model.py:89-94; eval
        aux is useful for converter parity and debugging)."""
        input_size = (x.shape[1], x.shape[2])
        # deep_base stem (backbone_resnet50.py:139-154), not the 7x7 one
        h = DeepStem(features=self.stem_features,
                     axis_name=self.axis_name,
                     packed_width=self.packed_width)(x, train)
        l1, l2, l3, l4 = make_stages(self.backbone_depth, dilated=True,
                                     planes=tuple(self.planes),
                                     axis_name=self.axis_name)
        h = l1(h, train)
        h = l2(h, train)
        x_aux = l3(h, train)
        h = l4(x_aux, train)

        h = PSPModule(axis_name=self.axis_name)(h, train)
        out = nn.Conv(self.num_classes, (1, 1))(h)
        out = bilinear_resize(out, input_size, align_corners=True)

        if (train or force_aux) and self.use_aux:
            def bn(z):
                return BatchNorm(use_running_average=not train, momentum=0.9,
                                    epsilon=1e-5, axis_name=self.axis_name, dtype=z.dtype)(z)

            aux = nn.relu(bn(nn.Conv(self.planes[3], (3, 3), padding=1,
                                     use_bias=False)(x_aux)))
            aux = nn.Dropout(0.1, deterministic=not train,
                             broadcast_dims=(1, 2))(aux)
            aux = nn.Conv(self.num_classes, (1, 1))(aux)
            aux = bilinear_resize(aux, input_size, align_corners=True)
            return [out, aux]
        return out
