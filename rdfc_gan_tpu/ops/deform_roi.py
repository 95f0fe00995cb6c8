"""Deformable position-sensitive ROI pooling.

Parity target: deformconv/src/deform_psroi_pooling_cuda.cu (exported by the
reference's DCN module but UNUSED by any shipped model path — SURVEY.md §2.5).
Provided for API completeness as a pure-XLA bilinear implementation.

Semantics follow the CUDA kernel: for ROI (batch_idx, x1, y1, x2, y2) scaled
by ``spatial_scale``, a (pooled_size x pooled_size) grid of bins; each bin
averages ``sample_per_part^2`` bilinear taps, offset by the (optionally
learned) per-part offsets scaled by gamma * roi size; position-sensitive
channel mapping c = (part_h * pooled + part_w) * out_dim-style group layout
collapses to ``output_dim`` channels.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from .deform import bilinear_sample


def deform_psroi_pooling(
    feat: jnp.ndarray,
    rois: jnp.ndarray,
    offsets: Optional[jnp.ndarray],
    pooled_size: int = 7,
    output_dim: Optional[int] = None,
    spatial_scale: float = 1.0 / 16.0,
    sample_per_part: int = 4,
    gamma: float = 0.1,
    no_trans: bool = False,
) -> jnp.ndarray:
    """feat: (B, H, W, C); rois: (N, 5) [batch_idx, x1, y1, x2, y2];
    offsets: (N, pooled, pooled, 2) normalized part offsets or None.
    Returns (N, pooled, pooled, C') with C' = C // (pooled^2) when the input
    is position-sensitive (C divisible), else C.
    """
    B, H, W, C = feat.shape
    N = rois.shape[0]
    P = pooled_size
    ps = C % (P * P) == 0 and C // (P * P) > 0 and output_dim is not None

    batch_idx = rois[:, 0].astype(jnp.int32)
    x1 = rois[:, 1] * spatial_scale - 0.5
    y1 = rois[:, 2] * spatial_scale - 0.5
    x2 = rois[:, 3] * spatial_scale - 0.5
    y2 = rois[:, 4] * spatial_scale - 0.5
    roi_w = jnp.maximum(x2 - x1, 0.1)
    roi_h = jnp.maximum(y2 - y1, 0.1)

    bin_w = roi_w / P
    bin_h = roi_h / P
    sub_w = bin_w / sample_per_part
    sub_h = bin_h / sample_per_part

    # sampling grid: (P, P, s, s)
    py = jax.lax.broadcasted_iota(jnp.float32, (P, P, sample_per_part,
                                                sample_per_part), 0)
    px = jax.lax.broadcasted_iota(jnp.float32, (P, P, sample_per_part,
                                                sample_per_part), 1)
    sy = jax.lax.broadcasted_iota(jnp.float32, (P, P, sample_per_part,
                                                sample_per_part), 2)
    sx = jax.lax.broadcasted_iota(jnp.float32, (P, P, sample_per_part,
                                                sample_per_part), 3)

    def one_roi(b, ry1, rx1, bh, bw, sh, sw, off):
        ys = ry1 + py * bh + (sy + 0.5) * sh
        xs = rx1 + px * bw + (sx + 0.5) * sw
        if off is not None and not no_trans:
            ys = ys + off[..., 0][..., None, None] * gamma * (bh * P)
            xs = xs + off[..., 1][..., None, None] * gamma * (bw * P)
        f = jax.lax.dynamic_index_in_dim(feat, b, axis=0, keepdims=True)
        s = bilinear_sample(f, ys.reshape(1, -1), xs.reshape(1, -1))
        s = s.reshape(P, P, sample_per_part * sample_per_part, C)
        return s.mean(axis=2)  # (P, P, C)

    offs = (offsets if offsets is not None
            else jnp.zeros((N, P, P, 2), feat.dtype))
    pooled = jax.vmap(one_roi)(batch_idx, y1, x1, bin_h, bin_w, sub_h, sub_w,
                               offs)

    if ps:
        # position-sensitive channel selection: bin (i,j) reads channel group
        # (i*P + j)
        pooled = pooled.reshape(N, P, P, P * P, C // (P * P))
        idx = (jnp.arange(P)[:, None] * P + jnp.arange(P)[None, :])
        pooled = pooled[:, jnp.arange(P)[:, None], jnp.arange(P)[None, :],
                        idx]
    return pooled
