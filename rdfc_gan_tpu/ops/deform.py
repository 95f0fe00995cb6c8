"""Deformable sampling ops — TPU-native replacement for the reference's
CUDA DCNv2 extension (RDFC-GAN/.../nlspn/deformconv/, ~2.4k LoC C++/CUDA).

The reference's only model-path native op is ``modulated_deform_conv_forward``
(SURVEY.md §2.5): an im2col bilinear gather at fractional offsets followed by a
grouped matmul. Here that becomes:

  * ``bilinear_sample`` — 4-tap zero-padded bilinear gather, pure XLA
    (``take_along_axis`` over a flattened spatial axis -> efficient TPU
    gather; autodiff gives the scatter-add transpose the CUDA backward
    implements with atomicAdd, but deterministically).
  * ``deform_gather`` — K taps per output pixel: feat sampled at
    ``p + kernel_offset_k + learned_offset_k``, modulated by ``mask_k``.
  * ``modulated_deform_conv`` — deform_gather -> one big (B*H*W, K*C) x
    (K*C, Cout) matmul on the MXU.

Layouts are NHWC; offsets are (B, H, W, K, 2) with last dim (dy, dx) — a
structured layout instead of the reference's interleaved 2K-channel tensor
(checkpoint converters must permute conv_offset channels accordingly).

Boundary semantics match the CUDA kernel (modulated_deform_im2col_cuda.cuh:
25-54): every bilinear corner outside the image contributes zero.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def kernel_grid_offsets(kh: int, kw: int, dilation: int = 1) -> np.ndarray:
    """Static (K, 2) integer (dy, dx) tap displacements of a centered kernel.

    Row-major kernel enumeration matches the CUDA im2col loop order
    (i * kernel_w + j).
    """
    ys = (np.arange(kh) - (kh - 1) // 2) * dilation
    xs = (np.arange(kw) - (kw - 1) // 2) * dilation
    grid = np.stack(np.meshgrid(ys, xs, indexing="ij"), axis=-1).reshape(-1, 2)
    return grid.astype(np.float32)


def bilinear_sample(feat: jnp.ndarray, y: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
    """Zero-padded bilinear sampling.

    Args:
      feat: (B, H, W, C)
      y, x: (B, ...) fractional pixel coordinates (same shape).
    Returns:
      (B, ..., C) samples; positions fully outside [0,H)x[0,W) give 0.
    """
    B, H, W, C = feat.shape
    out_shape = y.shape[1:]
    y = y.reshape(B, -1)
    x = x.reshape(B, -1)

    y0 = jnp.floor(y)
    x0 = jnp.floor(x)
    wy1 = y - y0
    wx1 = x - x0
    wy0 = 1.0 - wy1
    wx0 = 1.0 - wx1

    y0i = y0.astype(jnp.int32)
    x0i = x0.astype(jnp.int32)

    feat_flat = feat.reshape(B, H * W, C)

    def tap(yi, xi, w):
        inb = (yi >= 0) & (yi < H) & (xi >= 0) & (xi < W)
        idx = jnp.clip(yi, 0, H - 1) * W + jnp.clip(xi, 0, W - 1)
        vals = jnp.take_along_axis(feat_flat, idx[..., None], axis=1)
        return vals * (w * inb.astype(feat.dtype))[..., None]

    out = (
        tap(y0i, x0i, wy0 * wx0)
        + tap(y0i, x0i + 1, wy0 * wx1)
        + tap(y0i + 1, x0i, wy1 * wx0)
        + tap(y0i + 1, x0i + 1, wy1 * wx1)
    )
    return out.reshape((B,) + out_shape + (C,))


def deform_gather(
    feat: jnp.ndarray,
    offsets: jnp.ndarray,
    mask: Optional[jnp.ndarray] = None,
    kernel_size: Tuple[int, int] = (3, 3),
    dilation: int = 1,
) -> jnp.ndarray:
    """K-tap deformable gather (the im2col half of modulated deform conv).

    Args:
      feat: (B, H, W, C).
      offsets: (B, H, W, K, 2) learned fractional (dy, dx) per tap.
      mask: optional (B, H, W, K) modulation (DCNv2 mask / NLSPN affinity).
      kernel_size: (kh, kw); K must equal kh*kw.
    Returns:
      (B, H, W, K, C) modulated samples at p + grid_k + offset_k.
    """
    B, H, W, C = feat.shape
    K = offsets.shape[3]
    kh, kw = kernel_size
    assert K == kh * kw, (K, kernel_size)

    grid = jnp.asarray(kernel_grid_offsets(kh, kw, dilation))  # (K, 2)
    yy = jax.lax.broadcasted_iota(jnp.float32, (H, W), 0)
    xx = jax.lax.broadcasted_iota(jnp.float32, (H, W), 1)
    base = jnp.stack([yy, xx], axis=-1)  # (H, W, 2)

    pos = base[None, :, :, None, :] + grid[None, None, None, :, :] + offsets
    samples = bilinear_sample(feat, pos[..., 0], pos[..., 1])  # (B,H,W,K,C)
    if mask is not None:
        samples = samples * mask[..., None].astype(samples.dtype)
    return samples


def modulated_deform_conv(
    feat: jnp.ndarray,
    offsets: jnp.ndarray,
    mask: Optional[jnp.ndarray],
    weight: jnp.ndarray,
    bias: Optional[jnp.ndarray] = None,
    kernel_size: Tuple[int, int] = (3, 3),
    dilation: int = 1,
    groups: int = 1,
) -> jnp.ndarray:
    """Modulated deformable convolution (DCNv2 forward), stride 1, 'same' pad.

    Args:
      feat: (B, H, W, Cin).
      offsets: (B, H, W, K, 2); mask: (B, H, W, K) or None (plain deform conv).
      weight: (K, Cin // groups, Cout) HWIO-flattened kernel.
      groups: feature groups (reference uses groups == channels for NLSPN).
    Returns:
      (B, H, W, Cout).

    The contraction runs as a single (B*H*W, K*Cin/g) @ (K*Cin/g, Cout/g)
    matmul per group — MXU-shaped, unlike the reference's per-im2col-step
    batched addmm loop (modulated_deform_conv_cuda.cu:90-116).
    """
    B, H, W, Cin = feat.shape
    K = offsets.shape[3]
    Cout = weight.shape[-1]
    samples = deform_gather(feat, offsets, mask, kernel_size, dilation)

    if groups == 1:
        cols = samples.reshape(B * H * W, K * Cin)
        w = weight.reshape(K * Cin, Cout)
        out = jnp.dot(cols, w, preferred_element_type=jnp.float32)
        out = out.reshape(B, H, W, Cout).astype(feat.dtype)
    else:
        cg = Cin // groups
        og = Cout // groups
        s = samples.reshape(B * H * W, K, groups, cg)
        s = s.transpose(0, 2, 1, 3).reshape(B * H * W, groups, K * cg)
        w = weight.reshape(K, groups, cg, og).transpose(1, 0, 2, 3)
        w = w.reshape(groups, K * cg, og)
        out = jnp.einsum("bgk,gko->bgo", s, w,
                         preferred_element_type=jnp.float32)
        out = out.reshape(B, H, W, Cout).astype(feat.dtype)

    if bias is not None:
        out = out + bias
    return out
