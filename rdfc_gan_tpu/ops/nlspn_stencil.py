"""NLSPN propagation as a gather-free static-shift stencil — the TPU-native
formulation of the reference's deformable propagation (nlspn_model.py:140-173).

Idea: per-pixel sampling positions are p + g_k + o_k(p) (kernel grid g,
learned offset o). With o clamped to a radius R (NLSPN offsets are learned
from zero-init and stay small in practice; R is configurable), every bilinear
corner of every tap lands on an INTEGER shift s in a fixed window
S = [-(R+1), R+2]^2. Folding bilinear-corner weight x affinity into
per-shift mask planes

    M_s(p) = sum_{k, corner c : shift(k,c,p) = s}  w_{k,c}(p),

which are loop-invariant and computed ONCE, each propagation step becomes

    feat <- sum_s  M_s ⊙ shift(feat, s)

— |S| fused multiply-adds of statically-shifted images: pure VPU work, no
gather/scatter anywhere, trivially differentiable, and small enough
(|S|·H·W masks) to keep entirely in VMEM across all prop_time iterations in
the Pallas kernel (ops/pallas/nlspn_kernel.py).

Exactness: identical to the gather formulation whenever every learned offset
lies within [-R, R]; the clamp is the only semantic delta vs the reference's
CUDA op (which it needs anyway to stay on-chip: the CUDA kernel zero-pads
out-of-image taps, we additionally bound the reach).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from .deform import kernel_grid_offsets
from .nlspn import NLSPNParamsSpec


def shift_window(R: int) -> Tuple[int, int]:
    """Integer shift range [lo, hi] covered by clamp radius R and a 3x3
    kernel grid: floor(g + o) in [-(R+1), R+1], +1 for the second bilinear
    corner -> [-(R+1), R+2]."""
    return -(R + 1), R + 2


def build_shift_masks(offsets: jnp.ndarray, aff: jnp.ndarray,
                      prop_kernel: int, R: int = 2) -> jnp.ndarray:
    """Fold (offsets, affinities) into per-shift mask planes.

    Args:
      offsets: (B, H, W, K, 2) learned offsets (center tap zero).
      aff: (B, H, W, K) normalized affinities.
      R: offset clamp radius.
    Returns:
      M: (B, S, S, H, W) float32, S = 2R+4; M[b, iy, ix] is the mask for
      shift (lo+iy, lo+ix). Out-of-image contributions are NOT masked here —
      the shifted feature is zero-padded, which reproduces the CUDA
      zero-pad boundary semantics automatically.
    """
    B, H, W, K, _ = offsets.shape
    lo, hi = shift_window(R)
    S = hi - lo + 1

    grid = jnp.asarray(kernel_grid_offsets(prop_kernel, prop_kernel))
    q = jnp.clip(offsets, -R, R) + grid[None, None, None]  # (B,H,W,K,2)
    q0 = jnp.floor(q)
    frac = q - q0
    q0 = q0.astype(jnp.int32)

    # 4 corners: (dy, dx) in {0,1}^2, weight = bilinear * affinity
    M = jnp.zeros((B, S * S, H, W), jnp.float32)
    wy1 = frac[..., 0]
    wx1 = frac[..., 1]
    corners = (
        (0, 0, (1 - wy1) * (1 - wx1)),
        (0, 1, (1 - wy1) * wx1),
        (1, 0, wy1 * (1 - wx1)),
        (1, 1, wy1 * wx1),
    )
    for dy, dx, wgt in corners:
        sy = q0[..., 0] + dy - lo  # (B,H,W,K) in [0, S)
        sx = q0[..., 1] + dx - lo
        sidx = sy * S + sx
        w = (wgt * aff).astype(jnp.float32)
        # scatter-add over the K taps into the S*S planes via one-hot matmul
        # (K is small; one-time cost). (B,H,W,K) x (B,H,W,K,S*S)
        onehot = jax.nn.one_hot(sidx, S * S, dtype=jnp.float32)
        M = M + jnp.einsum("bhwk,bhwks->bshw", w, onehot)
    return M.reshape(B, S, S, H, W)


def stencil_propagate(feat_init: jnp.ndarray, M: jnp.ndarray, prop_time: int,
                      R: int = 2, feat_fix: Optional[jnp.ndarray] = None,
                      preserve_input: bool = False) -> jnp.ndarray:
    """Pure-XLA stencil propagation. feat_init: (B,H,W,1); M: (B,S,S,H,W)."""
    B, H, W, _ = feat_init.shape
    lo, hi = shift_window(R)
    S = hi - lo + 1
    pad = max(-lo, hi)

    feat0 = feat_init[..., 0].astype(jnp.float32)
    fixm = fixv = None
    if preserve_input:
        assert feat_fix is not None
        fixv = feat_fix[..., 0].astype(jnp.float32)
        fixm = jax.lax.stop_gradient(fixv > 0.0)

    def step(feat, _):
        if fixm is not None:
            feat = jnp.where(fixm, fixv, feat)
        fp = jnp.pad(feat, ((0, 0), (pad, pad), (pad, pad)))
        acc = jnp.zeros_like(feat)
        for iy in range(S):
            for ix in range(S):
                dy, dx = lo + iy, lo + ix
                sl = fp[:, pad + dy: pad + dy + H, pad + dx: pad + dx + W]
                acc = acc + M[:, iy, ix] * sl
        return acc, None

    out, _ = jax.lax.scan(step, feat0, None, length=prop_time)
    return out[..., None].astype(feat_init.dtype)


def nlspn_refine_stencil(pred_init, offset_aff_raw, confidence,
                         aff_scale_const, spec: NLSPNParamsSpec,
                         origin_depth=None, R: int = 2):
    """Drop-in alternative to ops.nlspn.nlspn_refine using the stencil path."""
    from .nlspn import nlspn_offset_affinity

    offsets, aff = nlspn_offset_affinity(offset_aff_raw, confidence,
                                         aff_scale_const, spec)
    M = build_shift_masks(offsets, aff, spec.prop_kernel, R)
    return stencil_propagate(pred_init, M, spec.prop_time, R,
                             feat_fix=origin_depth,
                             preserve_input=spec.preserve_input)
