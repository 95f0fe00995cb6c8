"""Non-Local Spatial Propagation (NLSPN) — TPU-native formulation.

Reference: RDFC-GAN/.../nlspn/nlspn_model.py:6-197. There, each of the
``prop_time``=18 refinement iterations launches a CUDA modulated-deform-conv
with a frozen identity kernel — i.e. the op degenerates to an
*affinity-weighted 9-tap bilinear gather at learned fractional offsets*
(SURVEY.md §2.5). 26 kernel launches per forward.

TPU-native design:
  1. Offsets and affinities are loop-invariant (nlspn_model.py:152-154), so the
     bilinear corner indices AND combined weights (bilinear x affinity) are
     precomputed ONCE (``precompute_taps``).
  2. The 18 iterations run as one ``lax.scan`` whose body is a single fused
     gather-multiply-reduce — XLA keeps the (H*W)-vector live on chip between
     steps instead of round-tripping 18 times.
  3. Affinity construction (``nlspn_offset_affinity``) reproduces the TGASS /
     TC / AS / ASS variants, confidence modulation via 1x1 deformable gathers
     of the confidence map, abs-sum normalization with the >=1 clamp, and the
     center-reference affinity 1 - sum(aff).

Offset layout note: the conv that predicts offsets emits (B, H, W, 3*num)
split here as [off_y | off_x | aff]. The reference's channel interleave
(cat(o1, o2).view(B, num, 2, H, W), nlspn_model.py:76-80) is an arbitrary
learned permutation of the same quantities; checkpoint converters must
permute conv output channels to match.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from .deform import bilinear_sample, kernel_grid_offsets


class NLSPNParamsSpec(NamedTuple):
    """Static configuration of an NLSPN refine stage (nlspn_model.py:180-189)."""

    prop_kernel: int = 3
    prop_time: int = 18
    affinity: str = "TGASS"
    affinity_gamma: float = 0.5
    conf_prop: bool = True
    preserve_input: bool = False

    @property
    def num_neighbors(self) -> int:
        return self.prop_kernel * self.prop_kernel - 1


def _conf_sample_shifts(confidence: jnp.ndarray, nb_offsets: jnp.ndarray,
                        R: int) -> jnp.ndarray:
    """Sample the confidence map at per-tap fractional offsets WITHOUT a
    gather: offsets are clamped to [-R, R] so every bilinear corner is an
    integer shift in [-R, R+1]^2, and the sample becomes shifted-image
    multiply-adds. The gather's autodiff transpose is a scatter-add — on
    TPU that serialized backward dominated the whole NLSPN train step
    (docs/PERF_NOTES.md round-2); shift transposes are pads/slices.

    confidence: (B,H,W,1); nb_offsets: (B,H,W,num,2). Returns (B,H,W,num).
    Exact vs the gather path whenever |offset| <= R (the stencil-mode
    exactness condition); offsets are stop-gradient like the reference's
    detached offset_tmp (nlspn_model.py:109)."""
    B, H, W, num, _ = nb_offsets.shape
    q = jnp.clip(jax.lax.stop_gradient(nb_offsets), -R, R)
    q0 = jnp.floor(q)
    fy = (q[..., 0] - q0[..., 0]).astype(confidence.dtype)
    fx = (q[..., 1] - q0[..., 1]).astype(confidence.dtype)
    q0y = q0[..., 0].astype(jnp.int32)
    q0x = q0[..., 1].astype(jnp.int32)
    pad = R + 1
    cp = jnp.pad(confidence[..., 0], ((0, 0), (pad, pad), (pad, pad)))
    # The per-(pixel, tap) shift weight factorizes exactly over the axes:
    #   w(sy, sx) = sum_{dy,dx} wy_dy*wx_dx*[q0y = sy-dy]*[q0x = sx-dx]
    #             = ay(sy) * ax(sx),
    #   ay(sy) = (1-fy)*[q0y = sy] + fy*[q0y = sy-1]   (ax analogous),
    # so the (2R+2)^2-shift select scan collapses to 2*(2R+2) per-axis
    # one-hot blends + one outer-product FMA chain — ~5x fewer VPU ops
    # for the same math (same 4 nonzero bilinear products per tap).
    shifts = range(-R, R + 2)
    one = jnp.ones((), confidence.dtype)
    ax = [(one - fx) * (q0x == sx) + fx * (q0x == sx - 1) for sx in shifts]
    out = jnp.zeros((B, H, W, num), confidence.dtype)
    for iy, sy in enumerate(shifts):
        ay = (one - fy) * (q0y == sy) + fy * (q0y == sy - 1)
        row = jnp.zeros((B, H, W, num), confidence.dtype)
        for ix, sx in enumerate(shifts):
            sl = cp[:, pad + sy: pad + sy + H, pad + sx: pad + sx + W]
            row = row + ax[ix] * sl[..., None]
        out = out + ay * row
    return out


def nlspn_offset_affinity(
    offset_aff_raw: jnp.ndarray,
    confidence: Optional[jnp.ndarray],
    aff_scale_const: jnp.ndarray,
    spec: NLSPNParamsSpec,
    conf_sample_radius: Optional[int] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Build full (K = k*k)-tap offsets and normalized affinities.

    Args:
      offset_aff_raw: (B, H, W, 3*num) guidance-conv output.
      confidence: (B, H, W, 1) or None.
      aff_scale_const: scalar parameter (learnable under TGASS).
      conf_sample_radius: when set (the stencil/Pallas dispatch path),
        confidence is sampled via the gather-free shift formulation with
        offsets clamped to this radius; None = reference-exact gather.
    Returns:
      offsets: (B, H, W, K, 2) with zero at the center tap.
      aff:     (B, H, W, K) with aff_ref = 1 - sum(aff_neighbors) at center.
    """
    num = spec.num_neighbors
    idx_ref = num // 2
    B, H, W, _ = offset_aff_raw.shape

    off_y = offset_aff_raw[..., :num]
    off_x = offset_aff_raw[..., num : 2 * num]
    aff = offset_aff_raw[..., 2 * num :]

    if spec.affinity in ("AS", "ASS"):
        pass
    elif spec.affinity == "TC":
        aff = jnp.tanh(aff) / aff_scale_const
    elif spec.affinity == "TGASS":
        aff = jnp.tanh(aff) / (aff_scale_const + 1e-8)
    else:
        raise NotImplementedError(spec.affinity)

    nb_offsets = jnp.stack([off_y, off_x], axis=-1)  # (B,H,W,num,2)

    if spec.conf_prop:
        assert confidence is not None
        # 1x1-kernel deformable gather of the confidence map at each
        # neighbor's *learned* offset (no kernel-grid displacement — parity
        # with the reference's 1x1 w_conf deform conv, nlspn_model.py:96-119).
        if conf_sample_radius is not None:
            conf = _conf_sample_shifts(confidence, nb_offsets,
                                       conf_sample_radius)
        else:
            yy = jax.lax.broadcasted_iota(
                jnp.float32, (H, W), 0)[None, :, :, None]
            xx = jax.lax.broadcasted_iota(
                jnp.float32, (H, W), 1)[None, :, :, None]
            off = jax.lax.stop_gradient(nb_offsets)
            conf = bilinear_sample(
                confidence, yy + off[..., 0], xx + off[..., 1]
            )[..., 0]  # (B,H,W,num)
        aff = aff * conf

    # abs-sum normalization with >=1 clamp (nlspn_model.py:121-131)
    aff_abs_sum = jnp.sum(jnp.abs(aff), axis=-1, keepdims=True) + 1e-4
    if spec.affinity in ("ASS", "TGASS"):
        aff_abs_sum = jnp.maximum(aff_abs_sum, 1.0)
    if spec.affinity in ("AS", "ASS", "TGASS"):
        aff = aff / aff_abs_sum

    aff_ref = 1.0 - jnp.sum(aff, axis=-1, keepdims=True)

    # insert center tap at idx_ref
    zeros = jnp.zeros((B, H, W, 1, 2), offset_aff_raw.dtype)
    offsets = jnp.concatenate(
        [nb_offsets[:, :, :, :idx_ref], zeros, nb_offsets[:, :, :, idx_ref:]], axis=3
    )
    aff_full = jnp.concatenate(
        [aff[..., :idx_ref], aff_ref, aff[..., idx_ref:]], axis=-1
    )
    return offsets, aff_full


def precompute_taps(
    offsets: jnp.ndarray, aff: jnp.ndarray, prop_kernel: int
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Fold affinity + bilinear weights into flat gather (indices, weights).

    The four bilinear corners of each of the K taps become 4K (index, weight)
    pairs per pixel; out-of-bounds corners get weight 0 (zero-pad semantics of
    the CUDA sampler).

    Returns:
      idx: (B, H*W, 4K) int32 into the flattened H*W axis.
      w:   (B, H*W, 4K) float32 combined weight (bilinear * affinity).
    """
    B, H, W, K, _ = offsets.shape
    grid = jnp.asarray(kernel_grid_offsets(prop_kernel, prop_kernel))  # (K,2)
    yy = jax.lax.broadcasted_iota(jnp.float32, (H, W), 0)
    xx = jax.lax.broadcasted_iota(jnp.float32, (H, W), 1)
    base = jnp.stack([yy, xx], axis=-1)[None, :, :, None, :]  # (1,H,W,1,2)
    pos = base + grid[None, None, None] + offsets  # (B,H,W,K,2)

    y, x = pos[..., 0], pos[..., 1]
    y0 = jnp.floor(y)
    x0 = jnp.floor(x)
    wy1, wx1 = y - y0, x - x0
    wy0, wx0 = 1.0 - wy1, 1.0 - wx1
    y0i, x0i = y0.astype(jnp.int32), x0.astype(jnp.int32)

    idxs, ws = [], []
    for dy, dx, wgt in (
        (0, 0, wy0 * wx0),
        (0, 1, wy0 * wx1),
        (1, 0, wy1 * wx0),
        (1, 1, wy1 * wx1),
    ):
        yi, xi = y0i + dy, x0i + dx
        inb = (yi >= 0) & (yi < H) & (xi >= 0) & (xi < W)
        idxs.append(jnp.clip(yi, 0, H - 1) * W + jnp.clip(xi, 0, W - 1))
        ws.append(wgt * inb.astype(wgt.dtype) * aff)

    idx = jnp.stack(idxs, axis=-1).reshape(B, H * W, 4 * K)
    w = jnp.stack(ws, axis=-1).reshape(B, H * W, 4 * K)
    return idx, w


def _propagate_scan(
    feat0_flat: jnp.ndarray,
    idx: jnp.ndarray,
    w: jnp.ndarray,
    prop_time: int,
    fix_flat: Optional[jnp.ndarray] = None,
    fix_mask_flat: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    B, HW, K4 = idx.shape
    idx_flat = idx.reshape(B, HW * K4)

    def step(feat, _):
        if fix_flat is not None:
            feat = jnp.where(fix_mask_flat, fix_flat, feat)
        g = jnp.take_along_axis(feat, idx_flat, axis=1).reshape(B, HW, K4)
        nxt = jnp.sum(g * w, axis=-1)
        return nxt, None

    out, _ = jax.lax.scan(step, feat0_flat, None, length=prop_time)
    return out


def nlspn_propagate(
    feat_init: jnp.ndarray,
    offsets: jnp.ndarray,
    aff: jnp.ndarray,
    spec: NLSPNParamsSpec,
    feat_fix: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Run ``prop_time`` propagation steps. feat_init: (B, H, W, 1)."""
    B, H, W, C = feat_init.shape
    assert C == 1, "NLSPN propagates a single-channel feature (nlspn_model.py:17)"
    idx, w = precompute_taps(offsets, aff, spec.prop_kernel)

    # propagate in >= f32 (bf16 accumulates error over 18 steps)
    acc_dtype = jnp.promote_types(feat_init.dtype, jnp.float32)

    fix_flat = fix_mask_flat = None
    if spec.preserve_input:
        assert feat_fix is not None
        fix_flat = feat_fix.reshape(B, H * W).astype(acc_dtype)
        fix_mask_flat = jax.lax.stop_gradient(fix_flat > 0.0)

    out = _propagate_scan(
        feat_init.reshape(B, H * W).astype(acc_dtype),
        idx,
        w.astype(acc_dtype),
        spec.prop_time,
        fix_flat,
        fix_mask_flat,
    )
    return out.reshape(B, H, W, 1).astype(feat_init.dtype)


def nlspn_refine(
    pred_init: jnp.ndarray,
    offset_aff_raw: jnp.ndarray,
    confidence: Optional[jnp.ndarray],
    aff_scale_const: jnp.ndarray,
    spec: NLSPNParamsSpec,
    origin_depth: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Full NLSPN refine stage: offsets/affinity once, then scan-propagate.

    Mirrors NLSPNRefineModule.forward (nlspn_model.py:191-197): returns the
    refined depth; the caller keeps its own confidence.
    """
    offsets, aff = nlspn_offset_affinity(
        offset_aff_raw, confidence, aff_scale_const, spec
    )
    return nlspn_propagate(pred_init, offsets, aff, spec, feat_fix=origin_depth)
