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

import functools
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
      M: (B, S, S, H, W) in ``offsets.dtype``, S = 2R+4; M[b, iy, ix] is the
      mask for shift (lo+iy, lo+ix). Folding math runs in f32; the return is
      the activation dtype, so the bf16 train step stores/streams the
      (B,S,S,H,W) stack at half the bytes (the Pallas kernel rounds to bf16
      in VMEM anyway — VERDICT r2 item #3). Out-of-image contributions are
      NOT masked here — the shifted feature is zero-padded, which reproduces
      the CUDA zero-pad boundary semantics automatically.
    """
    B, H, W, K, _ = offsets.shape
    lo, hi = shift_window(R)
    S = hi - lo + 1

    grid = jnp.asarray(kernel_grid_offsets(prop_kernel, prop_kernel))
    q = jnp.clip(offsets, -R, R) + grid[None, None, None]  # (B,H,W,K,2)
    q0 = jnp.floor(q)
    frac = q - q0
    q0 = q0.astype(jnp.int32)

    # 4 bilinear corners (dy, dx) in {0,1}^2, stacked on one axis. The
    # scatter-add over the 4K (tap, corner) contributions runs as a Pallas
    # compare-select kernel on TPU (one-hot einsum fallback elsewhere): the
    # einsum materializes a (B,H,W,4K,S*S) one-hot in HBM (~2.5 GB bf16 at
    # bs8/224x304) on every build, the kernel only streams w/sy/sx/M
    # (ops/pallas/mask_kernel.py). Weight intermediates follow the
    # ACTIVATION dtype: bf16 in the bf16 train step (the result is cast to
    # bf16 anyway), full f32 on f32 inputs so the f32 equivalence contract
    # vs the gather impl is unchanged.
    from .pallas.mask_kernel import scatter_shift_masks

    wy1 = frac[..., 0]
    wx1 = frac[..., 1]
    wgt = jnp.stack([(1 - wy1) * (1 - wx1), (1 - wy1) * wx1,
                     wy1 * (1 - wx1), wy1 * wx1], axis=-1)  # (B,H,W,K,4)
    dy = jnp.asarray([0, 0, 1, 1], jnp.int32)
    dx = jnp.asarray([0, 1, 0, 1], jnp.int32)
    sy = q0[..., 0, None] + dy - lo  # (B,H,W,K,4) in [0, S)
    sx = q0[..., 1, None] + dx - lo
    cdt = offsets.dtype if offsets.dtype == jnp.bfloat16 else jnp.float32
    w = (wgt * aff[..., None]).reshape(B, H, W, 4 * K).astype(cdt)
    w_t = jnp.transpose(w, (0, 3, 1, 2))  # (B,4K,H,W)
    sy_t = jnp.transpose(sy.reshape(B, H, W, 4 * K), (0, 3, 1, 2))
    sx_t = jnp.transpose(sx.reshape(B, H, W, 4 * K), (0, 3, 1, 2))
    M = scatter_shift_masks(w_t, sy_t, sx_t, S)  # (B,S*S,H,W)
    return M.reshape(B, S, S, H, W).astype(offsets.dtype)


def _apply_stencil(x: jnp.ndarray, M: jnp.ndarray, lo: int, S: int,
                   pad: int) -> jnp.ndarray:
    """One propagation step: sum_s M_s * shift_s(x). x: (B,H,W).

    M may be bf16: the multiply promotes per-tile (the convert fuses into
    the multiply-add), so a bf16 mask stack streams at half the bytes of a
    pre-cast f32 copy — the scan re-reads M every one of prop_time steps."""
    B, H, W = x.shape
    fp = jnp.pad(x, ((0, 0), (pad, pad), (pad, pad)))
    acc = jnp.zeros_like(x)
    for iy in range(S):
        for ix in range(S):
            dy, dx = lo + iy, lo + ix
            acc = acc + M[:, iy, ix] * fp[:, pad + dy: pad + dy + H,
                                          pad + dx: pad + dx + W]
    return acc


def _apply_stencil_T(g: jnp.ndarray, M: jnp.ndarray, lo: int, S: int,
                     pad: int) -> jnp.ndarray:
    """Transpose of _apply_stencil w.r.t. x: sum_s shift_{-s}(M_s * g)."""
    B, H, W = g.shape
    acc = jnp.zeros((B, H, W), g.dtype)
    for iy in range(S):
        for ix in range(S):
            dy, dx = lo + iy, lo + ix
            mg = jnp.pad(M[:, iy, ix] * g,
                         ((0, 0), (pad, pad), (pad, pad)))
            acc = acc + mg[:, pad - dy: pad - dy + H,
                           pad - dx: pad - dx + W]
    return acc


def _scan_forward(feat0, M, prop_time, lo, S, pad, fixv, fixm):
    """Returns (out, X) with X = per-step inputs AFTER the preserve
    substitution, stacked (T, B, H, W) — the residuals the hand-written
    backward needs (39 MB at bs8/224x304/T18, vs the GBs of padded
    mask-gradient temporaries XLA's scan-VJP materializes)."""

    def step(feat, _):
        x = jnp.where(fixm, fixv, feat) if fixm is not None else feat
        return _apply_stencil(x, M, lo, S, pad), x

    return jax.lax.scan(step, feat0, None, length=prop_time)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 5))
def stencil_propagate(feat_init: jnp.ndarray, M: jnp.ndarray, prop_time: int,
                      R: int = 2, feat_fix: Optional[jnp.ndarray] = None,
                      preserve_input: bool = False) -> jnp.ndarray:
    """Pure-XLA stencil propagation. feat_init: (B,H,W,1); M: (B,S,S,H,W).

    Carries a hand-written O(T) custom VJP: XLA's generic scan-VJP
    materializes a padded (B,S,S,H,W) mask-gradient temporary per step
    (~170 MB each at bs8), which under remat made the NLSPN backward the
    dominant cost of the whole train step. The custom backward runs one
    reverse scan carrying a single accumulated dM."""
    lo, hi = shift_window(R)
    S, pad = hi - lo + 1, max(-lo, hi)
    feat0 = feat_init[..., 0].astype(jnp.float32)
    fixv = fixm = None
    if preserve_input:
        assert feat_fix is not None
        fixv = feat_fix[..., 0].astype(jnp.float32)
        fixm = jax.lax.stop_gradient(fixv > 0.0)
    out, _ = _scan_forward(feat0, M, prop_time, lo, S, pad, fixv, fixm)
    return out[..., None].astype(feat_init.dtype)


def _prop_fwd(feat_init, M, prop_time, R, feat_fix, preserve_input):
    lo, hi = shift_window(R)
    S, pad = hi - lo + 1, max(-lo, hi)
    feat0 = feat_init[..., 0].astype(jnp.float32)
    fixv = fixm = None
    if preserve_input:
        assert feat_fix is not None
        fixv = feat_fix[..., 0].astype(jnp.float32)
        fixm = jax.lax.stop_gradient(fixv > 0.0)
    out, X = _scan_forward(feat0, M, prop_time, lo, S, pad, fixv, fixm)
    return (out[..., None].astype(feat_init.dtype),
            (X, M, fixm, feat_fix))


def _prop_bwd(prop_time, R, preserve_input, res, g):
    X, M, fixm, feat_fix = res
    lo, hi = shift_window(R)
    S, pad = hi - lo + 1, max(-lo, hi)
    B, H, W = X.shape[1:]
    # the forward output is cast to feat_init.dtype, so g carries it
    in_dtype = g.dtype
    g0 = g[..., 0].astype(jnp.float32)

    # Two-phase backward. A single reverse scan that also accumulates dM
    # re-reads AND re-writes the (B,S,S,H,W) f32 accumulator (~139 MB at
    # bs8/224x304) on every one of the T steps — ~5 GB of pure accumulator
    # churn. Instead: (1) a cheap carry-only reverse scan computes the
    # gradient chain g_t (and dfix), stacking it (T,B,H,W) like X; (2) the
    # mask gradient collapses to one reduction per shift,
    # dM_s = sum_t G_t * shift_s(X_t), which reads G and X once per shift
    # and writes dM exactly once.
    def bstep(carry, x_t):
        gg, dfix = carry
        dx = _apply_stencil_T(gg, M, lo, S, pad)
        if fixm is not None:
            dfix = dfix + jnp.where(fixm, dx, 0.0)
            dx = jnp.where(fixm, 0.0, dx)
        return (dx, dfix), gg

    dfix0 = jnp.zeros((B, H, W), jnp.float32)
    (dfeat0, dfix), G = jax.lax.scan(bstep, (g0, dfix0), X, reverse=True)

    from .pallas.mask_kernel import shift_correlation

    dM = shift_correlation(G, X, S, lo,
                           out_dtype=jnp.float32).reshape(B, S, S, H, W)
    dfeat = dfeat0[..., None].astype(in_dtype)
    if feat_fix is None:
        dfix_out = None
    elif fixm is not None:
        dfix_out = dfix[..., None].astype(feat_fix.dtype)
    else:  # feat_fix passed but unused (preserve_input=False)
        dfix_out = jnp.zeros_like(feat_fix)
    return dfeat, dM.astype(M.dtype), dfix_out


stencil_propagate.defvjp(_prop_fwd, _prop_bwd)


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
