"""Width-packed (space-to-depth along W) convolution transforms.

Motivation (docs/PERF_NOTES.md round-3 byte attribution): the flagship step
is HBM-bandwidth-bound and its top writers are full/half-resolution tensors
with 16..96 channels. TPU lays NHWC tensors with C on the 128-wide lane
dimension, so a C=64 bf16 tensor PHYSICALLY moves 2x its logical bytes
(C=48 -> 2.7x, C=16 -> 8x). Packing W by 2 into channels (c-major:
packed channel = 2*c + phase, phase = w mod 2) turns C=64 into C=128 —
lane-dense, half the physical traffic — while staying mathematically EXACT:
every conv/convT on the packed layout is the same linear map with a
re-scattered kernel (derivations below). The FLOP inflation (structural
zeros in the packed kernels, <=2x on ops that are ~3% of step FLOPs) is
irrelevant at 17% MXU utilization.

This replaces the reference's CUDA-era NCHW assumption with a TPU-native
layout choice; no reference analog (the hot-op inventory is
SURVEY.md §2.5 / nlspn deformconv — unaffected, NLSPN runs unpacked).

Conventions:
  * pack factor is fixed at 2 (W must be even — callers fall back to the
    unpacked path otherwise).
  * c-major channel order: packed[..., j, 2*c + f] = x[..., 2*j + f, c].
    Channel-concat therefore commutes with packing.
  * all kernels are stored in their ORIGINAL (kh, kw, Cin, Cout) HWIO
    shape — checkpoint schema and converters are unchanged; the packed
    kernel is assembled at trace time by strided scatters (tiny tensors).

Derivations (w-dimension only; h is untouched). Let y/x be output/input
rows, w[t] the kw taps, p the original symmetric padding, s the stride.

  in&out packed, stride s (s=1 stems/blocks, s=2 packed->packed down):
      Y[j, fo] = y[2j + fo] = sum_t w[t] x[s(2j + fo) - p + t]
      x-index = 2(j*s + d) + fi  with  v = s*fo - p + t,
      fi = v mod 2, d = (v - fi)/2  ->  packed tap offset d, stride s.
  in packed, out unpacked, stride s even (packed->dense downsamplers):
      y[o] = sum_t w[t] x[s*o - p + t]; x-index = 2((s/2) o + d) + fi with
      v = t - p  ->  packed stride s/2.
  in unpacked, out packed (TorchConvTranspose k,s=2,p,op=1; kernel stored
  pre-flipped, implemented as lhs-dilated conv with pads (k-1-p, k-p)):
      y[o] = sum_t w[t] dil[o + t] where value x[i] sits at dilated
      position 2i + (k-1-p)  ->  t = 2(i - j) + (k-1-p) - fo.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp


def wpack(x: jnp.ndarray) -> jnp.ndarray:
    """(B, H, W, C) -> (B, H, W//2, 2C), c-major (packed ch = 2c + w%2)."""
    B, H, W, C = x.shape
    assert W % 2 == 0, f"wpack needs even W, got {W}"
    x = x.reshape(B, H, W // 2, 2, C)
    return x.transpose(0, 1, 2, 4, 3).reshape(B, H, W // 2, 2 * C)


def wunpack(x: jnp.ndarray) -> jnp.ndarray:
    """Inverse of wpack."""
    B, H, Wp, C2 = x.shape
    assert C2 % 2 == 0
    x = x.reshape(B, H, Wp, C2 // 2, 2).transpose(0, 1, 2, 4, 3)
    return x.reshape(B, H, Wp * 2, C2 // 2)


def _w_taps(kw: int, p: int, s: int, out_packed: bool):
    """(taps, dmin, dmax, packed_stride); taps = [(d, fi, fo, t)] with
    fo = 0 when the output is unpacked. ``p`` is the LEFT padding (the
    right padding only affects the output count, handled by the caller)."""
    taps = []
    if out_packed:
        for fo in (0, 1):
            for t in range(kw):
                v = s * fo - p + t
                fi = v % 2
                taps.append(((v - fi) // 2, fi, fo, t))
        ps = s
    else:
        assert s % 2 == 0, "packed-in/unpacked-out needs even stride"
        for t in range(kw):
            v = t - p
            fi = v % 2
            taps.append(((v - fi) // 2, fi, 0, t))
        ps = s // 2
    dmin = min(d for d, *_ in taps)
    dmax = max(d for d, *_ in taps)
    return taps, dmin, dmax, ps


def pack_kernel(w: jnp.ndarray, p: int, s: int = 1,
                out_packed: bool = True, groups: int = 1):
    """Packed-input conv kernel. w: (kh, kw, Cin/groups, Cout) original.

    Returns (pw, w_pad, w_stride): pw has shape (kh, kp, 2*Cin/groups,
    2*Cout if out_packed else Cout); w_pad the packed-space (lo, hi)
    padding; w_stride the packed-space stride. The same scatter covers
    grouped convs: c-major packing keeps each group's phases adjacent, so
    the per-group I dimension packs exactly like the dense case (``groups``
    is accepted for documentation; shapes derive from ``w``).
    """
    del groups
    kh, kw, ci, co = w.shape
    taps, dmin, dmax, ps = _w_taps(kw, p, s, out_packed)
    kp = dmax - dmin + 1
    pw = jnp.zeros((kh, kp, 2 * ci, (2 * co) if out_packed else co),
                   w.dtype)
    for d, fi, fo, t in taps:
        if out_packed:
            pw = pw.at[:, d - dmin, fi::2, fo::2].add(w[:, t])
        else:
            pw = pw.at[:, d - dmin, fi::2, :].add(w[:, t])
    return pw, (-dmin, dmax), ps


def conv_packed(x: jnp.ndarray, w: jnp.ndarray, p: int,
                stride: Tuple[int, int] = (1, 1),
                out_packed: bool = True,
                h_pad: Optional[Tuple[int, int]] = None,
                p_right: Optional[int] = None,
                groups: int = 1) -> jnp.ndarray:
    """Conv over a W-packed input with an original-shape kernel.

    x: (B, H, Wp, 2*Cin); w: (kh, kw, Cin/groups, Cout); p = original LEFT
    w-padding (``p_right`` defaults to p; asymmetric pads support
    SAME-geometry stems). h uses ``h_pad`` or symmetric p. Output packed
    iff ``out_packed``. ``groups``: feature groups (depthwise = Cin) —
    packed groups stay aligned because c-major packing keeps each original
    channel's phases adjacent. A DEPTHWISE kernel (Cin/groups == 1 and
    Cout == groups) dispatches to the dual-depthwise formulation below —
    the generic packed scatter would produce a 2-in/2-out grouped conv,
    which defeats XLA's native depthwise lowering (the G_normal 32.7 ->
    81.8 ms grad regression, docs/PERF_NOTES.md round-3)."""
    import os

    sh, sw = stride
    pr = p if p_right is None else p_right
    if (groups > 1 and w.shape[2] == 1 and w.shape[3] == groups
            and not os.environ.get("RDFC_PACKED_DW_GROUPED")):
        return _conv_packed_depthwise(x, w, p, pr, (sh, sw), out_packed,
                                      h_pad)
    pw, (lo, _), ws = pack_kernel(w, p, sw, out_packed, groups=groups)
    # right pad from the REQUIRED output width (valid/SAME/symmetric exact):
    # orig O = floor((W + p + pr - kw)/sw) + 1, conv out = (Wp+lo+hi-kp)/ws+1
    kw = w.shape[1]
    kp = pw.shape[1]
    Wp = x.shape[2]
    O = (2 * Wp + p + pr - kw) // sw + 1
    if out_packed:
        assert O % 2 == 0, f"packed output needs even width, got {O}"
        O //= 2
    hi = (O - 1) * ws + kp - lo - Wp
    hp = h_pad if h_pad is not None else (p, pr)
    return jax.lax.conv_general_dilated(
        x, pw.astype(x.dtype), window_strides=(sh, ws),
        padding=(hp, (lo, hi)),
        feature_group_count=groups,
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def _phase_swap(x: jnp.ndarray) -> jnp.ndarray:
    """Swap the two phase lanes of every original channel (c-major pairs)."""
    B, H, Wp, C2 = x.shape
    return x.reshape(B, H, Wp, C2 // 2, 2)[..., ::-1].reshape(B, H, Wp, C2)


def _conv_packed_depthwise(x, w, p: int, pr: int, stride, out_packed: bool,
                           h_pad) -> jnp.ndarray:
    """Depthwise conv over a W-packed input as TWO native depthwise convs.

    The packed-space taps (d, fi, fo, t) couple output phase fo to input
    phase fi of the SAME original channel. Splitting by phase parity:

      * fi == fo taps -> a plain depthwise conv on the packed tensor
        (channel 2c+f convolves with channel 2c+f);
      * fi != fo taps -> a depthwise conv whose OUTPUT channels are then
        phase-swapped (channel 2c+f computes the contribution destined for
        2c+(1-f); the swap is a lane permute fused into the add).

    Both convs keep Cin/group == Cout/group == 1, so XLA's fast depthwise
    lowering applies. For unpacked output (stride-2 'exit' convs) the taps
    all have fo == 0 and the phase contributions reduce pairwise instead.
    Exact: tests/test_packed.py."""
    sh, sw = stride
    kh, kw, _, co = w.shape
    taps, dmin, dmax, ws = _w_taps(kw, p, sw, out_packed)
    kp = dmax - dmin + 1
    Wp = x.shape[2]
    O = (2 * Wp + p + pr - kw) // sw + 1
    hp = h_pad if h_pad is not None else (p, pr)
    lo = -dmin

    def dw(inp, pw):
        return jax.lax.conv_general_dilated(
            inp, pw.astype(x.dtype), window_strides=(sh, ws),
            padding=(hp, (lo, hi)),
            feature_group_count=inp.shape[-1],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    if out_packed:
        assert O % 2 == 0, f"packed output needs even width, got {O}"
        O //= 2
        hi = (O - 1) * ws + kp - lo - Wp
        pw_same = jnp.zeros((kh, kp, 1, 2 * co), w.dtype)
        pw_cross = jnp.zeros((kh, kp, 1, 2 * co), w.dtype)
        any_same = any_cross = False
        for d, fi, fo, t in taps:
            if fi == fo:
                pw_same = pw_same.at[:, d - dmin, 0, fo::2].add(w[:, t, 0])
                any_same = True
            else:
                # computed in the fi lane, swapped into the fo lane after
                pw_cross = pw_cross.at[:, d - dmin, 0, fi::2].add(w[:, t, 0])
                any_cross = True
        out = dw(x, pw_same) if any_same else 0.0
        if any_cross:
            out = out + _phase_swap(dw(x, pw_cross))
        return out
    hi = (O - 1) * ws + kp - lo - Wp
    pw = jnp.zeros((kh, kp, 1, 2 * co), w.dtype)
    for d, fi, _fo, t in taps:
        pw = pw.at[:, d - dmin, 0, fi::2].add(w[:, t, 0])
    g = dw(x, pw)
    B, Ho, Wo, _ = g.shape
    return g.reshape(B, Ho, Wo, co, 2).sum(-1)


def maxpool_k3s2p1_exit(x: jnp.ndarray) -> jnp.ndarray:
    """3x3/s2/p1 max-pool over a W-packed input, UNPACKED output (the
    torchvision/PSPNet stem pool). w-dim reduces via phase channel-slices
    (out[o] = max(x[2o-1], x[2o], x[2o+1]) = max(ph1[o-1], ph0[o],
    ph1[o])); h-dim is a standard pool."""
    B, H, Wp, C2 = x.shape
    ph0, ph1 = x[..., 0::2], x[..., 1::2]
    neg = jnp.full_like(ph1[:, :, :1], -jnp.inf)
    ph1m = jnp.concatenate([neg, ph1[:, :, :-1]], axis=2)
    w = jnp.maximum(jnp.maximum(ph0, ph1), ph1m)  # (B, H, Wp, C)
    import flax.linen as nn

    return nn.max_pool(w, (3, 1), strides=(2, 1),
                       padding=((1, 1), (0, 0)))


def pack_kernel_convt(w: jnp.ndarray, k: int, p: int):
    """Packed-OUTPUT kernel for TorchConvTranspose(k, s=2, p, op=1) whose
    stored kernel is already spatially flipped (layers.TorchConvTranspose).

    Input is unpacked; output is packed. Returns (pw, w_pad): run as a
    plain conv with w-stride 1 and NO w lhs_dilation (h keeps
    lhs_dilation 2 and padding (k-1-p, k-p))."""
    kh, kw, ci, co = w.shape
    assert kw == k
    lo = k - 1 - p  # dilated-space left pad of the torch-exact formulation
    taps = []
    for fo in (0, 1):
        for d in range(-k, k + 1):
            t = 2 * d + lo - fo
            if 0 <= t < k:
                taps.append((d, fo, t))
    dmin = min(d for d, *_ in taps)
    dmax = max(d for d, *_ in taps)
    kp = dmax - dmin + 1
    pw = jnp.zeros((kh, kp, ci, 2 * co), w.dtype)
    for d, fo, t in taps:
        pw = pw.at[:, d - dmin, :, fo::2].add(w[:, t])
    return pw, (-dmin, dmax)


def convt_packed_out(x: jnp.ndarray, w: jnp.ndarray, k: int, p: int,
                     op: int = 1) -> jnp.ndarray:
    """TorchConvTranspose(k, s=2, p, op) with W-PACKED output, unpacked
    input. Exactly layers.TorchConvTranspose's lhs-dilated conv in h;
    the w dimension is the packed reformulation (no dilation)."""
    assert op == 1, "packed output assumes op=1 (even output width)"
    pw, wpad = pack_kernel_convt(w, k, p)
    lo, hi = k - 1 - p, k - 1 - p + op
    return jax.lax.conv_general_dilated(
        x, pw.astype(x.dtype), window_strides=(1, 1),
        padding=((lo, hi), wpad), lhs_dilation=(2, 1),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
