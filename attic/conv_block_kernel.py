"""Fused conv3x3 block kernels: prologue(affine+act+residual) -> conv -> moments.

Why (docs/PERF_NOTES.md round-3/4): the flagship step is HBM-bound and every
component already runs AT its logical-byte floor, so the only wins left
REMOVE logical passes. XLA cannot fuse across a convolution: a
norm->act->conv->stats chain lowers as [elementwise fusion: read y, write z]
[conv: read z, write y2] [reduce: read y2], i.e. 3 reads + 2 writes of
full-res tensors. This kernel does the whole chain in ONE pass over the
input rows: the prologue (per-channel affine = BN/IN normalize folded to
a*y+b, optional residual add, optional activation) is applied in VMEM, the
3x3 conv runs as 9 shifted MXU matmuls, and the conv OUTPUT's moments
(sum, sum-of-squares per channel, per batch element) accumulate on the fly
— read u [+ r], write y + a (B,2,C) moment sidecar. The consumer norm
derives mean/var from the sidecar instead of re-reading y.

Replaces the byte pattern of the reference's conv+BN(+ReLU) towers
(RDF-GAN lib/models/generator/rdf_generator/encoder_decoder.py,
torchvision BasicBlock) with a TPU-native single-pass formulation; there
is no CUDA analog to port.

Grid/halo design: grid = (B * H/TH,), W stays whole per block (the shipped
resolutions keep (TH+2)x(W+2)xC tiles far under VMEM). The row halo comes
from passing the SAME input three times with shifted block index maps
(main TH rows + the single row above + the single row below), so the
standard Pallas pipeline double-buffers everything — no manual DMA. Top /
bottom image rows are zero-masked in-kernel (conv zero padding applies to
the POST-prologue tensor, matching the reference semantics). H % TH == 0
is required (dispatch gates on it).

Constraint this kernel CANNOT remove: train-mode BN/IN needs the full
(batch/image) moments of a conv's output before the normalize that feeds
the NEXT conv, so a block is a chain of these kernels (one pass per conv),
not one kernel per block.

VMEM dispatch ledger (measured-calibrated, see _ledger): the BACKWARD
kernel's scoped-VMEM footprint is modeled as 54*C*Co bytes of weight-grad
state (dW f32 revisit 36*C*Co + bf16 flipped kernel 18*C*Co) plus ~10
double-buffered bf16 main tiles and ~4 f32 Mosaic stack temporaries of
th*W*max(C,Co) elements each, gated at 13.5 MiB. Calibration point (r4
chip A/B): the C=512 en5 class measured 18.57 MiB scoped (>16 MiB Mosaic
limit) while its B=1 lowering PROBE passed — probes under-detect, so the
static ledger is the authoritative gate and probes are only a
toolchain-regression canary (ops/fused_block.fused_block_dispatch_ok).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_ACTS = ("none", "relu", "leaky02")


def _act(z, act: str):
    if act == "relu":
        return jnp.maximum(z, 0.0)
    if act == "leaky02":
        return jnp.where(z >= 0, z, 0.2 * z)
    return z


def _fwd_kernel(u_m, u_u, u_d, r_m, r_u, r_d, a_ref, b_ref, w_ref,
                y_ref, mom_ref, *, TH, W, act, n_h):
    """One (b, h-tile) step: prologue rows [iTH-1, iTH+TH], conv, moments.

    u_*: main (1,TH,W,C) + up/down single rows (1,1,W,C) of the prologue
    input; r_*: optional residual in the same 3-view layout (None when the
    op has no residual); a/b: (1,C) f32 prologue affine (identity = 1,0);
    w: (3,3,C,Co); y: (1,TH,W,Co) out; mom: (1,2,Co) f32 per-b revisit.
    """
    step = pl.program_id(0)
    i = step % n_h

    def pro(uref, rref):
        z = uref[0].astype(jnp.float32)
        z = z * a_ref[0][None, None, :] + b_ref[0][None, None, :]
        if rref is not None:
            z = z + rref[0].astype(jnp.float32)
        return _act(z, act)

    z_m = pro(u_m, r_m)                      # (TH, W, C)
    z_u = pro(u_u, r_u)                      # (1, W, C)
    z_d = pro(u_d, r_d)                      # (1, W, C)
    # conv zero padding applies to the post-prologue tensor: mask the halo
    # rows at the image top/bottom (their block index was clamped)
    z_u = jnp.where(i == 0, 0.0, z_u)
    z_d = jnp.where(i == n_h - 1, 0.0, z_d)
    z = jnp.concatenate([z_u, z_m, z_d], axis=0)     # (TH+2, W, C)
    z = jnp.pad(z, ((0, 0), (1, 1), (0, 0)))          # (TH+2, W+2, C)
    z = z.astype(u_m.dtype)

    C = z.shape[-1]
    Co = w_ref.shape[-1]
    acc = jnp.zeros((TH * W, Co), jnp.float32)
    for dh in range(3):
        for dw in range(3):
            win = z[dh:dh + TH, dw:dw + W, :].reshape(TH * W, C)
            acc += jnp.dot(win, w_ref[dh, dw],
                           preferred_element_type=jnp.float32)
    y_ref[0] = acc.reshape(TH, W, Co).astype(y_ref.dtype)

    # per-b moment accumulation (mom block revisits across this b's h-tiles)
    s1 = jnp.sum(acc, axis=0)
    s2 = jnp.sum(acc * acc, axis=0)

    @pl.when(i == 0)
    def _():
        mom_ref[0, 0] = s1
        mom_ref[0, 1] = s2

    @pl.when(i != 0)
    def _():
        mom_ref[0, 0] += s1
        mom_ref[0, 1] += s2


def _ledger(th: int, W: int, C: int, Co: int) -> int:
    """Conservative VMEM bytes for the BACKWARD kernel (the tight one):
    dW f32 revisit (36*C*Co) + bf16 flipped kernel (18*C*Co) + ~10
    double-buffered bf16 main tiles + ~4 f32-tile Mosaic stack
    temporaries. Calibrated on the r4 chip A/B: the C=512 en5 class
    measured 18.57M scoped (> 16M) while this model predicts 15.4M+ —
    gate at 13.5M for headroom."""
    tile = th * W * max(C, Co)
    return 54 * C * Co + 10 * tile * 2 + 4 * tile * 4


def _pick_th(H: int, W: int = 0, C: int = 0, Co: int = 0) -> Optional[int]:
    """Largest row-tile height dividing H (and, when W/C given, fitting
    the VMEM ledger)."""
    for th in (16, 8, 4):
        if H % th != 0:
            continue
        if W and _ledger(th, W, C, Co or C) > int(13.5 * 1024 * 1024):
            continue
        return th
    return None


def fused_conv3x3_fwd(u, w, a, b, r=None, act: str = "none"):
    """y = conv3x3_same(act(a*u + b [+ r]), w), plus per-b (sum, sumsq).

    u: (B,H,W,C) bf16/f32; w: (3,3,C,Co); a/b: (C,) f32 (identity: ones /
    zeros); r: optional (B,H,W,C) residual added pre-activation.
    Returns (y (B,H,W,Co), mom (B,2,Co) f32). Stride 1, SAME padding.
    """
    B, H, W, C = u.shape
    Co = w.shape[-1]
    assert act in _ACTS, act
    TH = _pick_th(H, W, C, Co)
    assert TH is not None, f"no viable row tile for {u.shape} (gate bug)"
    n_h = H // TH
    a2 = a.reshape(1, C).astype(jnp.float32)
    b2 = b.reshape(1, C).astype(jnp.float32)

    def im_main(s):
        return (s // n_h, s % n_h, 0, 0)

    def im_up(s):
        i = s % n_h
        return (s // n_h, jnp.maximum(i * TH - 1, 0), 0, 0)

    def im_dn(s):
        i = s % n_h
        return (s // n_h, jnp.minimum((i + 1) * TH, H - 1), 0, 0)

    spec_m = pl.BlockSpec((1, TH, W, C), im_main, memory_space=pltpu.VMEM)
    spec_u = pl.BlockSpec((1, 1, W, C), im_up, memory_space=pltpu.VMEM)
    spec_d = pl.BlockSpec((1, 1, W, C), im_dn, memory_space=pltpu.VMEM)
    spec_c = pl.BlockSpec((1, C), lambda s: (0, 0), memory_space=pltpu.VMEM)

    has_r = r is not None
    kern = functools.partial(_fwd_kernel, TH=TH, W=W, act=act, n_h=n_h)
    if not has_r:
        def kern_nr(u_m, u_u, u_d, a_ref, b_ref, w_ref, y_ref, mom_ref):
            return kern(u_m, u_u, u_d, None, None, None, a_ref, b_ref,
                        w_ref, y_ref, mom_ref)

    in_specs = [spec_m, spec_u, spec_d]
    args = [u, u, u]
    if has_r:
        in_specs += [spec_m, spec_u, spec_d]
        args += [r, r, r]
    in_specs += [spec_c, spec_c,
                 pl.BlockSpec((3, 3, C, Co), lambda s: (0, 0, 0, 0),
                              memory_space=pltpu.VMEM)]
    args += [a2, b2, w]

    y, mom = pl.pallas_call(
        kern if has_r else kern_nr,
        grid=(B * n_h,),
        in_specs=in_specs,
        out_specs=(
            pl.BlockSpec((1, TH, W, Co), im_main, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2, Co), lambda s: (s // n_h, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, H, W, Co), u.dtype),
            jax.ShapeDtypeStruct((B, 2, Co), jnp.float32),
        ),
        interpret=jax.default_backend() in ("cpu", "gpu"),
    )(*args)
    return y, mom


def _dact(z, act: str):
    """act'(z) evaluated at the PRE-activation z."""
    if act == "relu":
        return (z > 0).astype(jnp.float32)
    if act == "leaky02":
        return jnp.where(z > 0, 1.0, 0.2)
    return jnp.ones_like(z)


def _bwd_kernel(*refs, TH, W, n_h, act, finalize, emit_sums, has_carry):
    """One (b, h-tile) step of the fused conv3x3 backward.

    Computes, in one pass:
      dy   = A*g - C1 - ((y - MU2)*IS2)*C2      (BN-backward finalize of the
             downstream norm; identity when ``finalize`` is False)
      gout = conv3x3(dy_padded, Wf) * act'(a_z*u + b_z)   [+ carry]
             (the transpose conv: Wf is the flipped/transposed kernel)
      dW[dh,dw] += z_main^T @ dy_halo_window    (z = act(a_z*u + b_z))
      sums += (sum(gout'), sum(gout'*xhat_u))   per-b, where gout' is the
             pre-carry gout — the NEXT op's finalize constants and its
             gamma/beta grads (emit_sums).

    Halo rows come from the same 3-view trick as the forward; edge halo
    rows are ZERO (the gradient outside the image is zero — the transpose
    of the forward's zero padding)."""
    refs = list(refs)
    g_m, g_u, g_d = refs.pop(0), refs.pop(0), refs.pop(0)
    if finalize:
        y_m, y_u, y_d = refs.pop(0), refs.pop(0), refs.pop(0)
        fin_ref = refs.pop(0)        # (1, 4, Co): A, C1, MU2*IS2? no — rows
    u_m = refs.pop(0)                # (1, TH, W, C) prologue input (main)
    az_ref = refs.pop(0)             # (1, 2, C): a_z, b_z rows
    if emit_sums:
        xh_ref = refs.pop(0)         # (1, 2, C): mu_u, invsigma_u rows
    if has_carry:
        carry_m = refs.pop(0)        # (1, TH, W, C)
    wf_ref = refs.pop(0)             # (3, 3, Co, C) flipped kernel
    gout_ref = refs.pop(0)           # (1, TH, W, C)
    dw_ref = refs.pop(0)             # (3, 3, C, Co) f32, revisit-all
    sums_ref = refs.pop(0) if emit_sums else None   # (1, 2, C) per-b

    step = pl.program_id(0)
    i = step % n_h

    def dy_of(gref, yref):
        g = gref[0].astype(jnp.float32)
        if not finalize:
            return g
        A = fin_ref[0, 0][None, None, :]
        C1 = fin_ref[0, 1][None, None, :]
        C2 = fin_ref[0, 2][None, None, :]
        MU = fin_ref[0, 3][None, None, :]
        IS = fin_ref[0, 4][None, None, :]
        xhat = (yref[0].astype(jnp.float32) - MU) * IS
        return A * g - C1 - xhat * C2

    dy_m = dy_of(g_m, y_m if finalize else None)          # (TH, W, Co)
    dy_u = dy_of(g_u, y_u if finalize else None)          # (1, W, Co)
    dy_d = dy_of(g_d, y_d if finalize else None)
    dy_u = jnp.where(i == 0, 0.0, dy_u)
    dy_d = jnp.where(i == n_h - 1, 0.0, dy_d)
    dy = jnp.concatenate([dy_u, dy_m, dy_d], axis=0)      # (TH+2, W, Co)
    dy = jnp.pad(dy, ((0, 0), (1, 1), (0, 0)))            # (TH+2, W+2, Co)
    dyc = dy.astype(g_m.dtype)

    Co = dy.shape[-1]
    C = u_m.shape[-1]
    # transpose conv: gout_pre[h,w,ci] = sum dy[h+1-dh, w+1-dw, co] *
    # W[dh,dw,ci,co] = 9 shifted matmuls against the flipped kernel
    acc = jnp.zeros((TH * W, C), jnp.float32)
    for dh in range(3):
        for dw in range(3):
            win = dyc[dh:dh + TH, dw:dw + W, :].reshape(TH * W, Co)
            acc += jnp.dot(win, wf_ref[dh, dw],
                           preferred_element_type=jnp.float32)

    uz = u_m[0].astype(jnp.float32)
    a_z = az_ref[0, 0][None, None, :]
    b_z = az_ref[0, 1][None, None, :]
    n_z = uz * a_z + b_z
    gout = acc.reshape(TH, W, C) * _dact(n_z, act)

    if emit_sums:
        mu_u = xh_ref[0, 0][None, None, :]
        is_u = xh_ref[0, 1][None, None, :]
        xhat_u = (uz - mu_u) * is_u
        s1 = jnp.sum(gout, axis=(0, 1))
        s2 = jnp.sum(gout * xhat_u, axis=(0, 1))

        @pl.when(i == 0)
        def _():
            sums_ref[0, 0] = s1
            sums_ref[0, 1] = s2

        @pl.when(i != 0)
        def _():
            sums_ref[0, 0] += s1
            sums_ref[0, 1] += s2

    if has_carry:
        gout = gout + carry_m[0].astype(jnp.float32)
    gout_ref[0] = gout.astype(gout_ref.dtype)

    # weight grad: dW[dh,dw,ci,co] = sum_hw z[h,w,ci] dy[h-dh+1, w-dw+1, co]
    # with z the MAIN tile and dy the halo window at offset (2-dh, 2-dw)
    z = _act(n_z, act).astype(g_m.dtype)
    zf = z.reshape(TH * W, C)

    @pl.when(step == 0)
    def _():
        dw_ref[...] = jnp.zeros_like(dw_ref)

    for dh in range(3):
        for dw in range(3):
            win = dyc[2 - dh:2 - dh + TH, 2 - dw:2 - dw + W, :] \
                .reshape(TH * W, Co)
            dw_ref[dh, dw] += jax.lax.dot_general(
                zf, win, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)


def fused_conv3x3_bwd(g, u, wf, a_z, b_z, y=None, fin=None, xh=None,
                      carry=None, act: str = "none"):
    """Backward brick for one fused conv op (see _bwd_kernel).

    g: (B,H,W,Co) downstream grad (pre-finalize when ``fin`` given);
    u: (B,H,W,C) this op's prologue input; wf: (3,3,Co,C) FLIPPED kernel
    (w[::-1, ::-1].swapaxes(2, 3)); a_z/b_z: (B,C) f32 prologue affine (the
    z recompute); y: (B,H,W,Co) this op's conv output (finalize only);
    fin: (B,5,Co) f32 finalize rows [A, C1, C2, MU2, IS2]; xh: (B,2,C)
    f32 [mu_u, invsigma_u] -> emit per-b sums; carry: (B,H,W,C) added to
    gout. Returns (gout, dW f32 (3,3,C,Co), sums (B,2,C) f32 | None).
    """
    B, H, W, Co = g.shape
    C = u.shape[-1]
    TH = _pick_th(H, W, C, Co)
    assert TH is not None
    n_h = H // TH
    finalize = fin is not None
    emit_sums = xh is not None
    has_carry = carry is not None

    def im_main(s):
        return (s // n_h, s % n_h, 0, 0)

    def im_up(s):
        return (s // n_h, jnp.maximum((s % n_h) * TH - 1, 0), 0, 0)

    def im_dn(s):
        return (s // n_h, jnp.minimum(((s % n_h) + 1) * TH, H - 1), 0, 0)

    def spec3(ch):
        return [pl.BlockSpec((1, TH, W, ch), im_main,
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, W, ch), im_up, memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, W, ch), im_dn, memory_space=pltpu.VMEM)]

    def row_spec(rows, ch):
        return pl.BlockSpec((1, rows, ch), lambda s: (s // n_h, 0, 0),
                            memory_space=pltpu.VMEM)

    in_specs = spec3(Co)
    args = [g, g, g]
    if finalize:
        in_specs += spec3(Co)
        args += [y, y, y]
        in_specs.append(row_spec(5, Co))
        args.append(fin.astype(jnp.float32))
    in_specs.append(pl.BlockSpec((1, TH, W, C), im_main,
                                 memory_space=pltpu.VMEM))
    args.append(u)
    azb = jnp.stack([a_z, b_z], axis=1).astype(jnp.float32)   # (B,2,C)
    in_specs.append(row_spec(2, C))
    args.append(azb)
    if emit_sums:
        in_specs.append(row_spec(2, C))
        args.append(xh.astype(jnp.float32))
    if has_carry:
        in_specs.append(pl.BlockSpec((1, TH, W, C), im_main,
                                     memory_space=pltpu.VMEM))
        args.append(carry)
    in_specs.append(pl.BlockSpec((3, 3, Co, C), lambda s: (0, 0, 0, 0),
                                 memory_space=pltpu.VMEM))
    args.append(wf)

    out_specs = [
        pl.BlockSpec((1, TH, W, C), im_main, memory_space=pltpu.VMEM),
        pl.BlockSpec((3, 3, C, Co), lambda s: (0, 0, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    out_shape = [jax.ShapeDtypeStruct((B, H, W, C), g.dtype),
                 jax.ShapeDtypeStruct((3, 3, C, Co), jnp.float32)]
    if emit_sums:
        out_specs.append(pl.BlockSpec((1, 2, C), lambda s: (s // n_h, 0, 0),
                                      memory_space=pltpu.VMEM))
        out_shape.append(jax.ShapeDtypeStruct((B, 2, C), jnp.float32))

    kern = functools.partial(_bwd_kernel, TH=TH, W=W, n_h=n_h, act=act,
                             finalize=finalize, emit_sums=emit_sums,
                             has_carry=has_carry)
    res = pl.pallas_call(
        kern,
        grid=(B * n_h,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=jax.default_backend() in ("cpu", "gpu"),
    )(*args)
    if emit_sums:
        return res
    return res[0], res[1], None


def reference_fwd(u, w, a, b, r=None, act: str = "none"):
    """Pure-XLA reference of fused_conv3x3_fwd (tests + CPU fallback)."""
    z = u.astype(jnp.float32) * a[None, None, None, :] \
        + b[None, None, None, :]
    if r is not None:
        z = z + r.astype(jnp.float32)
    z = _act(z, act).astype(u.dtype)
    y = jax.lax.conv_general_dilated(
        z, w.astype(u.dtype), (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    yf = y.astype(jnp.float32)
    mom = jnp.stack([jnp.sum(yf, axis=(1, 2)),
                     jnp.sum(yf * yf, axis=(1, 2))], axis=1)
    return y, mom
