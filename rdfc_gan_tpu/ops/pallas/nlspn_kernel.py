"""Pallas TPU kernel: NLSPN stencil propagation fully resident in VMEM.

The gather-free stencil formulation (ops/nlspn_stencil.py) turns each of the
``prop_time`` refinement iterations into |S|^2 fused multiply-adds of
statically shifted feature planes. This kernel keeps the feature map, the
padded scratch AND the whole per-shift mask stack in VMEM across ALL
iterations — one HBM read of the masks total, versus one per iteration for
the XLA scan (and versus 26 separate CUDA kernel launches with full HBM
round-trips in the reference, modulated_deform_conv_cuda.cu).

VMEM budget at (224, 304), R=2 (S=8): masks 8*8*H*W bf16 ≈ 8.3 MiB + padded
scratch/accumulator ≈ 0.6 MiB — fits the ~16 MiB/core budget. Larger R or
resolutions should drop to the XLA stencil (auto fallback in nlspn_propagate
dispatcher).

Gradients: ``nlspn_stencil_propagate_pallas`` carries a custom_vjp whose
backward re-runs the mathematically identical XLA stencil under jax.vjp —
deterministic gather-free transpose (the CUDA backward needs atomicAdd
scatter; SURVEY.md §5 race-detection row).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..nlspn_stencil import shift_window, stencil_propagate


def _kernel(feat_ref, M_ref, *rest,
            T: int, S: int, lo: int, pad: int, preserve: bool,
            emit_x: bool = False):
    """Propagation chain; with ``emit_x`` also stores X[t] = the
    (substituted) step-t input — the residual stack the hand-written
    backward's mask-gradient contraction needs (ops/nlspn_stencil.
    _prop_bwd phase 2). Emitting it in the forward lets the backward skip
    the XLA forward-recompute scan entirely (T more HBM reads of the mask
    stack). One body for both variants so the differentiated forward can
    never drift from the primal.

    ``preserve`` toggles the fix/fixmask refs entirely: when False they are
    NOT kernel arguments — at (224,304,S=8) the two (1,H,W) f32 blocks cost
    ~1.1 MiB double-buffered, and the emit_x variant sat 92 KiB over
    Mosaic's 16 MiB scoped-VMEM limit with them (PERF_AB r4 NLSPN A/B)."""
    rest = list(rest)
    fix_ref = rest.pop(0) if preserve else None
    fixmask_ref = rest.pop(0) if preserve else None
    out_ref = rest.pop(0)
    x_ref = rest[0] if emit_x else None
    fp, fx, acc = rest[-3:]
    H, W = feat_ref.shape[1], feat_ref.shape[2]
    # zero the padded scratch once; borders stay zero (CUDA zero-pad parity)
    fp[...] = jnp.zeros_like(fp)
    acc[...] = feat_ref[0].astype(jnp.float32)

    def body(t, _):
        feat = acc[...]
        if preserve:
            feat = jnp.where(fixmask_ref[0] != 0, fix_ref[0], feat)
        if emit_x:
            x_ref[t, 0] = feat.astype(x_ref.dtype)
        fp[pad:pad + H, pad:pad + W] = feat
        # in-place ref accumulation: a functional acc chain keeps all S*S
        # unrolled slice temporaries live on the Mosaic stack (VMEM OOM).
        # Shift factoring: a W-shift (lane axis) is an expensive unaligned
        # vector op, an H-shift (sublane axis) is cheap — hoist the S lane
        # shifts out of the S*S tap loop (one (H+2p, W) column copy per ix)
        # so the S*S multiply-adds all run lane-ALIGNED. Measured 4x on the
        # chip vs the direct 2-D slice form (docs/PERF_NOTES.md round 5).
        acc[...] = jnp.zeros((H, W), jnp.float32)
        for ix in range(S):
            dx = lo + ix
            fx[...] = fp[:, pad + dx:pad + dx + W]
            for iy in range(S):
                dy = lo + iy
                m = M_ref[0, iy, ix].astype(jnp.float32)
                acc[...] += m * fx[pad + dy:pad + dy + H, :]
        return 0

    jax.lax.fori_loop(0, T, body, 0)
    out_ref[0] = acc[...]


def _chain_kernel(g_ref, M_ref, *rest, T: int, S: int, lo: int, pad: int,
                  preserve: bool):
    """Reverse gradient chain with the mask stack VMEM-resident.

    Phase 1 of the two-phase O(T) backward (ops/nlspn_stencil._prop_bwd):
    iterate t = T-1..0, emitting G[t] (the gradient w.r.t. the step-t
    output) and chaining gg <- stencil^T(gg) with the preserve-mask
    substitution. The XLA scan form re-reads the (S,S,H,W) mask stack from
    HBM on every one of the T steps; here it is read once per batch item.

    The transpose uses scatter-into-padded-accumulator form: the forward
    reads shifted windows of a padded x, so its transpose adds M_s*gg into
    the SAME padded windows and keeps only the center (out-of-image
    contributions land in the border and are discarded — the transpose of
    zero-padding). As in ``_kernel``, ``preserve`` toggles the fixmask
    input / dfix output / dfix scratch out of the argument list entirely
    (VMEM budget)."""
    rest = list(rest)
    fixmask_ref = rest.pop(0) if preserve else None
    gout_ref = rest.pop(0)
    dfeat_ref = rest.pop(0)
    dfix_ref = rest.pop(0) if preserve else None
    accp = rest.pop(0)
    tacc = rest.pop(0)
    gg = rest.pop(0)
    dfix_acc = rest.pop(0) if preserve else None
    H, W = g_ref.shape[1], g_ref.shape[2]
    gg[...] = g_ref[0].astype(jnp.float32)
    if preserve:
        dfix_acc[...] = jnp.zeros_like(dfix_acc)

    def body(i, _):
        t = T - 1 - i
        gout_ref[t, 0] = gg[...].astype(gout_ref.dtype)
        accp[...] = jnp.zeros_like(accp)
        # same shift factoring as the forward kernel: accumulate the S
        # sublane (H) shifts into a column-aligned (H+2p, W) buffer, then
        # commit each column group with ONE unaligned lane-shifted add
        for ix in range(S):
            dx = lo + ix
            tacc[...] = jnp.zeros_like(tacc)
            for iy in range(S):
                dy = lo + iy
                m = M_ref[0, iy, ix].astype(jnp.float32)
                tacc[pad + dy:pad + dy + H, :] += m * gg[...]
            accp[:, pad + dx:pad + dx + W] += tacc[...]
        dx_c = accp[pad:pad + H, pad:pad + W]
        if preserve:
            fm = fixmask_ref[0] != 0
            dfix_acc[...] += jnp.where(fm, dx_c, 0.0)
            dx_c = jnp.where(fm, 0.0, dx_c)
        gg[...] = dx_c
        return 0

    jax.lax.fori_loop(0, T, body, 0)
    dfeat_ref[0] = gg[...]
    if preserve:
        dfix_ref[0] = dfix_acc[...]


def _plane_spec(H, W):
    return pl.BlockSpec((1, H, W), lambda b: (b, 0, 0),
                        memory_space=pltpu.VMEM)


def _pallas_forward_x(feat0, M, fix, fixmask, T: int, R: int,
                      preserve: bool, x_dtype):
    B, H, W = feat0.shape
    lo, hi = shift_window(R)
    S = hi - lo + 1
    pad = max(-lo, hi)

    kernel = functools.partial(_kernel, T=T, S=S, lo=lo, pad=pad,
                               preserve=preserve, emit_x=True)
    in_specs = [
        _plane_spec(H, W),
        pl.BlockSpec((1, S, S, H, W), lambda b: (b, 0, 0, 0, 0),
                     pipeline_mode=pl.Buffered(buffer_count=1),
                     memory_space=pltpu.VMEM),
    ]
    args = [feat0, M]
    if preserve:
        in_specs += [_plane_spec(H, W), _plane_spec(H, W)]
        args += [fix, fixmask]
    return pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=in_specs,
        out_specs=[
            _plane_spec(H, W),
            # X written directly in shift_correlation's (T,B,H,W) layout;
            # single-buffered: the stack is ~T/2 x the mask budget and its
            # DMA-out (~us) is noise next to the T-step chain compute
            pl.BlockSpec((T, 1, H, W), lambda b: (0, b, 0, 0),
                         pipeline_mode=pl.Buffered(buffer_count=1),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[jax.ShapeDtypeStruct((B, H, W), jnp.float32),
                   jax.ShapeDtypeStruct((T, B, H, W), x_dtype)],
        scratch_shapes=[pltpu.VMEM((H + 2 * pad, W + 2 * pad), jnp.float32),
                        pltpu.VMEM((H + 2 * pad, W), jnp.float32),
                        pltpu.VMEM((H, W), jnp.float32)],
    )(*args)


def _pallas_reverse_chain(g0, M, fixmask, T: int, R: int, preserve: bool,
                          g_dtype):
    B, H, W = g0.shape
    lo, hi = shift_window(R)
    S = hi - lo + 1
    pad = max(-lo, hi)

    kernel = functools.partial(_chain_kernel, T=T, S=S, lo=lo, pad=pad,
                               preserve=preserve)
    in_specs = [
        _plane_spec(H, W),
        pl.BlockSpec((1, S, S, H, W), lambda b: (b, 0, 0, 0, 0),
                     pipeline_mode=pl.Buffered(buffer_count=1),
                     memory_space=pltpu.VMEM),
    ]
    args = [g0, M]
    out_specs = [
        pl.BlockSpec((T, 1, H, W), lambda b: (0, b, 0, 0),
                     pipeline_mode=pl.Buffered(buffer_count=1),
                     memory_space=pltpu.VMEM),
        _plane_spec(H, W),
    ]
    out_shape = [jax.ShapeDtypeStruct((T, B, H, W), g_dtype),
                 jax.ShapeDtypeStruct((B, H, W), jnp.float32)]
    scratch = [pltpu.VMEM((H + 2 * pad, W + 2 * pad), jnp.float32),
               pltpu.VMEM((H + 2 * pad, W), jnp.float32),
               pltpu.VMEM((H, W), jnp.float32)]
    if preserve:
        in_specs.append(_plane_spec(H, W))
        args.append(fixmask)
        out_specs.append(_plane_spec(H, W))
        out_shape.append(jax.ShapeDtypeStruct((B, H, W), jnp.float32))
        scratch.append(pltpu.VMEM((H, W), jnp.float32))
    res = pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=scratch,
    )(*args)
    if preserve:
        return res
    G, dfeat = res
    return G, dfeat, jnp.zeros_like(dfeat)


def _bwd_kernels_fit(H: int, W: int, S: int, T: int, pad: int,
                     stack_bytes: int, preserve: bool) -> bool:
    """VMEM ledger for the forward+X / reverse-chain kernels, calibrated
    against Mosaic's reported scoped allocation at (8,224,304,S=8,T=18,
    preserve=False): ledger 12.8 MiB, Mosaic 15.0 MiB -> ~2.2 MiB of
    Mosaic stack temporaries (the S^2 unrolled slice multiplies). Budget
    2.75 MiB of headroom under the 16 MiB scoped limit."""
    plane = H * W * 4
    ledger = (S * S * H * W * 2                      # mask stack (single)
              + T * H * W * stack_bytes              # X / G stack (single)
              + 2 * 2 * plane                        # in g0/feat + out plane
              + (H + 2 * pad) * (W + 2 * pad) * 4    # padded scratch
              + (H + 2 * pad) * W * 4                # column-shift scratch
              + plane)                               # acc scratch
    if preserve:
        ledger += 2 * 2 * plane + 2 * plane  # fix+fixmask in, dfix out+acc
    return ledger + int(2.75 * 1024 * 1024) < 16 * 1024 * 1024


def _pallas_forward(feat0, M, fix, fixmask, T: int, R: int, preserve: bool):
    B, H, W = feat0.shape
    lo, hi = shift_window(R)
    S = hi - lo + 1
    pad = max(-lo, hi)

    kernel = functools.partial(_kernel, T=T, S=S, lo=lo, pad=pad,
                               preserve=preserve)
    in_specs = [
        _plane_spec(H, W),
        # single-buffer the mask stack: it is the VMEM budget (~8.7 MiB
        # bf16 at 224x304); double-buffered prefetch of the next batch
        # item's masks would double it and blow the 16 MiB budget. Its
        # DMA (~10 us) is negligible vs the T-step compute.
        pl.BlockSpec((1, S, S, H, W), lambda b: (b, 0, 0, 0, 0),
                     pipeline_mode=pl.Buffered(buffer_count=1),
                     memory_space=pltpu.VMEM),
    ]
    args = [feat0, M]
    if preserve:
        in_specs += [_plane_spec(H, W), _plane_spec(H, W)]
        args += [fix, fixmask]
    return pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=in_specs,
        out_specs=_plane_spec(H, W),
        out_shape=jax.ShapeDtypeStruct((B, H, W), jnp.float32),
        scratch_shapes=[pltpu.VMEM((H + 2 * pad, W + 2 * pad), jnp.float32),
                        pltpu.VMEM((H + 2 * pad, W), jnp.float32),
                        pltpu.VMEM((H, W), jnp.float32)],
    )(*args)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def nlspn_stencil_propagate_pallas(feat_init, M, feat_fix, prop_time: int,
                                   R: int = 2, preserve_input: bool = False):
    """feat_init: (B,H,W,1); M: (B,S,S,H,W); feat_fix: (B,H,W,1) (ignored
    unless preserve_input). Returns (B,H,W,1) float32."""
    B, H, W, _ = feat_init.shape
    feat0 = feat_init[..., 0].astype(jnp.float32)
    fix = feat_fix[..., 0].astype(jnp.float32)
    fixmask = (fix > 0.0).astype(jnp.float32)
    out = _pallas_forward(feat0, M.astype(jnp.bfloat16), fix, fixmask,
                          prop_time, R, preserve_input)
    return out[..., None].astype(feat_init.dtype)


def _stack_dtype(M):
    return jnp.bfloat16 if M.dtype == jnp.bfloat16 else jnp.float32


# lowering self-probe verdicts for the backward kernels, keyed per kernel
# INSTANTIATION (H, W, S, T, preserve, stack dtype) — a global verdict from
# a toy shape can pass while the real shape fails (the r4 fused-block B=1
# probe lesson; ADVICE r3). The probe compiles the REAL requested shape of
# the isolated reverse-chain kernel (seconds, once per shape class); a
# failure falls back to the XLA two-phase VJP for that shape only.
_BWD_LOWERING_OK: dict = {}


def _bwd_lowering_ok(H: int, W: int, R: int, T: int, preserve: bool,
                     stack_dtype) -> bool:
    lo, hi = shift_window(R)
    S = hi - lo + 1
    key = (H, W, S, T, preserve, jnp.dtype(stack_dtype).name)
    if key not in _BWD_LOWERING_OK:
        try:
            g0 = jnp.zeros((1, H, W), jnp.float32)
            M = jnp.zeros((1, S, S, H, W), jnp.bfloat16)
            fm = jnp.zeros((1, H, W), jnp.float32)
            jax.jit(lambda a, b, c: _pallas_reverse_chain(
                a, b, c, T, R, preserve, stack_dtype)[0]) \
                .lower(g0, M, fm).compile()
            _BWD_LOWERING_OK[key] = True
        except Exception as e:  # pragma: no cover - chip/toolchain specific
            import sys

            print(f"nlspn_kernel: backward probe failed to compile at "
                  f"{key} ({type(e).__name__}); using the XLA two-phase "
                  f"VJP for this shape", file=sys.stderr)
            _BWD_LOWERING_OK[key] = False
    return _BWD_LOWERING_OK[key]


def _use_pallas_bwd(M, prop_time, R, preserve):
    import os

    if os.environ.get("RDFC_DISABLE_PALLAS_NLSPN_BWD"):  # escape hatch
        return False
    lo, hi = shift_window(R)
    S, pad = hi - lo + 1, max(-lo, hi)
    H, W = M.shape[3], M.shape[4]
    if not _bwd_kernels_fit(H, W, S, prop_time, pad,
                            jnp.dtype(_stack_dtype(M)).itemsize, preserve):
        return False
    if jax.default_backend() in ("cpu", "gpu"):
        # only reachable with interpret-mode pallas monkeypatched in
        # (the primal dispatch already gated on TPU) — no probe needed
        return True
    return _bwd_lowering_ok(H, W, R, prop_time, preserve, _stack_dtype(M))


def _fwd(feat_init, M, feat_fix, prop_time, R, preserve_input):
    if _use_pallas_bwd(M, prop_time, R, preserve_input):
        # emit the per-step input stack X from the forward kernel itself:
        # the backward then needs NO forward-recompute scan (T fewer HBM
        # reads of the mask stack) — X is the only residual phase 2 reads.
        feat0 = feat_init[..., 0].astype(jnp.float32)
        fix = feat_fix[..., 0].astype(jnp.float32)
        fixmask = (fix > 0.0).astype(jnp.float32)
        out, X = _pallas_forward_x(feat0, M.astype(jnp.bfloat16), fix,
                                   fixmask, prop_time, R, preserve_input,
                                   _stack_dtype(M))
        return out[..., None].astype(feat_init.dtype), (X, M, feat_fix)
    out = nlspn_stencil_propagate_pallas(feat_init, M, feat_fix, prop_time,
                                         R, preserve_input)
    return out, (feat_init, M, feat_fix)


def _bwd(prop_time, R, preserve_input, res, g):
    first, M, feat_fix = res
    if _use_pallas_bwd(M, prop_time, R, preserve_input):
        from .mask_kernel import shift_correlation

        X = first  # (T,B,H,W) residual stack from _pallas_forward_x
        B, S, H, W = M.shape[0], M.shape[1], M.shape[3], M.shape[4]
        lo, _ = shift_window(R)
        g0 = g[..., 0].astype(jnp.float32)
        fix = feat_fix[..., 0].astype(jnp.float32)
        fixmask = (fix > 0.0).astype(jnp.float32)
        G, dfeat0, dfix = _pallas_reverse_chain(
            g0, M.astype(jnp.bfloat16), fixmask, prop_time, R,
            preserve_input, _stack_dtype(M))
        dM = shift_correlation(G, X, S, lo, out_dtype=jnp.float32)
        dfeat = dfeat0[..., None].astype(g.dtype)
        if preserve_input:
            dfix_out = dfix[..., None].astype(feat_fix.dtype)
        else:
            dfix_out = jnp.zeros_like(feat_fix)
        return dfeat, dM.reshape(B, S, S, H, W).astype(M.dtype), dfix_out

    feat_init = first

    def ref(feat_init, M, feat_fix):
        # match the executed forward exactly: the Pallas kernel rounds the
        # mask stack to bf16 (VMEM budget), so the differentiated function
        # must see the same rounded masks (ADVICE round-1 #3). The bf16
        # round-trip is treated as identity by AD (straight-through), which
        # is the gradient of the function the forward actually computed.
        M16 = M.astype(jnp.bfloat16).astype(M.dtype)
        return stencil_propagate(feat_init, M16, prop_time, R,
                                 feat_fix=feat_fix,
                                 preserve_input=preserve_input)

    _, vjp = jax.vjp(ref, feat_init, M, feat_fix)
    return vjp(g.astype(feat_init.dtype))


nlspn_stencil_propagate_pallas.defvjp(_fwd, _bwd)


def propagate_auto(feat_init, M, prop_time: int, R: int = 2,
                   feat_fix: Optional[jnp.ndarray] = None,
                   preserve_input: bool = False,
                   use_pallas: str = "auto"):
    """Dispatch: Pallas kernel on TPU when the mask stack fits VMEM, else the
    pure-XLA stencil. ``use_pallas``: auto | always | never."""
    B, H, W, _ = feat_init.shape
    lo, hi = shift_window(R)
    S = hi - lo + 1
    pad = max(-lo, hi)
    vmem_need = S * S * H * W * 2 + 3 * (H + 2 * pad) * (W + 2 * pad) * 4
    on_tpu = jax.default_backend() not in ("cpu", "gpu")
    ok = use_pallas == "always" or (
        use_pallas == "auto" and on_tpu and vmem_need < 12 * 1024 * 1024)
    if ok:
        fix = feat_fix if feat_fix is not None else jnp.zeros_like(feat_init)
        return nlspn_stencil_propagate_pallas(feat_init, M, fix, prop_time,
                                              R, preserve_input)
    return stencil_propagate(feat_init, M, prop_time, R, feat_fix=feat_fix,
                             preserve_input=preserve_input)
