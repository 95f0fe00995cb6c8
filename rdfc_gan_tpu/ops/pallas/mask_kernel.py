"""Pallas TPU kernels for the NLSPN shift-mask build (scatter) and its
gradient (gather).

``build_shift_masks`` (ops/nlspn_stencil.py) folds per-tap bilinear-corner
weights into per-shift mask planes:

    M[b, s, h, w] = sum_k w[b, k, h, w] * [sidx[b, k, h, w] == s]

The pure-XLA formulation is a one-hot matmul ("bhwk,bhwks->bshw"), which
materializes a (B,H,W,K,S*S) one-hot intermediate (~2.5 GB bf16 at
bs8/224x304/K=36/S=8) in HBM on every build — and the build runs once per
forward plus once per local-remat recompute. These kernels do the scatter /
gather as VPU compare-selects on VMEM tiles: the only HBM traffic is w,
sy/sx, and M themselves (~130 MB total), ~50x less.

The shift index is passed decomposed (sy, sx with sidx = sy*S + sx) so the
kernel compares against small unrolled constants instead of dividing.

Reference op being accelerated: the affinity normalization + im2col scatter
of nlspn_model.py:96-138 (there fused into the CUDA deformable conv).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# test hook: force the Pallas path even on CPU (with interpret-mode
# pallas_call monkeypatched in) so the kernels are exercised in-suite
_FORCE_PALLAS = False


def _scatter_kernel(w_ref, sy_ref, sx_ref, out_ref, acc, *, K: int, S: int):
    acc[...] = jnp.zeros_like(acc)

    def body(k, _):
        wk = w_ref[0, k].astype(jnp.float32)
        syk = sy_ref[0, k]
        sxk = sx_ref[0, k]
        for iy in range(S):
            ty = jnp.where(syk == iy, wk, 0.0)
            for ix in range(S):
                acc[iy * S + ix] += jnp.where(sxk == ix, ty, 0.0)
        return 0

    jax.lax.fori_loop(0, K, body, 0)
    out_ref[0] = acc[...].astype(out_ref.dtype)


def _gather_kernel(dm_ref, sy_ref, sx_ref, out_ref, *, K: int, S: int):
    dm = dm_ref[0].astype(jnp.float32)  # (S*S, bh, W)

    def body(k, _):
        syk = sy_ref[0, k]
        sxk = sx_ref[0, k]
        dwk = jnp.zeros(syk.shape, jnp.float32)
        for iy in range(S):
            hy = syk == iy
            for ix in range(S):
                dwk = jnp.where(hy & (sxk == ix), dm[iy * S + ix], dwk)
        out_ref[0, k] = dwk.astype(out_ref.dtype)
        return 0

    jax.lax.fori_loop(0, K, body, 0)


def _block_h(H: int, bytes_per_row: int = 0,
             budget: int = 10 * 1024 * 1024) -> int:
    """Largest row-tile height dividing H whose VMEM ledger fits ``budget``
    (in/out blocks double-buffered by the Pallas pipeline + scratch).
    Bigger tiles amortize the per-grid-step overhead of these elementwise
    kernels — bh=8 measured ~2x slower than bh=28 at 224x304 (PERF_NOTES
    round 5). ``bytes_per_row``=0 keeps the legacy bh<=8 behavior."""
    for bh in (32, 28, 16, 14, 8, 7, 4, 2, 1):
        if bh > 8 and (not bytes_per_row or bh * bytes_per_row > budget):
            continue
        if H % bh == 0:
            return bh
    return 1


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def scatter_shift_masks(w: jnp.ndarray, sy: jnp.ndarray, sx: jnp.ndarray,
                        S: int) -> jnp.ndarray:
    """M[b,s,h,w] = sum_k w[b,k,h,w] * [sy[b,k,h,w]*S + sx[b,k,h,w] == s].

    w: (B,K,H,W) float; sy/sx: (B,K,H,W) int32 in [0,S). Returns
    (B,S*S,H,W) in w.dtype. Out-of-range sy/sx never match and contribute
    nothing (callers clamp offsets first, so they cannot occur anyway).
    """
    return _scatter_fwd_impl(w, sy, sx, S)


def _scatter_fwd_impl(w, sy, sx, S):
    B, K, H, W = w.shape
    if jax.default_backend() in ("cpu", "gpu") and not _FORCE_PALLAS:
        sidx = sy * S + sx  # (B,K,H,W)
        onehot = jax.nn.one_hot(sidx, S * S, dtype=w.dtype, axis=1)
        return jnp.einsum("bkhw,bskhw->bshw", w, onehot,
                          preferred_element_type=jnp.float32).astype(w.dtype)
    # per-row ledger: w/sy/sx in-blocks + M out-block (double-buffered) +
    # the f32 accumulator scratch
    row = (2 * K * W * (w.dtype.itemsize + 8)
           + 2 * S * S * W * w.dtype.itemsize + S * S * W * 4)
    bh = _block_h(H, row)
    kernel = functools.partial(_scatter_kernel, K=K, S=S)
    return pl.pallas_call(
        kernel,
        grid=(B, H // bh),
        in_specs=[
            pl.BlockSpec((1, K, bh, W), lambda b, h: (b, 0, h, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, K, bh, W), lambda b, h: (b, 0, h, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, K, bh, W), lambda b, h: (b, 0, h, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, S * S, bh, W), lambda b, h: (b, 0, h, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, S * S, H, W), w.dtype),
        scratch_shapes=[pltpu.VMEM((S * S, bh, W), jnp.float32)],
    )(w, sy, sx)


def _scatter_fwd(w, sy, sx, S):
    # residuals must be JAX types: carry a 0-size token for w's dtype
    return _scatter_fwd_impl(w, sy, sx, S), (sy, sx, jnp.zeros((0,), w.dtype))


def _scatter_bwd(S, res, dM):
    sy, sx, wtok = res
    wdt = wtok.dtype
    B, K, H, W = sy.shape
    if jax.default_backend() in ("cpu", "gpu") and not _FORCE_PALLAS:
        sidx = sy * S + sx
        dw = jnp.take_along_axis(dM, sidx, axis=1, mode="clip")
        return dw.astype(wdt), None, None
    row = (2 * (S * S * W * dM.dtype.itemsize + K * W * 8)
           + 2 * K * W * jnp.dtype(wdt).itemsize)
    bh = _block_h(H, row)
    kernel = functools.partial(_gather_kernel, K=K, S=S)
    dw = pl.pallas_call(
        kernel,
        grid=(B, H // bh),
        in_specs=[
            pl.BlockSpec((1, S * S, bh, W), lambda b, h: (b, 0, h, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, K, bh, W), lambda b, h: (b, 0, h, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, K, bh, W), lambda b, h: (b, 0, h, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, K, bh, W), lambda b, h: (b, 0, h, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, K, H, W), wdt),
    )(dM, sy, sx)
    return dw, None, None


scatter_shift_masks.defvjp(_scatter_fwd, _scatter_bwd)


def _corr_kernel(g_ref, xp_ref, out_ref, acc, xs, *, T: int, S: int,
                 lo: int, pad: int, bh: int, W: int):
    acc[...] = jnp.zeros_like(acc)

    def body(t, _):
        g = g_ref[t, 0]      # (bh, W)
        xp = xp_ref[t, 0]    # (bh + 2*pad, W + 2*pad)
        # lane-shift factoring (see nlspn_kernel._kernel): one unaligned
        # column copy per ix, then S lane-aligned multiply-adds over it
        for ix in range(S):
            rx = pad + lo + ix
            xs[...] = xp[:, rx:rx + W]
            for iy in range(S):
                ry = pad + lo + iy
                acc[iy * S + ix] += g * xs[ry:ry + bh, :]
        return 0

    jax.lax.fori_loop(0, T, body, 0)
    out_ref[0] = acc[...].astype(out_ref.dtype)


def shift_correlation(G: jnp.ndarray, X: jnp.ndarray, S: int, lo: int,
                      out_dtype=jnp.float32) -> jnp.ndarray:
    """dM[b, iy*S+ix, h, w] = sum_t G[t,b,h,w] * X[t,b,h+lo+iy,w+lo+ix]
    with zero padding out of range — the mask-gradient contraction of the
    NLSPN propagation backward (phase 2 of ops/nlspn_stencil._prop_bwd).

    G, X: (T,B,H,W). Returns (B,S*S,H,W) in out_dtype. The XLA fallback is
    S*S sliced reductions, each re-streaming G and X (~5 GB at
    bs8/224x304/T=18); the kernel reads both once per (b, row-tile) and
    keeps the 64-plane accumulator in VMEM.
    """
    T, B, H, W = G.shape
    hi = lo + S - 1
    pad = max(-lo, hi)
    Xp = jnp.pad(X, ((0, 0), (0, 0), (pad, pad), (pad, pad)))
    if jax.default_backend() in ("cpu", "gpu") and not _FORCE_PALLAS:
        planes = []
        for iy in range(S):
            for ix in range(S):
                dy, dx = lo + iy, lo + ix
                planes.append(jnp.sum(
                    G * Xp[:, :, pad + dy: pad + dy + H,
                           pad + dx: pad + dx + W], axis=0))
        return jnp.stack(planes, axis=1).astype(out_dtype)
    row = (2 * T * W * (G.dtype.itemsize + Xp.dtype.itemsize)
           + 3 * S * S * W * 4)  # g+xp blocks (2x), acc scratch + out
    bh = _block_h(H, row)
    kernel = functools.partial(_corr_kernel, T=T, S=S, lo=lo, pad=pad,
                               bh=bh, W=W)
    return pl.pallas_call(
        kernel,
        grid=(B, H // bh),
        in_specs=[
            pl.BlockSpec((T, 1, bh, W), lambda b, h: (0, b, h, 0),
                         memory_space=pltpu.VMEM),
            # Mosaic requires every dim of a spec to be Element when any is:
            # express the halo'd row window with all-Element dims (index_map
            # then returns ELEMENT offsets on every axis)
            pl.BlockSpec((pl.Element(T), pl.Element(1),
                          pl.Element(bh + 2 * pad), pl.Element(W + 2 * pad)),
                         lambda b, h: (0, b, h * bh, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, S * S, bh, W), lambda b, h: (b, 0, h, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, S * S, H, W), out_dtype),
        scratch_shapes=[pltpu.VMEM((S * S, bh, W), jnp.float32),
                        pltpu.VMEM((bh + 2 * pad, W), Xp.dtype)],
    )(G, Xp)
