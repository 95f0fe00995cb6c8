"""Pallas TPU kernels: fused InstanceNorm forward and backward.

XLA schedules an instance norm as a reduce fusion (one full read of the
activation for the one-pass E[x]/E[x^2] statistics) followed by an
elementwise fusion (a second full read, plus the write of y) — three
activation-sized HBM moves per norm. The forward kernel here keeps the
whole (H, W, C-tile) plane VMEM-resident: statistics and normalization in
ONE read plus the write. The backward is the same story for the
output-residual VJP (models/layers._instance_norm_bwd): XLA reads dy and y
twice each (reduction fusion + elementwise fusion); the kernel reads both
once.

Reference semantics being preserved: torch nn.InstanceNorm2d(affine=False)
as used throughout the reference generators (RDF-GAN/lib/model/
networks.py norm_layer='instance'); statistics per (image, ORIGINAL
channel) including the W-packed layout's phase sub-axis (ops/packed.py).

Grid: (B, C-tiles, H-tiles). The full-plane input block's index map
ignores the H-tile coordinate, so it is fetched once per (b, c) —
double-buffered when two planes fit VMEM (the kernel is DMA-bound; the
next plane's fetch overlaps this plane's compute), single-buffered
otherwise; the output streams out in H-tiles to keep the footprint
bounded.
Statistics are computed once per plane (at H-tile 0) into a scratch that
persists across the sequential H-tile iterations. The W-packed pair merge
(stats per original channel = mean over the two phase lanes) runs as one
(2,Ct)@(Ct,Ct) matmul against an iota-built pairing matrix — no strided
lane slicing.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# test hook: force the Pallas path on CPU (with interpret-mode pallas_call
# monkeypatched in) so the kernels are exercised in-suite
_FORCE_PALLAS = False

_LANES = 128


def _vmem_budget() -> int:
    """Planning budget for plane-resident blocks. Default 13 MiB targets the
    conservative ~16 MiB/core figure; chips with larger VMEM (v5e exposes
    far more to Mosaic) can raise it via RDFC_PALLAS_IN_VMEM_MB so the
    full-res (224, 152, 128) packed backward planes (dy + y = ~18 MiB)
    stay on the one-read kernel instead of the two-read XLA fallback. A
    too-large value fails at Mosaic compile, which the train-step caller
    survives via the RDFC_DISABLE_PALLAS_IN retry (bench.py) — A/B on the
    real chip before changing the default."""
    import os

    return int(os.environ.get("RDFC_PALLAS_IN_VMEM_MB", "13")) * 1024 * 1024


def _sublane(dtype) -> int:
    return 16 if jnp.dtype(dtype).itemsize == 2 else 8


def _pad_up(n: int, m: int) -> int:
    return -(-n // m) * m


def _pick_bh(H: int) -> int:
    for bh in (16, 8, 4, 2):
        if H % bh == 0:
            return bh
    return H


def _plan(shape, dtype, pack: int, n_full_blocks: int):
    """(Ct, bh, buffers) if the kernel fits VMEM, else None.
    ``n_full_blocks`` = how many full (H,W,Ct) planes the kernel holds
    (1 fwd: x; 2 bwd: dy, y). ``buffers``: 2 = normal double-buffered
    pipeline (plane DMA overlaps the previous plane's compute — the kernel
    is DMA-bound, so this is the fast mode); 1 = single-buffered fallback
    when two copies don't fit (large planes; serializes DMA and compute,
    still one read fewer than XLA)."""
    B, H, W, C = shape
    if C % pack:
        return None
    if C > _LANES and C % _LANES:
        return None
    Ct = min(C, _LANES)
    if Ct % pack:
        return None
    itemsize = jnp.dtype(dtype).itemsize
    wp = _pad_up(W, _sublane(dtype))
    bh = _pick_bh(H)
    plane = H * wp * _LANES * itemsize  # lane-padded VMEM footprint
    tile = bh * wp * _LANES * itemsize
    # chunked f32 stats transients (ch=8 rows, two arrays) + stats scratch
    transients = 2 * 8 * wp * _LANES * 4
    fixed = 2 * tile + transients
    # RDFC_PALLAS_IN_DB_ONLY: engage only where the plane double-buffers
    # (r4 chip A/B showed the single-buffered full-res planes were the
    # regression — DMA serialized against compute); the sub-full-res
    # planes still get the one-read kernel, full-res falls back to XLA
    import os

    modes = ((2,) if os.environ.get("RDFC_PALLAS_IN_DB_ONLY") else (2, 1))
    for buffers in modes:
        if buffers * n_full_blocks * plane + fixed < _vmem_budget():
            return Ct, bh, buffers
    return None


# lowering self-probe verdicts, keyed per (dtype, pack, SHAPE CLASS).
# Two lessons baked in (ADVICE r3 + the r4 fused-block under-detection):
# a Mosaic regression specific to one dtype/pack must not be masked by a
# passing probe of another, and a probe at a TOY shape can pass while the
# real plane blows the scoped-VMEM limit — VMEM footprint depends on
# (H, W, Ct, buffers), so the probe compiles the kernel at the REAL
# (H, W, C) with B=2 (B=1 once passed while every B>1 instance failed:
# the stats block's second-to-last dim must equal the array's). If a probe
# instance does not compile, dispatch falls back to the XLA path for that
# exact shape class only.
_LOWERING_OK: dict = {}


def _lowering_ok(dtype, pack: int, shape, n_full_blocks: int) -> bool:
    _B, H, W, C = shape
    key = (jnp.dtype(dtype).name, pack, H, W, C, n_full_blocks)
    if key not in _LOWERING_OK:
        try:
            x = jnp.zeros((2, H, W, C), dtype)
            jax.jit(lambda v: instance_norm_fwd_pallas(v, 1e-5, pack)[0]) \
                .lower(x).compile()
            if n_full_blocks >= 2:
                af = jnp.zeros((2, C), jnp.float32)
                jax.jit(lambda a, b, c: instance_norm_bwd_pallas(
                    a, b, c, pack)).lower(x, x, af).compile()
            _LOWERING_OK[key] = True
        except Exception as e:  # pragma: no cover - chip/toolchain specific
            import sys

            print(f"norm_kernel: Pallas probe {key} failed to compile "
                  f"({type(e).__name__}); using the XLA instance-norm path",
                  file=sys.stderr)
            _LOWERING_OK[key] = False
    return _LOWERING_OK[key]


def wants_pallas(shape, dtype, pack: int, n_full_blocks: int) -> bool:
    """Fused-IN kernel dispatch gate. OFF by default: the round-4 chip A/B
    (PERF_AB.jsonl) measured the kernels at +23 ms on the bs8 flagship step
    — Mosaic's 16 MB scoped-VMEM limit on v5e forces the full-res planes
    into single-buffered mode (DMA serialized against compute), and raising
    RDFC_PALLAS_IN_VMEM_MB past ~13 fails Mosaic compile outright
    ("scoped allocation ... exceeded scoped vmem limit"). Opt in for A/B
    with RDFC_ENABLE_PALLAS_IN=1 (the outres VJPs must also be on:
    RDFC_OUTRES_VJP=in — the kernels are only reachable through them)."""
    import os

    if os.environ.get("RDFC_DISABLE_PALLAS_IN"):  # ops-level escape hatch
        return False
    if not (os.environ.get("RDFC_ENABLE_PALLAS_IN") or _FORCE_PALLAS):
        return False
    plan = _plan(shape, dtype, pack, n_full_blocks)
    if plan is None:
        return False
    if (plan[2] == 1 and not _FORCE_PALLAS
            and not os.environ.get("RDFC_PALLAS_IN_ALLOW_SB")):
        # single-buffered mode serializes the plane DMA against compute —
        # measured net-negative on chip (the r4 A/B's +23 ms was dominated
        # by the big full-res planes that only fit single-buffered under
        # Mosaic's 16 MB scoped-VMEM limit). Opt-in planes must pipeline.
        return False
    on_tpu = jax.default_backend() not in ("cpu", "gpu")
    if not (on_tpu or _FORCE_PALLAS):
        return False
    return _FORCE_PALLAS or _lowering_ok(dtype, pack, shape, n_full_blocks)


def _pair_merge(s, pack: int, Ct: int):
    """s: (2, Ct) per-packed-channel sums -> per-ORIGINAL-channel sums
    broadcast back over the pack lanes, via an iota pairing matmul (no
    strided lane slicing, and everything stays >= 2-D for Mosaic)."""
    if pack == 1:
        return s
    ii = jax.lax.broadcasted_iota(jnp.int32, (Ct, Ct), 0)
    jj = jax.lax.broadcasted_iota(jnp.int32, (Ct, Ct), 1)
    P = (ii // pack == jj // pack).astype(jnp.float32)
    return jnp.dot(s, P, preferred_element_type=jnp.float32)


def _chunk_sums(ref, H: int, W: int, Ct: int, with_second=None):
    """One-pass E-sums over a (1,H,W,Ct) block in f32, 8-row chunks (bounds
    the Mosaic-stack f32 transients to ~2.5 MB at full-res W). Returns
    (2, Ct): row 0 = sum x, row 1 = sum x*x (or x*y)."""
    s = jnp.zeros((2, Ct), jnp.float32)
    for h0 in range(0, H, 8):
        hs = min(8, H - h0)
        xa = ref[0, h0:h0 + hs].astype(jnp.float32).reshape(hs * W, Ct)
        if with_second is None:
            ya = xa
        else:
            ya = with_second[0, h0:h0 + hs].astype(
                jnp.float32).reshape(hs * W, Ct)
        s = s + jnp.concatenate(
            [jnp.sum(xa, axis=0, keepdims=True),
             jnp.sum(xa * ya, axis=0, keepdims=True)], axis=0)
    return s


def _in_fwd_kernel(x_ref, y_ref, a_ref, stats, *, eps: float, pack: int,
                   H: int, W: int, Ct: int, bh: int, n: int):
    h = pl.program_id(2)

    @pl.when(h == 0)
    def _():
        s = _pair_merge(_chunk_sums(x_ref, H, W, Ct), pack, Ct) / n
        m = s[0:1]                                  # (1, Ct)
        var = jnp.maximum(s[1:2] - m * m, 0.0)
        a = jax.lax.rsqrt(var + eps)
        stats[...] = jnp.concatenate([a, -m * a], axis=0)
        a_ref[...] = a.reshape(1, 1, Ct)

    a = stats[0:1].reshape(1, 1, Ct).astype(x_ref.dtype)
    b = stats[1:2].reshape(1, 1, Ct).astype(x_ref.dtype)
    xa = x_ref[0, pl.ds(h * bh, bh)]                # (bh, W, Ct)
    y_ref[0] = xa * a + b


def _in_bwd_kernel(dy_ref, y_ref, af_ref, dx_ref, stats, *, pack: int,
                   H: int, W: int, Ct: int, bh: int, n: int):
    h = pl.program_id(2)

    @pl.when(h == 0)
    def _():
        s = _chunk_sums(dy_ref, H, W, Ct, with_second=y_ref)
        stats[...] = _pair_merge(s, pack, Ct) / n

    # dtype contract shared with the XLA backward (models/layers.
    # _instance_norm_bwd): reductions multiply in f32, the elementwise
    # combine runs in dy.dtype with the f32 stats rounded once
    m1 = stats[0:1].reshape(1, 1, Ct).astype(dy_ref.dtype)
    m2 = stats[1:2].reshape(1, 1, Ct).astype(dy_ref.dtype)
    af = af_ref[...].reshape(1, 1, Ct).astype(dy_ref.dtype)
    dyc = dy_ref[0, pl.ds(h * bh, bh)]
    yc = y_ref[0, pl.ds(h * bh, bh)]
    dx_ref[0] = af * (dyc - m1 - yc * m2)


def instance_norm_fwd_pallas(x, eps: float, pack: int):
    """(y, af): af is the per-PACKED-channel (B, C) f32 scale broadcast —
    the output-residual VJP's residual."""
    B, H, W, C = x.shape
    Ct, bh, buffers = _plan(x.shape, x.dtype, pack, 1)
    n = H * W * pack
    kernel = functools.partial(_in_fwd_kernel, eps=eps, pack=pack, H=H,
                               W=W, Ct=Ct, bh=bh, n=n)
    y, af = pl.pallas_call(
        kernel,
        grid=(B, C // Ct, H // bh),
        in_specs=[
            pl.BlockSpec((1, H, W, Ct), lambda b, c, h: (b, 0, 0, c),
                         pipeline_mode=pl.Buffered(buffer_count=buffers),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, bh, W, Ct), lambda b, c, h: (b, h, 0, c),
                         memory_space=pltpu.VMEM),
            # stats ride a (B, 1, C) layout: a (1, Ct) block over (B, C)
            # violates the TPU tiling rule (second-to-last block dim must be
            # a multiple of 8 or equal the array dim) whenever B > 1
            pl.BlockSpec((1, 1, Ct), lambda b, c, h: (b, 0, c),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[jax.ShapeDtypeStruct((B, H, W, C), x.dtype),
                   jax.ShapeDtypeStruct((B, 1, C), jnp.float32)],
        scratch_shapes=[pltpu.VMEM((2, Ct), jnp.float32)],
    )(x)
    return y, af.reshape(B, C)


def instance_norm_bwd_pallas(dy, y, af, pack: int):
    """dx = af * (dy - E[dy] - y * E[dy*y]) with per-original-channel
    E over the instance axes — one read each of dy and y."""
    B, H, W, C = dy.shape
    Ct, bh, buffers = _plan(dy.shape, dy.dtype, pack, 2)
    n = H * W * pack
    kernel = functools.partial(_in_bwd_kernel, pack=pack, H=H, W=W,
                               Ct=Ct, bh=bh, n=n)
    return pl.pallas_call(
        kernel,
        grid=(B, C // Ct, H // bh),
        in_specs=[
            pl.BlockSpec((1, H, W, Ct), lambda b, c, h: (b, 0, 0, c),
                         pipeline_mode=pl.Buffered(buffer_count=buffers),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H, W, Ct), lambda b, c, h: (b, 0, 0, c),
                         pipeline_mode=pl.Buffered(buffer_count=buffers),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, Ct), lambda b, c, h: (b, 0, c),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, bh, W, Ct), lambda b, c, h: (b, h, 0, c),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, H, W, C), dy.dtype),
        scratch_shapes=[pltpu.VMEM((2, Ct), jnp.float32)],
    )(dy, y, af.reshape(B, 1, C))
