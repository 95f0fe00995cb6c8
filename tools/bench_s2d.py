"""Micro-benchmark: full-res low-lane convs vs their space-to-depth rewrite.

TPU bf16 tiles are (8,128) over (B,C) in XLA's chosen {C,B,W,H} layout — a
64-channel full-res tensor physically moves 2x its logical bytes (C padded
to 128). A 3x3/s1 conv over (H,W,64) is EXACTLY a 2x2 conv over the
(H/2,W/2,256) space-to-depth representation with rearranged weights: lane
padding disappears and positions drop 4x. This tool times both forms (fwd
and fwd+grad, chained in one jit per the tunnel-RTT discipline) to decide
whether the rewrite pays before touching the model.

Usage: python tools/bench_s2d.py [--batch 8] [--depth 8] [--reps 6]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def chain(fn, reps, *args):
    from rdfc_gan_tpu.utils.sync import hard_sync

    def chained(*a):
        def body(carry, _):
            out = fn(a[0] + carry * jnp.asarray(1e-30, a[0].dtype), *a[1:])
            s = sum(jnp.sum(jnp.abs(l).astype(jnp.float32))
                    for l in jax.tree.leaves(out))
            return s.astype(a[0].dtype) * 1e-30, None

        c, _ = jax.lax.scan(body, jnp.zeros((), a[0].dtype), None,
                            length=reps)
        return c

    jfn = jax.jit(chained)
    hard_sync(jfn(*args))
    t0 = time.perf_counter()
    hard_sync(jfn(*args))
    return (time.perf_counter() - t0) / reps * 1e3


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--depth", type=int, default=8,
                   help="number of chained convs")
    p.add_argument("--reps", type=int, default=6)
    p.add_argument("--H", type=int, default=224)
    p.add_argument("--W", type=int, default=304)
    args = p.parse_args()
    B, H, W, D = args.batch, args.H, args.W, args.depth

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(B, H, W, 64), jnp.bfloat16)
    ws = [jnp.asarray(rng.randn(3, 3, 64, 64) * 0.05, jnp.bfloat16)
          for _ in range(D)]
    ws2 = [jnp.asarray(rng.randn(2, 2, 256, 256) * 0.05, jnp.bfloat16)
           for _ in range(D)]
    x2 = jnp.asarray(rng.randn(B, H // 2, W // 2, 256), jnp.bfloat16)

    def conv_chain(x, ws):
        for w in ws:
            x = jax.nn.relu(jax.lax.conv_general_dilated(
                x, w, (1, 1), ((1, 1), (1, 1)),
                dimension_numbers=("NHWC", "HWIO", "NHWC")))
        return x

    def conv_chain_s2d(x, ws):
        for w in ws:
            x = jax.nn.relu(jax.lax.conv_general_dilated(
                x, w, (1, 1), ((1, 0), (1, 0)),
                dimension_numbers=("NHWC", "HWIO", "NHWC")))
        return x

    def grad_of(f):
        return lambda x, ws: jax.grad(
            lambda x, ws: jnp.sum(f(x, ws).astype(jnp.float32)))(x, ws)

    r = args.reps
    t_full = chain(lambda x, *w: conv_chain(x, w), r, x, *ws)
    t_s2d = chain(lambda x, *w: conv_chain_s2d(x, w), r, x2, *ws2)
    print(f"fwd : full-res 3x3x64   {t_full:7.2f} ms | "
          f"s2d 2x2x256 {t_s2d:7.2f} ms | ratio {t_full / t_s2d:.2f}x")
    t_full_g = chain(lambda x, *w: grad_of(conv_chain)(x, list(w)), r, x, *ws)
    t_s2d_g = chain(lambda x, *w: grad_of(conv_chain_s2d)(x, list(w)), r,
                    x2, *ws2)
    print(f"grad: full-res 3x3x64   {t_full_g:7.2f} ms | "
          f"s2d 2x2x256 {t_s2d_g:7.2f} ms | ratio {t_full_g / t_s2d_g:.2f}x")

    # logical bytes are equal by construction; report FLOP ratio for honesty
    fl_full = B * H * W * 9 * 64 * 64 * 2
    fl_s2d = B * (H // 2) * (W // 2) * 4 * 256 * 256 * 2
    print(f"FLOP ratio s2d/full = {fl_s2d / fl_full:.2f} "
          f"(s2d trades FLOPs for lane density)")


if __name__ == "__main__":
    main()
