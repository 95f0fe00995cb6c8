"""NLSPN propagation micro-benchmark: gather-scan vs XLA stencil vs Pallas.

Times the hot op of the framework (18 propagation iterations at the NYUv2
training resolution) across the three implementations on the current
backend. The reference equivalent is 26 sequential CUDA launches per forward
(SURVEY.md §3.3).
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


def bench_chained(fn, feat, *rest, reps=50):
    """Time fn by chaining `reps` applications inside ONE jit (feat feeds
    back), then a single host readback — amortizes the ~20ms tunnel RTT that
    would otherwise swamp ms-scale kernels."""
    from rdfc_gan_tpu.utils.sync import hard_sync

    f = jax.jit(lambda ft, *r: jax.lax.fori_loop(
        0, reps, lambda i, x: fn(x, *r), ft))
    hard_sync(f(feat, *rest))  # compile + warm
    t0 = time.perf_counter()
    hard_sync(f(feat, *rest))
    return (time.perf_counter() - t0) / reps * 1e3  # ms


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=4)
    p.add_argument("--height", type=int, default=224)
    p.add_argument("--width", type=int, default=304)
    p.add_argument("--prop_time", type=int, default=18)
    p.add_argument("--radius", type=int, default=2)
    args = p.parse_args()

    from rdfc_gan_tpu.ops.nlspn import (NLSPNParamsSpec, nlspn_offset_affinity,
                                        nlspn_propagate)
    from rdfc_gan_tpu.ops.nlspn_stencil import (build_shift_masks,
                                                stencil_propagate)
    from rdfc_gan_tpu.ops.pallas.nlspn_kernel import (
        nlspn_stencil_propagate_pallas)

    spec = NLSPNParamsSpec(prop_time=args.prop_time)
    B, H, W = args.batch, args.height, args.width
    rng = np.random.RandomState(0)
    raw = jnp.asarray(rng.normal(size=(B, H, W, 24)).astype(np.float32) * 0.3)
    conf = jnp.asarray(rng.uniform(0.2, 1, (B, H, W, 1)).astype(np.float32))
    gamma = jnp.asarray(4.0)
    feat = jnp.asarray(rng.normal(size=(B, H, W, 1)).astype(np.float32))

    offsets, aff = jax.jit(
        lambda r, c: nlspn_offset_affinity(r, c, gamma, spec))(raw, conf)
    M = jax.jit(lambda o, a: build_shift_masks(o, a, spec.prop_kernel,
                                               args.radius))(offsets, aff)
    from rdfc_gan_tpu.utils.sync import hard_sync
    hard_sync((offsets, aff, M))
    print(f"backend={jax.default_backend()} B={B} {H}x{W} T={spec.prop_time} "
          f"R={args.radius} masks={M.size * 2 / 1e6:.1f}MB(bf16)")

    t = bench_chained(lambda f, o, a: nlspn_propagate(f, o, a, spec),
                      feat, offsets, aff, reps=5)
    print(f"gather-scan   : {t:8.3f} ms", flush=True)
    t = bench_chained(lambda f, m: stencil_propagate(f, m, spec.prop_time,
                                                     args.radius), feat, M)
    print(f"xla-stencil   : {t:8.3f} ms", flush=True)
    try:
        t = bench_chained(lambda f, m: nlspn_stencil_propagate_pallas(
            f, m, jnp.zeros_like(f), spec.prop_time, args.radius, False),
            feat, M)
        print(f"pallas-stencil: {t:8.3f} ms", flush=True)
    except Exception as e:
        print(f"pallas-stencil: FAILED {type(e).__name__}: {e}")


if __name__ == "__main__":
    main()
