"""Micro-benchmarks of G_A2B building blocks in bf16 at training shapes —
isolates why the full-model bf16 backward runs ~6x below forward utilization
(tools/bench_decompose.py: fwd 6.9 ms vs grad 87.7 ms at bs8).

Usage: python tools/bench_micro.py [--batch 8]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from bench_decompose import chain_timer  # noqa: E402


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--reps", type=int, default=10)
    args = p.parse_args()

    import flax.linen as nn
    import jax
    import jax.numpy as jnp

    from rdfc_gan_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()

    from rdfc_gan_tpu.models.layers import (ConvBNAct, ConvTBNAct,
                                            TorchConvTranspose, instance_norm)

    B, H, W = args.batch, 224, 304
    key = jax.random.PRNGKey(0)

    cases = {}

    def add(name, mod_fn, shape, train=True):
        x = jax.random.normal(key, shape, jnp.bfloat16)
        mod, kwargs = mod_fn()
        variables = jax.jit(
            lambda xx: mod.init(jax.random.PRNGKey(1), xx, **kwargs))(x)
        ps = {"params": jax.tree.map(lambda a: a.astype(jnp.bfloat16),
                                     variables["params"]),
              "stats": variables.get("batch_stats", {})}

        def fwd(ps_, xx):
            var = {"params": ps_["params"]}
            if ps_["stats"]:
                var["batch_stats"] = ps_["stats"]
                out = mod.apply(var, xx, **kwargs, mutable=["batch_stats"])[0]
            else:
                out = mod.apply(var, xx, **kwargs)
            return out

        def grad(ps_, xx):
            def loss(pp):
                var = {"params": pp}
                if ps_["stats"]:
                    var["batch_stats"] = ps_["stats"]
                    out = mod.apply(var, xx, **kwargs,
                                    mutable=["batch_stats"])[0]
                else:
                    out = mod.apply(var, xx, **kwargs)
                return jnp.sum(out.astype(jnp.float32) ** 2)
            return jax.value_and_grad(loss)(ps_["params"])

        cases[name + "/fwd"] = chain_timer(fwd, args.reps, ps, x)
        cases[name + "/grad"] = chain_timer(grad, args.reps, ps, x)

    # head dec1: conv3x3 128->64 + BN + lrelu at FULL res
    add("head_dec1_128to64_fullres",
        lambda: (ConvBNAct(64), dict(train=True)), (B, H, W, 128))
    # plain conv without BN
    add("conv_128to64_fullres",
        lambda: (nn.Conv(64, (3, 3), padding=1), {}), (B, H, W, 128))
    # head dec0: conv3x3 128->1 at full res
    add("conv_128to1_fullres",
        lambda: (nn.Conv(1, (3, 3), padding=1), {}), (B, H, W, 128))
    # resnet-ish conv at full res 64ch
    add("conv_64to64_fullres",
        lambda: (nn.Conv(64, (3, 3), padding=1, use_bias=False), {}),
        (B, H, W, 64))
    # BN alone at full res
    class _BN(nn.Module):
        @nn.compact
        def __call__(self, x, train=True):
            return nn.BatchNorm(use_running_average=not train, momentum=0.9,
                                epsilon=1e-5, dtype=x.dtype)(x)
    add("bn_64_fullres", lambda: (_BN(), dict(train=True)), (B, H, W, 64))
    # decoder convT at 1/8
    add("convt_768to256_eighth",
        lambda: (ConvTBNAct(256), dict(train=True)), (B, H // 8, W // 8, 768))
    add("convt_192to64_fullhalf",
        lambda: (ConvTBNAct(64), dict(train=True)), (B, H // 2, W // 2, 192))
    # instance norm at 1/8
    class _IN(nn.Module):
        @nn.compact
        def __call__(self, x):
            return instance_norm(x) * self.param(
                "s", nn.initializers.ones, (1,))
    add("instancenorm_768_eighth", lambda: (_IN(), {}),
        (B, H // 8, W // 8, 768))

    print(f"\n=== micro (bs={args.batch}, bf16) ===")
    for k, v in sorted(cases.items(), key=lambda kv: -kv[1]):
        print(f"{k:34s} {v:9.3f} ms")
    pairs = {}
    for k, v in cases.items():
        base = k.rsplit("/", 1)[0]
        pairs.setdefault(base, {})[k.rsplit("/", 1)[1]] = v
    print("--- grad/fwd ratios ---")
    for base, d in sorted(pairs.items(),
                          key=lambda kv: -(kv[1]["grad"] / kv[1]["fwd"])):
        print(f"{base:34s} {d['grad'] / d['fwd']:6.1f}x "
              f"(fwd {d['fwd']:.3f} grad {d['grad']:.3f})")


if __name__ == "__main__":
    main()
