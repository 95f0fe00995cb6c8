"""Ablate the G_A2B (RDFGenerator) backward cost — bench_decompose shows
grad/fwd = 12.7x where remat predicts ~3x. Times grad under variants:
remat on/off, fusion family, heads-only vs torso-only stubs.

Usage: python tools/bench_ga2b_ablate.py [--batch 8] [--reps 8]
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
    p.add_argument("--reps", type=int, default=8)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from rdfc_gan_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()

    from __graft_entry__ import _flagship_cfg, _synth_batch
    from rdfc_gan_tpu.models.rdf_generator import RDFGenerator

    cfg = _flagship_cfg()
    batch = _synth_batch(cfg, args.batch)
    rgb = jnp.asarray(batch["rgb"], jnp.bfloat16)
    raw = jnp.asarray(batch["raw_depth"], jnp.bfloat16)

    g = dict(cfg.model.G_A2B.to_dict())
    g.pop("type", None)
    g.pop("pretrained_on_imagenet", None)
    g.pop("bn", None)

    variants = {
        "bf16+remat(engine)": dict(remat=True, bf16=True, mods={}),
        "bf16,no-remat": dict(remat=False, bf16=True, mods={}),
        "f32+remat": dict(remat=True, bf16=False, mods={}),
        "f32,no-remat": dict(remat=False, bf16=False, mods={}),
        "bf16+remat,fuse=AdaIN": dict(
            remat=True, bf16=True,
            mods={"fuse_depth_in_rgb_decoder": "AdaIN"}),
    }

    results = {}
    for name, v in variants.items():
        gg = dict(g)
        gg.update(v["mods"])
        mod = RDFGenerator(**gg)
        variables = jax.jit(lambda r, d: mod.init(
            jax.random.PRNGKey(0), r, d, r, train=True))(rgb, raw)
        ps = {"params": variables["params"],
              "stats": variables.get("batch_stats", {})}
        cd = jnp.bfloat16 if v["bf16"] else jnp.float32

        def cast(t):
            return jax.tree.map(
                lambda x: x.astype(cd)
                if hasattr(x, "dtype") and x.dtype == jnp.float32 else x, t)

        def fwd_loss(ps_, x):
            def loss(pp):
                def fn(pp2, a, b, c):
                    var = {"params": cast(pp2)}
                    if ps_["stats"]:
                        var["batch_stats"] = ps_["stats"]
                    return mod.apply(var, cast(a), cast(b), cast(c),
                                     train=True, mutable=["batch_stats"])[0]
                if v["remat"]:
                    fn = jax.checkpoint(fn)
                out = fn(pp, x, raw, x)
                return sum(jnp.sum(l.astype(jnp.float32) ** 2)
                           for l in jax.tree.leaves(out)
                           if hasattr(l, "dtype"))
            return jax.value_and_grad(loss)(ps_["params"])

        results[name] = chain_timer(fwd_loss, args.reps, ps, rgb)

        def fwd_only(ps_, x):
            var = {"params": cast(ps_["params"])}
            if ps_["stats"]:
                var["batch_stats"] = ps_["stats"]
            return mod.apply(var, cast(x), cast(raw), cast(x), train=True,
                             mutable=["batch_stats"])[0]

        results[name + "/fwd"] = chain_timer(fwd_only, args.reps, ps, rgb)

    print(f"\n=== G_A2B grad ablation (bs={args.batch}) ===")
    for k, val in sorted(results.items(), key=lambda kv: -kv[1]):
        print(f"{k:32s} {val:9.2f} ms")


if __name__ == "__main__":
    main()
