"""Attribute the train step's HBM bytes to components via cost_analysis.

For each sub-net: compile forward and forward+grad closures exactly as the
engine applies them (G_B2A batched to 2B, remat per engine config) and print
flops / bytes-accessed / bandwidth-floor ms (bytes / 819 GB/s). The sum
approximates the full step's 225 GB and ranks byte-removal targets.

Usage: python tools/bytes_by_component.py [--batch 8] [--remat selective]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

V5E_BW = 819e9


def ca_of(fn, *args):
    lowered = jax.jit(fn).lower(*args)
    ca = lowered.compile().cost_analysis()
    ca = ca[0] if isinstance(ca, (list, tuple)) else ca
    return ca.get("flops", 0.0), ca.get("bytes accessed", 0.0)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--remat", default=None,
                   help="override cfg remat mode (none/selective/full)")
    p.add_argument("--skip", default="",
                   help="comma-separated component labels to skip "
                        "(e.g. G_label: its dilated-R50 grad can take "
                        ">30 min to compile)")
    args = p.parse_args()

    from rdfc_gan_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()
    from __graft_entry__ import _flagship_cfg, _synth_batch
    from rdfc_gan_tpu.engines import build_engine

    cfg = _flagship_cfg()
    cfg.merge(dict(batch_size=args.batch))
    if args.remat:
        # map CLI strings onto the engine's policy values (a raw truthy
        # string like "none" would read as remat=ALL)
        policy = {"none": False, "false": False, "full": True,
                  "true": True}.get(args.remat.lower(), args.remat)
        cfg.merge(dict(remat=policy))
    eng = build_engine(cfg, is_train=True, steps_per_epoch=100)
    batch = jax.tree.map(jnp.asarray, _synth_batch(cfg, args.batch))
    state = eng.init_state(jax.random.PRNGKey(0), batch)
    rgb, raw = batch["rgb"], batch["raw_depth"]

    def apply_fn(name, *xs, train=True):
        rngs = ({"dropout": jax.random.PRNGKey(7)} if name == "G_label"
                else None)

        def f(p, s, *a):
            out, _ = eng._apply(eng.modules[name], p, s, *a, train=train,
                                rngs=rngs, name=name)
            leaves = [l for l in jax.tree.leaves(out)
                      if hasattr(l, "dtype") and jnp.issubdtype(
                          l.dtype, jnp.floating)]
            return sum(jnp.sum(l.astype(jnp.float32)) for l in leaves)
        return f

    def grad_fn(name, *xs, train=True):
        f = apply_fn(name, train=train)
        return lambda p, s, *a: jax.grad(f)(p, s, *a)

    rows = []
    double = jnp.concatenate([batch["gt_depth"], batch["gt_depth"]], axis=0)
    cases = [
        ("G_A2B", (rgb, raw, rgb)),
        ("G_B2A(2B)", (double,), "G_B2A"),
        ("G_normal", (rgb,)),
        ("G_label", (rgb,)),
        ("disc_A", (batch["gt_depth"],)),
        ("disc_B", (rgb,)),
    ]
    total_f = total_b = 0.0
    print(f"{'component':14s} {'pass':5s} {'TFLOP':>7s} {'GB':>8s} "
          f"{'BW-floor ms':>12s}")
    skip = {s for s in args.skip.split(",") if s}
    for case in cases:
        label, xs = case[0], case[1]
        if label in skip:
            continue
        name = case[2] if len(case) > 2 else label
        p, s = state.params[name], state.batch_stats[name]
        for kind, fn in (("fwd", apply_fn(name)), ("grad", grad_fn(name))):
            fl, by = ca_of(fn, p, s, *xs)
            # per-step multiplicity: every G-side net runs twice (A2B + B2A
            # cycle paths); G_B2A(2B) is already both; discs: grad once in
            # d_loss (x2 applications inside) + fwd in g_loss
            mult = 1 if label.startswith("G_B2A") else 2
            if label.startswith("disc"):
                mult = 1
            print(f"{label:14s} {kind:5s} {fl / 1e12:7.2f} {by / 1e9:8.1f} "
                  f"{by / V5E_BW * 1e3:12.1f}   (x{mult}/step)")
            if kind == "grad":
                total_f += mult * fl
                total_b += mult * by
        rows.append(label)

    # optimizer-only step cost: full step minus the loss parts is awkward to
    # isolate; report the full train step for reference instead
    fl, by = ca_of(eng._train_step_impl, state, batch, jax.random.PRNGKey(0))
    print(f"{'FULL STEP':14s} {'':5s} {fl / 1e12:7.2f} {by / 1e9:8.1f} "
          f"{by / V5E_BW * 1e3:12.1f}")
    print(f"{'sum of grads':14s} {'':5s} {total_f / 1e12:7.2f} "
          f"{total_b / 1e9:8.1f} {total_b / V5E_BW * 1e3:12.1f}")


if __name__ == "__main__":
    main()
