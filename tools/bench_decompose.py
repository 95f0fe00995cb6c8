"""Per-component timing of the flagship RDFCGAN train step on the real chip.

PERF_NOTES round-1 had only black-box decompositions; this tool times each
sub-net's train-mode forward and forward+grad in isolation (bs/shape of the
reference training envelope), chained inside ONE jit via lax.scan so the
tunnel RTT does not swamp ms-scale components (see docs/PERF_NOTES.md
"Measurement discipline").

Usage: python tools/bench_decompose.py [--batch 8] [--reps 8] [--fwd-only]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def chain_timer(fn, reps, params, *args):
    """Time fn(params, *args) repeated `reps` times inside one jit,
    serialized by threading a scalar carry into the first array argument.
    params is a traced jit ARGUMENT (embedding it as a closure constant
    makes the uploaded program exceed the remote-compile body limit)."""
    import jax
    import jax.numpy as jnp

    def chained(p, *a):
        def body(carry, _):
            out = fn(p, a[0] + carry * jnp.asarray(1e-30, a[0].dtype),
                     *a[1:])
            leaves = jax.tree.leaves(out)
            s = sum(jnp.sum(jnp.abs(l).astype(jnp.float32)) for l in leaves
                    if hasattr(l, "dtype"))
            return s.astype(a[0].dtype) * 1e-30, None
        carry, _ = jax.lax.scan(body, jnp.zeros((), a[0].dtype), None,
                                length=reps)
        return carry

    jfn = jax.jit(chained)
    from rdfc_gan_tpu.utils.sync import hard_sync

    out = jfn(params, *args)
    hard_sync(out)  # compile
    t0 = time.perf_counter()
    out = jfn(params, *args)
    hard_sync(out)
    dt = (time.perf_counter() - t0) / reps
    return dt * 1e3  # ms


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--reps", type=int, default=8)
    p.add_argument("--fwd_only", action="store_true")
    p.add_argument("--only", default=None,
                   help="comma-separated subnet names to time")
    p.add_argument("--set", default=None, action="append",
                   help="cfg override key=value (e.g. "
                        "model.Normal_G.packed_width=false)")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from rdfc_gan_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()

    from __graft_entry__ import _flagship_cfg, _synth_batch
    from rdfc_gan_tpu.engines import build_engine

    cfg = _flagship_cfg()
    cfg.merge(dict(batch_size=args.batch))
    for kv in args.set or []:
        key, _, val = kv.partition("=")
        if val.lower() in ("true", "false"):
            val = val.lower() == "true"
        else:
            try:
                val = int(val)
            except ValueError:
                try:
                    val = float(val)
                except ValueError:
                    pass
        node = cfg
        parts = key.split(".")
        for part in parts[:-1]:
            if part not in node:
                node.merge({part: {}})
            node = node[part]
        node.merge({parts[-1]: val})
    engine = build_engine(cfg, is_train=True, steps_per_epoch=100)
    batch = jax.tree.map(jnp.asarray, _synth_batch(cfg, args.batch))
    state = engine.init_state(jax.random.PRNGKey(0), batch)

    rgb = batch["rgb"]
    raw = batch["raw_depth"]
    gtd = batch["gt_depth"]

    inputs = {
        "G_label": (rgb,),
        "G_normal": (rgb,),
        "G_A2B": (rgb, raw, rgb),
        "G_B2A": (gtd,),
        "disc_A": (gtd,),
        "disc_B": (rgb,),
    }
    rngs_for = {"G_label": {"dropout": jax.random.PRNGKey(1)}}
    if args.only:
        keep = set(args.only.split(","))
        inputs = {k: v for k, v in inputs.items() if k in keep}

    results = {}
    for name, inp in inputs.items():
        mod = engine.modules[name]
        ps = {"params": state.params[name],
              "stats": state.batch_stats[name]}

        def fwd(ps_, x, *rest):
            out, _ = engine._apply(mod, ps_["params"], ps_["stats"], x,
                                   *rest, train=True,
                                   rngs=rngs_for.get(name), name=name)
            return out

        results[f"{name}/fwd"] = chain_timer(fwd, args.reps, ps, *inp)

        if not args.fwd_only:
            def fwd_loss(ps_, x, *rest):
                def loss(p):
                    out, _ = engine._apply(mod, p, ps_["stats"], x, *rest,
                                           train=True,
                                           rngs=rngs_for.get(name), name=name)
                    leaves = jax.tree.leaves(out)
                    return sum(jnp.sum(l.astype(jnp.float32) ** 2)
                               for l in leaves if hasattr(l, "dtype"))
                l, g = jax.value_and_grad(loss)(ps_["params"])
                return (l, g)

            results[f"{name}/grad"] = chain_timer(fwd_loss, args.reps, ps,
                                                  *inp)

    # optimizer update cost (all four optimizers, zero grads)
    def opt_update(st, x):
        p, o = st["params"], st["opt"]
        zg = jax.tree.map(lambda a: jnp.zeros_like(a) + x[0] * 0, p)
        new = {}
        gu, _ = engine.optimizers["G"].update(
            {"G_A2B": zg["G_A2B"], "G_B2A": zg["G_B2A"]}, o["G"],
            {"G_A2B": p["G_A2B"], "G_B2A": p["G_B2A"]})
        new["G"] = gu
        nu, _ = engine.optimizers["Nor"].update(
            zg["G_normal"], o["Nor"], p["G_normal"])
        new["Nor"] = nu
        lu, _ = engine.optimizers["label"].update(
            zg["G_label"], o["label"], p["G_label"])
        new["label"] = lu
        du, _ = engine.optimizers["D"].update(
            {"disc_A": zg["disc_A"], "disc_B": zg["disc_B"]}, o["D"],
            {"disc_A": p["disc_A"], "disc_B": p["disc_B"]})
        new["D"] = du
        return new

    results["optimizers/update"] = chain_timer(
        opt_update, args.reps,
        {"params": state.params, "opt": state.opt_states},
        jnp.zeros((8,), jnp.float32))

    # whole step for reference
    from rdfc_gan_tpu.utils.sync import hard_sync

    st, _ = engine.train_step(state, batch, jax.random.PRNGKey(2))
    hard_sync(st.params)
    t0 = time.perf_counter()
    iters = 10
    st2 = st
    for i in range(iters):
        st2, _ = engine.train_step(st2, batch, jax.random.fold_in(
            jax.random.PRNGKey(2), i))
    hard_sync(st2.params)
    results["full/train_step"] = (time.perf_counter() - t0) / iters * 1e3

    print(f"\n=== decomposition (bs={args.batch}, "
          f"{cfg.out_height}x{cfg.out_width}) ===")
    for k, v in sorted(results.items(), key=lambda kv: -kv[1]):
        print(f"{k:28s} {v:9.2f} ms")


if __name__ == "__main__":
    main()
