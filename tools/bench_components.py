"""Per-component timing of the flagship pipeline on the current backend:
each sub-net forward, full inference, and the full train step across batch
sizes — the profiling data behind bench.py's headline number.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, *args, iters=10, warmup=2):
    from rdfc_gan_tpu.utils.sync import hard_sync

    f = jax.jit(fn)
    for _ in range(warmup):
        hard_sync(f(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        hard_sync(f(*args))
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    from __graft_entry__ import _flagship_cfg, _synth_batch
    from rdfc_gan_tpu.engines import build_engine

    cfg = _flagship_cfg()
    cfg.merge(dict(batch_size=4))
    eng = build_engine(cfg, is_train=True, steps_per_epoch=100)
    batch = jax.tree.map(jnp.asarray, _synth_batch(cfg, 4))
    state = eng.init_state(jax.random.PRNGKey(0), batch)
    print(f"backend={jax.default_backend()}  flagship @224x304")

    rgb, raw = batch["rgb"], batch["raw_depth"]
    normal = rgb

    def net(name, *args):
        mod = eng.modules[name]
        p, s = state.params[name], state.batch_stats[name]

        # params passed as ARGUMENTS — closing over them would inline
        # hundreds of MB of constants into the compile payload
        def f(p, s, *a):
            v = {"params": p}
            if s:
                v["batch_stats"] = s
            return mod.apply(v, *a, train=False)

        print(f"  {name:10s} fwd: {timeit(f, p, s, *args):8.2f} ms")

    net("G_label", rgb)
    net("G_normal", rgb)
    net("G_A2B", rgb, raw, normal)
    net("G_B2A", batch["gt_depth"])
    net("disc_A", batch["gt_depth"])

    t = timeit(lambda p, bs, r, d: eng._forward_test_impl(p, bs, r, d),
               state.params, state.batch_stats, rgb, raw)
    print(f"  forward_test (bs4): {t:8.2f} ms  -> {4e3 / t:.1f} img/s infer")

    for bs in (2, 4, 8, 16):
        cfg2 = _flagship_cfg()
        cfg2.merge(dict(batch_size=bs))
        e2 = build_engine(cfg2, is_train=True, steps_per_epoch=100)
        b2 = jax.tree.map(jnp.asarray, _synth_batch(cfg2, bs))
        try:
            s2 = e2.init_state(jax.random.PRNGKey(0), b2)
            rng = jax.random.PRNGKey(1)
            from rdfc_gan_tpu.utils.sync import hard_sync

            s2, _ = e2.train_step(s2, b2, rng)  # compile
            hard_sync(s2.params)
            t0 = time.perf_counter()
            iters = 10
            for i in range(iters):
                s2, _ = e2.train_step(s2, b2, jax.random.fold_in(rng, i))
            hard_sync(s2.params)
            dt = (time.perf_counter() - t0) / iters
            print(f"  train_step bs{bs:<2d}: {dt * 1e3:8.2f} ms  "
                  f"-> {bs / dt:7.1f} img/s/chip")
        except Exception as e:
            print(f"  train_step bs{bs}: FAILED {type(e).__name__}")
        del e2, s2, b2


if __name__ == "__main__":
    main()
