"""Full train-step timing at a given config (flagship / NLSPN variant,
remat modes) on the real chip. Prints one JSON line per run.

Usage: python tools/bench_step.py [--batch 8] [--iters 20]
           [--nlspn] [--remat none|selective|all] [--tag NAME]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--iters", type=int, default=20)
    p.add_argument("--nlspn", action="store_true")
    p.add_argument("--remat", default="none",
                   choices=["none", "selective", "all"])
    p.add_argument("--tag", default="")
    p.add_argument("--set", action="append", default=[], dest="sets",
                   metavar="dotted.key=value",
                   help="config override, e.g. model.Label_G.packed_width"
                        "=true (repeatable; values parsed as YAML)")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from rdfc_gan_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()

    from __graft_entry__ import _flagship_cfg, _synth_batch
    from rdfc_gan_tpu.engines import build_engine
    from rdfc_gan_tpu.utils.sync import hard_sync

    cfg = _flagship_cfg()
    cfg.merge(dict(batch_size=args.batch,
                   remat={"none": False, "selective": "selective",
                          "all": True}[args.remat]))
    if args.nlspn:
        cfg.model.G_A2B.merge(dict(use_nlspn_refine=True))
    for kv in args.sets:
        import yaml

        key, _, val = kv.partition("=")
        sub = yaml.safe_load(val)
        for part in reversed(key.split(".")):
            sub = {part: sub}
        cfg.merge(sub)

    engine = build_engine(cfg, is_train=True, steps_per_epoch=100)
    batch = jax.tree.map(jnp.asarray, _synth_batch(cfg, args.batch))
    rng = jax.random.PRNGKey(0)
    state = engine.init_state(rng, batch)

    state, stats = engine.train_step(state, batch, rng)
    hard_sync(state.params)

    t0 = time.perf_counter()
    for i in range(args.iters):
        state, stats = engine.train_step(state, batch,
                                         jax.random.fold_in(rng, i))
    hard_sync(state.params)
    dt = (time.perf_counter() - t0) / args.iters

    print(json.dumps({
        "tag": args.tag or ("nlspn" if args.nlspn else "flagship"),
        "batch": args.batch, "remat": args.remat,
        "ms_per_step": round(dt * 1e3, 1),
        "img_s": round(args.batch / dt, 1),
    }))


if __name__ == "__main__":
    main()
