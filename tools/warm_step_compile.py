"""Compile-only warmer for the full train step at a given config.

Lowers + compiles the EXACT jitted train step (abstract avals via
jax.eval_shape — nothing executes on the chip) so the persistent compile
cache is hot before a bench_step run. Useful when a flag-gated compute
path (e.g. RDFC_TAPCONV_DILATED=1) produces a new program whose cold
compile on the tunneled backend would otherwise sit inside a timed
session, or to pre-warm concurrently with an unrelated chip run
(compilation is compiler-host-side).

Usage: [FLAGS=1] python tools/warm_step_compile.py [--batch 8] [--nlspn]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--nlspn", action="store_true")
    p.add_argument("--remat", default="none",
                   choices=["none", "selective", "all"])
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from rdfc_gan_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()

    from __graft_entry__ import _flagship_cfg, _synth_batch
    from rdfc_gan_tpu.engines import build_engine

    cfg = _flagship_cfg()
    cfg.merge(dict(batch_size=args.batch,
                   remat={"none": False, "selective": "selective",
                          "all": True}[args.remat]))
    if args.nlspn:
        cfg.model.G_A2B.merge(dict(use_nlspn_refine=True))

    engine = build_engine(cfg, is_train=True, steps_per_epoch=100)
    batch = jax.tree.map(jnp.asarray, _synth_batch(cfg, args.batch))
    rng = jax.random.PRNGKey(0)
    state_avals = jax.eval_shape(engine.init_state, rng, batch)
    batch_avals = jax.tree.map(
        lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), batch)

    t0 = time.perf_counter()
    lowered = engine._train_step.lower(
        state_avals, batch_avals,
        jax.ShapeDtypeStruct(rng.shape, rng.dtype))
    t1 = time.perf_counter()
    lowered.compile()
    t2 = time.perf_counter()
    print(f"lower {t1 - t0:.1f}s, compile {t2 - t1:.1f}s "
          f"(cache-hit compiles return in seconds)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
