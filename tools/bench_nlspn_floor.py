"""NLSPN-variant floor decomposition (VERDICT r4 #3).

The NLSPN-variant train step (flagship + use_nlspn_refine) measured 305.6 ms
vs the flagship's 254.8 at bs8 — a ~51 ms delta for the paper's signature op
(reference nlspn_model.py:140-173). This tool gives that delta the same
treatment the flagship step got in round 3: per-stage chip timings (chained
in one jit, tunnel-RTT-free) against cost_analysis logical-byte floors, for
every stage of the refine path:

  offaff : conv_offset_aff output -> (offsets, affinities)
           (TGASS tanh + gather-free confidence sampling + abs-sum norm)
  masks  : (offsets, affinities) -> (B,S,S,H,W) shift-mask fold
           (ops/pallas/mask_kernel.py scatter kernel)
  prop   : mask-stack propagation, T steps (Pallas VMEM-resident kernel
           + two-phase backward, ops/pallas/nlspn_kernel.py)
  ga2b   : the full G_A2B forward/grad with and without NLSPN (the delta
           bounds everything above plus the guide/conf head convs)

Usage: python tools/bench_nlspn_floor.py [--batch 8] [--reps 8]
           [--skip_bytes] [--skip_time]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

V5E_BW = 819e9


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--reps", type=int, default=8)
    p.add_argument("--skip_bytes", action="store_true")
    p.add_argument("--skip_time", action="store_true")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from rdfc_gan_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()

    from __graft_entry__ import _flagship_cfg, _synth_batch
    from bench_decompose import chain_timer
    from bytes_by_component import ca_of
    from rdfc_gan_tpu.engines import build_engine
    from rdfc_gan_tpu.ops.nlspn import NLSPNParamsSpec, nlspn_offset_affinity
    from rdfc_gan_tpu.ops.nlspn_stencil import build_shift_masks
    from rdfc_gan_tpu.ops.pallas.nlspn_kernel import propagate_auto

    B = args.batch
    cfg = _flagship_cfg()
    cfg.merge(dict(batch_size=B, remat=False))
    cfg.model.G_A2B.merge(dict(use_nlspn_refine=True))
    engine = build_engine(cfg, is_train=True, steps_per_epoch=100)
    batch = jax.tree.map(jnp.asarray, _synth_batch(cfg, B))
    state = engine.init_state(jax.random.PRNGKey(0), batch)

    H, W = cfg.out_height, cfg.out_width
    spec = NLSPNParamsSpec()
    R = 2
    rng = np.random.RandomState(0)
    # activation dtype through the refine path is bf16 in the bf16 step
    adt = jnp.bfloat16
    raw = jnp.asarray(rng.normal(size=(B, H, W, 3 * spec.num_neighbors))
                      .astype(np.float32) * 0.2).astype(adt)
    conf = jnp.asarray(rng.uniform(0.2, 1, (B, H, W, 1))
                       .astype(np.float32)).astype(adt)
    pred = jnp.asarray(rng.normal(size=(B, H, W, 1))
                       .astype(np.float32)).astype(adt)
    gamma = jnp.asarray(4.0)

    def offaff(rw, cf):
        return nlspn_offset_affinity(rw, cf, gamma, spec,
                                     conf_sample_radius=R)

    offs, aff = jax.jit(offaff)(raw, conf)

    def masks(o, a):
        return build_shift_masks(o, a, spec.prop_kernel, R)

    M = jax.jit(masks)(offs, aff)

    def prop(pd, m):
        return propagate_auto(pd, m, spec.prop_time, R, use_pallas="auto")

    # grad-able scalarizations (bench_decompose convention)
    def s(x):
        leaves = jax.tree.leaves(x)
        return sum(jnp.sum(l.astype(jnp.float32) ** 2) for l in leaves
                   if hasattr(l, "dtype"))

    stages = {
        "offaff": (lambda _, rw, cf: offaff(rw, cf), (raw, conf)),
        "masks": (lambda _, o, a: masks(o, a), (offs, aff)),
        "prop": (lambda _, pd, m: prop(pd, m), (pred, M)),
        "refine": (lambda _, rw, cf, pd: prop(
            pd, masks(*offaff(rw, cf))), (raw, conf, pred)),
    }

    print(f"bs={B} {H}x{W} T={spec.prop_time} R={R} "
          f"mask stack {M.size * M.dtype.itemsize / 1e6:.1f} MB "
          f"({M.dtype})")
    print(f"{'stage':12s} {'pass':5s} {'TFLOP':>7s} {'GB':>8s} "
          f"{'floor ms':>9s} {'chip ms':>9s}")

    dummy = jnp.zeros((2,), jnp.float32)  # chain_timer params slot
    for name, (fn, inp) in stages.items():
        gfn = lambda _, *a, fn=fn: jax.grad(
            lambda aa: s(fn(None, *aa)))(a)
        for kind, f in (("fwd", fn), ("grad", gfn)):
            fl = by = float("nan")
            if not args.skip_bytes:
                fl, by = ca_of(lambda *a: f(None, *a), *inp)
            ms = float("nan")
            if not args.skip_time:
                ms = chain_timer(f, args.reps, dummy, *inp)
            print(f"{name:12s} {kind:5s} {fl / 1e12:7.3f} {by / 1e9:8.2f} "
                  f"{by / V5E_BW * 1e3:9.2f} {ms:9.2f}", flush=True)

    # full G_A2B with/without NLSPN: the end-to-end delta
    rgb, rawd = batch["rgb"], batch["raw_depth"]
    for tag, eng, st in (("ga2b+nlspn", engine, state),):
        mod, pr, bs = eng.modules["G_A2B"], st.params["G_A2B"], \
            st.batch_stats["G_A2B"]

        def fwd(p, x, d, n):
            out, _ = eng._apply(mod, p["params"], p["stats"], x, d, n,
                                train=True, name="G_A2B")
            return s(out)

        ps = {"params": pr, "stats": bs}
        ms_f = ms_g = float("nan")
        if not args.skip_time:
            ms_f = chain_timer(lambda p, *a: fwd(p, *a), args.reps, ps,
                               rgb, rawd, rgb)
            ms_g = chain_timer(lambda p, *a: jax.grad(fwd)(p, *a),
                               args.reps, ps, rgb, rawd, rgb)
        fl = by = float("nan")
        if not args.skip_bytes:
            fl, by = ca_of(lambda p, *a: jax.grad(fwd)(p, *a), ps,
                           rgb, rawd, rgb)
        print(f"{tag:12s} {'fwd':5s} {'':7s} {'':8s} {'':9s} {ms_f:9.2f}")
        print(f"{tag:12s} {'grad':5s} {fl / 1e12:7.3f} {by / 1e9:8.2f} "
              f"{by / V5E_BW * 1e3:9.2f} {ms_g:9.2f}", flush=True)


if __name__ == "__main__":
    main()
