"""AOT model export for serving — a deployment surface the reference lacks.

Serializes the inference path (``engine._forward_test_impl``: the same
function ``test.py`` evaluates with — reference contract
RDFC-GAN/lib/models/base.py:156-157 ``__call__ -> forward_test``) to a
portable ``jax.export`` artifact (StableHLO + calling convention). A
serving host then needs only ``jax.export.deserialize`` + the checkpoint —
none of this framework's Python — and XLA recompiles the same program for
its local topology.

Design notes (TPU-first):
- Params/batch-stats are ARGUMENTS of the exported function, not embedded
  constants: weights ship as the existing checkpoint file, the artifact
  stays small, and the traced program is identical to the in-framework
  jit (embedding ~100M params as constants also breaks serialization —
  the remote-compile body-limit gotcha, docs/PERF_NOTES.md).
- Cross-platform: ``--platforms cpu,tpu`` lowers once for both. The
  optional Pallas fast paths dispatch on the EXPORTING backend, so a
  CPU-session export serves the pure-XLA path everywhere; export on a TPU
  host (with --platforms tpu) to keep the Pallas NLSPN kernel in the
  artifact.
- Shapes are static (XLA semantics); pick the serving batch at export
  time. Multiple batch sizes = multiple exports of the same checkpoint.
- Serving loop: wrap the deserialized program ONCE in ``jax.jit`` —
  ``serve = jax.jit(jax.export.deserialize(blob).call)`` — and call
  ``serve(params, stats, rgb, depth)`` per request. Raw ``restored.call``
  re-flattens the ~10^3-leaf state pytree and re-binds the exported
  program through eager dispatch on every call (+~57 ms/call measured,
  tools/bench_export_latency.py); the jit wrapper traces once and later
  calls take the cached C++ fast path at live-jit latency.

Usage:
  python tools/export_model.py --model_cfg_path configs/..yaml \
      --load_from work_dir/best.ckpt --out model.jaxexp \
      --batch_size 1 --out_height 224 --out_width 304 [--check]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def parse_args(argv=None):
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("--model_cfg_path", required=True)
    p.add_argument("--load_from", default="",
                   help="checkpoint to validate against / ship with; "
                        "omit = export the random-init program (weights "
                        "are inputs either way)")
    p.add_argument("--out", required=True, help="output .jaxexp path")
    p.add_argument("--batch_size", type=int, default=1)
    p.add_argument("--out_height", type=int, default=224)
    p.add_argument("--out_width", type=int, default=304)
    p.add_argument("--num_classes", type=int, default=14)
    p.add_argument("--platforms", default="",
                   help="comma list (cpu,tpu); default = current backend")
    p.add_argument("--check", action="store_true",
                   help="deserialize + run on the current backend and "
                        "compare pred_depth to the live engine")
    p.add_argument("--depth_only", action="store_true", default=False,
                   help="export the pred_depth-only program: G_label is "
                        "skipped (its logits never feed pred_depth — "
                        "reference quirk rdfc_gan.py:172-180) and its "
                        "param/batch-stat subtrees are pruned from the "
                        "artifact's calling convention")
    p.add_argument("--seed", type=int, default=0)
    return p.parse_args(argv)


def build(args):
    import jax

    from rdfc_gan_tpu.config import default_config, load_config
    from rdfc_gan_tpu.engines import build_engine

    cfg = default_config()
    load_config(cfg, args.model_cfg_path)
    cfg.merge(dict(batch_size=args.batch_size, out_height=args.out_height,
                   out_width=args.out_width, num_classes=args.num_classes,
                   seed=args.seed))
    engine = build_engine(cfg, is_train=False)

    import numpy as np

    rng = np.random.default_rng(args.seed)
    b, h, w = args.batch_size, args.out_height, args.out_width
    sample = {
        "rgb": rng.standard_normal((b, h, w, 3), dtype=np.float32),
        "raw_depth": rng.standard_normal((b, h, w, 1), dtype=np.float32),
        "gt_depth": np.zeros((b, h, w, 1), np.float32),
    }
    state = engine.init_state(jax.random.PRNGKey(args.seed), sample)
    if args.load_from:
        from rdfc_gan_tpu.utils.checkpoint import load_checkpoint

        state, meta = load_checkpoint(state, args.load_from)
        print(f"loaded {args.load_from} (epoch {meta.get('epoch')})")
    return engine, state, sample


def main(argv=None) -> int:
    args = parse_args(argv)

    import jax
    import jax.numpy as jnp
    from jax import export as jexport

    engine, state, sample = build(args)
    rgb = jnp.asarray(sample["rgb"])
    depth = jnp.asarray(sample["raw_depth"])

    params, stats = state.params, state.batch_stats
    if args.depth_only:
        import functools

        fn = jax.jit(functools.partial(engine._forward_test_impl,
                                       depth_only=True))
        # G_label is never read on the depth-only path — prune its subtrees
        # so the serving host neither loads nor uploads the PSPNet weights.
        params = {k: v for k, v in params.items() if k != "G_label"}
        stats = {k: v for k, v in stats.items() if k != "G_label"}
    else:
        fn = jax.jit(engine._forward_test_impl)
    platforms = ([s.strip() for s in args.platforms.split(",") if s.strip()]
                 or None)
    exp = jexport.export(fn, platforms=platforms)(
        params, stats, rgb, depth)
    blob = exp.serialize()
    with open(args.out, "wb") as f:
        f.write(blob)
    print(f"exported {args.out}: {len(blob)/1e6:.2f} MB, "
          f"platforms={list(exp.platforms)}, "
          f"outputs={sorted(exp.out_tree.unflatten(exp.out_avals).keys())}")

    if args.check:
        restored = jexport.deserialize(blob)
        # the recommended serving wrapper (see module docstring)
        serve = jax.jit(restored.call)
        got = serve(params, stats, rgb, depth)
        want = fn(params, stats, rgb, depth)
        import numpy as np

        np.testing.assert_allclose(np.asarray(got["pred_depth"]),
                                   np.asarray(want["pred_depth"]),
                                   rtol=2e-5, atol=2e-5)
        print("roundtrip check OK: deserialized program matches the "
              "live engine's pred_depth")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
