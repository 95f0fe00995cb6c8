"""Single-stream serving latency of the AOT `jax.export` artifact.

VERDICT r3 weak #6: the serving story rested on the bs8 batched
throughput number (122.8 img/s, tunnel RTT amortized) and the v1
`--cal_fps` 13.3 FPS contract number; the AOT export path
(tools/export_model.py) itself was never latency-benchmarked. This tool
measures the honest deployment loop: ONE image in host memory ->
device -> exported program -> pred_depth back in host memory, per call,
wall-clock (the host readback IS the sync — `hard_sync` discipline,
docs/PERF_NOTES.md "Measurement discipline").

Reference contract: the single-image path of RDF-GAN's FPS harness
(RDF-GAN/lib/tools/main.py:318-350 — 5-image warmup, cuda.synchronize
bracketing) applied to the reference-free serving artifact.

Prints one JSON line: p50/p90/mean per-call latency (ms) for
  - the deserialized export artifact called raw (`restored.call`),
  - the artifact wrapped ONCE in `jax.jit(restored.call)` — the
    recommended serving loop (see below), and
  - the live in-framework jit of the same function (baseline),
on the current backend (TPU via the tunnel when present — note the
~20 ms tunnel RTT is part of every per-call number on this host and
would be absent on a local-attached chip).

Usage: python tools/bench_export_latency.py [--batch 1] [--iters 50]
           [--model_cfg_path configs/rdf_cycle_patchgan_config.yaml]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def _percentile(xs, q):
    xs = sorted(xs)
    i = min(len(xs) - 1, max(0, int(round(q / 100.0 * (len(xs) - 1)))))
    return xs[i]


def _time_calls(call, args, iters, warmup=5):
    import numpy as np

    for _ in range(warmup):
        np.asarray(call(*args)["pred_depth"])
    lat = []
    for _ in range(iters):
        t0 = time.perf_counter()
        np.asarray(call(*args)["pred_depth"])  # host readback = sync
        lat.append((time.perf_counter() - t0) * 1e3)
    return {"p50_ms": round(_percentile(lat, 50), 2),
            "p90_ms": round(_percentile(lat, 90), 2),
            "mean_ms": round(sum(lat) / len(lat), 2)}


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--model_cfg_path",
                   default=os.path.join(os.path.dirname(__file__), "..",
                                        "configs",
                                        "rdf_cycle_patchgan_config.yaml"))
    p.add_argument("--batch", type=int, default=1)
    p.add_argument("--iters", type=int, default=50)
    p.add_argument("--out_height", type=int, default=224)
    p.add_argument("--out_width", type=int, default=304)
    p.add_argument("--depth_only", action="store_true", default=False,
                   help="serve the pred_depth-only program (G_label skipped "
                        "+ pruned — tools/export_model.py --depth_only)")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax import export as jexport

    from rdfc_gan_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()

    from rdfc_gan_tpu.config import default_config, load_config
    from rdfc_gan_tpu.engines import build_engine

    cfg = default_config()
    load_config(cfg, args.model_cfg_path)
    cfg.merge(dict(batch_size=args.batch, out_height=args.out_height,
                   out_width=args.out_width, num_classes=14))
    engine = build_engine(cfg, is_train=False)

    rng = np.random.default_rng(0)
    b, h, w = args.batch, args.out_height, args.out_width
    sample = {"rgb": rng.standard_normal((b, h, w, 3), dtype=np.float32),
              "raw_depth": rng.standard_normal((b, h, w, 1),
                                               dtype=np.float32),
              "gt_depth": np.zeros((b, h, w, 1), np.float32)}
    state = engine.init_state(jax.random.PRNGKey(0), sample)

    if args.depth_only:
        import functools

        fn = jax.jit(functools.partial(engine._forward_test_impl,
                                       depth_only=True))
        state_params = {k: v for k, v in state.params.items()
                        if k != "G_label"}
        state_stats = {k: v for k, v in state.batch_stats.items()
                       if k != "G_label"}
    else:
        fn = jax.jit(engine._forward_test_impl)
        state_params, state_stats = state.params, state.batch_stats
    params = jax.device_put(state_params)
    stats = jax.device_put(state_stats)

    # the serving loop's per-call H2D of the image is part of the latency;
    # params/stats stay resident (they would on any real server)
    def live_call(rgb_np, depth_np):
        return fn(params, stats, jnp.asarray(rgb_np), jnp.asarray(depth_np))

    exp = jexport.export(fn)(state_params, state_stats,
                             jnp.asarray(sample["rgb"]),
                             jnp.asarray(sample["raw_depth"]))
    restored = jexport.deserialize(exp.serialize())

    def export_call(rgb_np, depth_np):
        return restored.call(params, stats, jnp.asarray(rgb_np),
                             jnp.asarray(depth_np))

    # The raw `restored.call` path rebuilds a custom_vjp wrapper, flattens
    # the full params/stats pytree and re-binds the call_exported primitive
    # through eager dispatch ON EVERY CALL (jax _export.py `call`); with the
    # ~10^3-leaf flagship state that Python work is the r4 "+57 ms/call
    # calling-convention overhead". Wrapping the SAME bound method once in
    # jax.jit traces it a single time and every later call takes the cached
    # C++ pjit fast path — this is the recommended serving loop.
    jitted_restored = jax.jit(restored.call)

    def export_call_jit(rgb_np, depth_np):
        return jitted_restored(params, stats, jnp.asarray(rgb_np),
                               jnp.asarray(depth_np))

    call_args = (sample["rgb"], sample["raw_depth"])
    live = _time_calls(live_call, call_args, args.iters)
    aot = _time_calls(export_call, call_args, args.iters)
    aot_jit = _time_calls(export_call_jit, call_args, args.iters)

    dev = jax.devices()[0]
    print(json.dumps({
        "metric": "export_serving_latency", "batch": args.batch,
        "depth_only": args.depth_only,
        "shape": [h, w], "device": str(dev.device_kind),
        "platform": dev.platform,
        "aot_export_raw": aot, "aot_export_jit_wrapped": aot_jit,
        "live_jit": live,
        "aot_fps": round(1000.0 * args.batch / aot_jit["mean_ms"], 1),
    }))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
