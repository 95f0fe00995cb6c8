"""HLO byte audit of the compiled flagship train step.

The roofline (docs/PERF_NOTES.md) says the step is HBM-bandwidth-bound;
byte REMOVAL is the only lever left. This tool attributes the bytes: it
compiles the real train step, then walks the optimized HLO and aggregates
instruction output sizes by opcode and dtype, prints the top writers, and
reports cost_analysis + memory_analysis totals.

Writes (instruction outputs) are the honest half of HBM traffic a fusion
causes; reads are its operands' outputs, so the same table read twice
approximates total traffic. Good enough to rank optimization targets.

Usage: python tools/hlo_audit.py [--batch 8] [--nlspn] [--fwd] [--out FILE]
"""

from __future__ import annotations

import argparse
import collections
import os
import re
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

_DTYPE_BYTES = {"f32": 4, "bf16": 2, "f16": 2, "s32": 4, "u32": 4, "pred": 1,
                "s8": 1, "u8": 1, "f64": 8, "s64": 8, "u64": 8, "f8e4m3fn": 1,
                "f8e5m2": 1, "s16": 2, "u16": 2}

_SHAPE_RE = re.compile(r"([a-z0-9]+)\[([0-9,]*)\]")


def shape_bytes(shape_str: str) -> int:
    """Total bytes of an HLO shape string, incl. tuple elements."""
    total = 0
    for dt, dims in _SHAPE_RE.findall(shape_str):
        if dt not in _DTYPE_BYTES:
            continue
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        total += n * _DTYPE_BYTES[dt]
    return total


_INSTR_RE = re.compile(
    r"^\s*(?:ROOT\s+)?%?([\w.-]+)\s*=\s*((?:\([^)]*\)|[a-z0-9]+\[[0-9,]*\]"
    r"(?:\{[^}]*\})?))\s+([\w-]+)\(")


def audit(hlo_text: str, top: int = 40):
    by_op = collections.Counter()
    by_dtype = collections.Counter()
    writers = []
    for line in hlo_text.splitlines():
        m = _INSTR_RE.match(line)
        if not m:
            continue
        name, shape, op = m.groups()
        if op in ("parameter", "constant", "get-tuple-element", "tuple",
                  "bitcast"):
            continue
        b = shape_bytes(shape)
        if not b:
            continue
        by_op[op] += b
        for dt, dims in _SHAPE_RE.findall(shape):
            if dt in _DTYPE_BYTES:
                n = 1
                for d in dims.split(","):
                    if d:
                        n *= int(d)
                by_dtype[dt] += n * _DTYPE_BYTES[dt]
        writers.append((b, op, name, shape if len(shape) < 120 else
                        shape[:117] + "..."))
    writers.sort(reverse=True)
    return by_op, by_dtype, writers[:top]


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--nlspn", action="store_true")
    p.add_argument("--fwd", action="store_true",
                   help="audit forward_test instead of the train step")
    p.add_argument("--top", type=int, default=40)
    p.add_argument("--out", default=None, help="also dump full HLO here")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from rdfc_gan_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()
    from __graft_entry__ import _flagship_cfg, _synth_batch
    from rdfc_gan_tpu.engines import build_engine

    cfg = _flagship_cfg()
    cfg.merge(dict(batch_size=args.batch))
    if args.nlspn:
        cfg.model.G_A2B.merge(dict(use_nlspn_refine=True))
    engine = build_engine(cfg, is_train=not args.fwd, steps_per_epoch=100)
    batch = jax.tree.map(jnp.asarray, _synth_batch(cfg, args.batch))
    rng = jax.random.PRNGKey(0)
    state = engine.init_state(rng, batch)

    if args.fwd:
        lowered = jax.jit(engine._forward_test_impl).lower(
            state.params, state.batch_stats, batch["rgb"],
            batch["raw_depth"])
    else:
        lowered = jax.jit(engine._train_step_impl).lower(state, batch, rng)
    compiled = lowered.compile()
    ca = compiled.cost_analysis()
    ca = ca[0] if isinstance(ca, (list, tuple)) else ca
    print(f"cost_analysis: {ca.get('flops', 0) / 1e12:.2f} TFLOP, "
          f"{ca.get('bytes accessed', 0) / 1e9:.1f} GB accessed")
    try:
        mem = compiled.memory_analysis()
        print(f"memory: temp {mem.temp_size_in_bytes / 1e9:.2f} GB, "
              f"argument {mem.argument_size_in_bytes / 1e9:.2f} GB, "
              f"output {mem.output_size_in_bytes / 1e9:.2f} GB")
    except Exception as e:
        print(f"memory_analysis unavailable: {e}")

    texts = compiled.as_text()
    if isinstance(texts, (list, tuple)):
        texts = "\n".join(texts)
    if args.out:
        with open(args.out, "w") as f:
            f.write(texts)
        print(f"HLO dumped to {args.out} ({len(texts) / 1e6:.1f} MB)")

    by_op, by_dtype, top_writers = audit(texts, args.top)
    print("\n== bytes written by opcode (GB) ==")
    for op, b in by_op.most_common(20):
        print(f"  {op:28s} {b / 1e9:8.2f}")
    print("\n== bytes written by dtype (GB) ==")
    for dt, b in by_dtype.most_common():
        print(f"  {dt:8s} {b / 1e9:8.2f}")
    print(f"\n== top {args.top} single writers ==")
    for b, op, name, shape in top_writers:
        print(f"  {b / 1e6:9.1f} MB  {op:22s} {name[:48]:48s} {shape}")


if __name__ == "__main__":
    main()
