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


_COMP_RE = re.compile(r"^(?:ENTRY\s+)?%?([\w.-]+)\s+\([^)]*\)\s*->")


def audit(hlo_text: str, top: int = 40):
    by_op = collections.Counter()
    by_dtype = collections.Counter()
    writers = []
    in_fusion_body = False
    for line in hlo_text.splitlines():
        cm = _COMP_RE.match(line)
        if cm:
            # fusion bodies describe fused (HBM-free) ops — skip them; every
            # other computation (entry, while/cond/scan regions) allocates
            in_fusion_body = cm.group(1).startswith("fused_computation")
            continue
        if in_fusion_body:
            continue
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
    p.add_argument("--component", default=None,
                   help="audit one sub-net's grad instead of the full step "
                        "(e.g. G_A2B)")
    p.add_argument("--top", type=int, default=40)
    p.add_argument("--out", default=None, help="also dump full HLO here")
    p.add_argument("--remat", default=None,
                   choices=["none", "selective", "all"],
                   help="override cfg.remat for the audited step")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from rdfc_gan_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()
    from __graft_entry__ import _flagship_cfg, _synth_batch
    from rdfc_gan_tpu.engines import build_engine

    cfg = _flagship_cfg()
    cfg.merge(dict(batch_size=args.batch))
    if args.remat:
        cfg.merge(dict(remat={"none": False, "selective": "selective",
                              "all": True}[args.remat]))
    if args.nlspn:
        cfg.model.G_A2B.merge(dict(use_nlspn_refine=True))
    engine = build_engine(cfg, is_train=not args.fwd, steps_per_epoch=100)
    batch = jax.tree.map(jnp.asarray, _synth_batch(cfg, args.batch))
    rng = jax.random.PRNGKey(0)
    state = engine.init_state(rng, batch)

    if args.component:
        name = args.component
        rngs = ({"dropout": jax.random.PRNGKey(7)} if name == "G_label"
                else None)
        inputs = {"G_A2B": (batch["rgb"], batch["raw_depth"], batch["rgb"]),
                  "G_B2A": (batch["gt_depth"],),
                  "G_normal": (batch["rgb"],),
                  "G_label": (batch["rgb"],)}[name]

        def f(p, s, *a):
            out, _ = engine._apply(engine.modules[name], p, s, *a,
                                   train=True, rngs=rngs, name=name)
            leaves = [l for l in jax.tree.leaves(out)
                      if hasattr(l, "dtype") and jnp.issubdtype(
                          l.dtype, jnp.floating)]
            return sum(jnp.sum(l.astype(jnp.float32)) for l in leaves)

        lowered = jax.jit(lambda p, s, *a: jax.grad(f)(p, s, *a)).lower(
            state.params[name], state.batch_stats[name], *inputs)
    elif args.fwd:
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

    print("\n== approx traffic (writes + operand reads) by shape, top 30 ==")
    by_shape = traffic_by_shape(texts)
    for sh, b in by_shape.most_common(30):
        print(f"  {b / 1e9:7.2f} GB  {sh}")


_OPND_RE = re.compile(r"%([\w.-]+)")


def traffic_by_shape(hlo_text: str):
    """Approximate per-shape HBM traffic: for every non-fused top-level
    instruction, its output bytes plus its operands' output bytes (reads).
    Over-counts aliased/in-place buffers; good for RANKING shapes only."""
    size = {}
    in_fusion = False
    for line in hlo_text.splitlines():
        cm = _COMP_RE.match(line)
        if cm:
            in_fusion = cm.group(1).startswith("fused_computation")
            continue
        if in_fusion:
            continue
        m = _INSTR_RE.match(line)
        if m:
            size[m.group(1)] = shape_bytes(m.group(2))
    by_shape = collections.Counter()
    in_fusion = False
    for line in hlo_text.splitlines():
        cm = _COMP_RE.match(line)
        if cm:
            in_fusion = cm.group(1).startswith("fused_computation")
            continue
        if in_fusion:
            continue
        m = _INSTR_RE.match(line)
        if not m:
            continue
        name, shape, op = m.groups()
        if op in ("parameter", "constant", "get-tuple-element", "tuple",
                  "bitcast"):
            continue
        rest = line.split(f"{op}(", 1)[-1].split(")")[0]
        t = shape_bytes(shape) + sum(
            size.get(on, 0) for on in _OPND_RE.findall(rest))
        key = re.sub(r"\{[^}]*\}", "", shape)
        by_shape[key] += t
    return by_shape


if __name__ == "__main__":
    main()
