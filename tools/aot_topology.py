"""AOT multi-chip scaling dossier: compile the flagship DP train step
against a real TPU topology and audit its collectives.

Real multi-chip hardware is not reachable from this host, but XLA's
compile-only PJRT client is: ``jax.experimental.topologies.get_topology_desc``
yields compile-only devices for an arbitrary TPU slice, and ``jit(...).lower``
+ ``.compile`` produce the EXACT optimized multi-chip program — same
partitioner, same collective insertion — that those chips would execute.
This replaces the reference's DDP layer (RDFC-GAN/lib/models/rdfc_gan.py:
102-119 per-net DistributedDataParallel + train.py:31-33 NCCL init) with
quantified TPU evidence instead of "XLA will do it":

1. the compiled HLO's collective inventory (what the partitioner actually
   inserted for the gradient reduction of the 6-net / 4-optimizer step);
2. per-device memory from XLA's own memory analysis (does bs8/chip fit);
3. an ICI cost-model projection of DP scaling from the measured single-chip
   step time (PERF_AB.jsonl) + the audited all-reduce bytes.

Usage:
  python tools/aot_topology.py [--topology v5e:2x4] [--per_chip_batch 8]
      [--measured_step_ms 254.8] [--out MULTICHIP_AOT.json]

Writes one JSON document (default MULTICHIP_AOT.json at the repo root).
"""

from __future__ import annotations

import argparse
import collections
import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# topology compile needs no real device; keep the wedge-prone tunnel
# backend out of the process unless the caller insists otherwise
os.environ.setdefault("JAX_PLATFORMS", "cpu")

# ---------------------------------------------------------------- ICI model
# TPU v5e ICI (public numbers, jax-ml.github.io/scaling-book): 2D torus,
# one-way link bandwidth 4.5e10 B/s per axis direction. Small slices
# (< 16 per axis) are open meshes, not tori — a bidirectional-ring
# all-reduce then runs at half the wrapped-torus rate on that axis. We
# report the projection as a band [torus-rate, mesh-rate] instead of
# pretending one number.
V5E_ICI_ONEWAY_BPS = 4.5e10
# per-collective launch+hop latency for the many tiny (sub-MB) collectives
# — the 8-chip program carries one ~48-float stat all-reduce per BatchNorm
# reduce (GSPMD partitions the global-batch reduction = SyncBN semantics by
# construction). Reported as a [low, high] band; the true number is
# topology/runtime dependent.
ICI_SMALL_COLLECTIVE_US = (2.0, 5.0)


def allreduce_ms(nbytes: float, n_chips: int, n_axes: int,
                 torus: bool) -> float:
    """Bandwidth-optimal ring all-reduce: 2*B*(N-1)/N over the aggregate
    ICI bandwidth. Bidirectional rings on both mesh axes; open-mesh axes
    halve the usable rate (data must flow back through the same links)."""
    if n_chips <= 1:
        return 0.0
    agg = n_axes * V5E_ICI_ONEWAY_BPS * 2.0  # both directions per axis
    if not torus:
        agg /= 2.0
    return 2.0 * nbytes * (n_chips - 1) / n_chips / agg * 1e3


# ------------------------------------------------------------- HLO parsing
_SHAPE_RE = re.compile(r"([a-z0-9]+)\[([0-9,]*)\]")
_DTYPE_BYTES = {"f32": 4, "bf16": 2, "f16": 2, "s32": 4, "u32": 4, "pred": 1,
                "s8": 1, "u8": 1, "f64": 8, "s64": 8, "u64": 8}


def shape_bytes(shape_str: str) -> int:
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


# the shape may be a TUPLE with nested parens in its layout annotations
# (e.g. "(f32[48]{0:T(128)S(1)}, f32[48]{0:T(128)S(1)}) all-reduce(") — match
# the op token first and take everything between "=" and it as the shape.
_COLL_RE = re.compile(
    r"=\s*(.*?)\s+"
    r"(all-reduce|all-gather|reduce-scatter|collective-permute|all-to-all)"
    r"(-start)?\(")


def audit_collectives(hlo_text: str):
    """Inventory of collective ops in the optimized HLO: count + bytes per
    kind + the largest instances, plus a small/large split (cross-replica
    BatchNorm stat syncs are many tiny latency-bound all-reduces; the
    gradient reduction is few large bandwidth-bound ones). *-done ops are
    skipped (the -start carries the shape; counting both would double)."""
    by_kind = collections.Counter()
    bytes_by_kind = collections.Counter()
    small = {"count": 0, "bytes": 0}   # < 1 MB: latency-bound (BN syncs...)
    large = {"count": 0, "bytes": 0}
    largest = []
    for line in hlo_text.splitlines():
        if "-done(" in line or " get-tuple-element(" in line:
            continue
        m = _COLL_RE.search(line)
        if not m:
            continue
        shape, kind, _start = m.groups()
        b = shape_bytes(shape)
        by_kind[kind] += 1
        bytes_by_kind[kind] += b
        bucket = small if b < 1 << 20 else large
        bucket["count"] += 1
        bucket["bytes"] += b
        mm = re.search(r'op_name="([^"]*)"', line)
        largest.append((b, kind, shape[:120], mm.group(1) if mm else ""))
    largest.sort(reverse=True)
    return {
        "counts": dict(by_kind),
        "bytes": {k: int(v) for k, v in bytes_by_kind.items()},
        "small_lt_1mb": small,
        "large_ge_1mb": large,
        "top": [{"bytes": b, "kind": k, "shape": s, "op_name": o}
                for b, k, s, o in largest[:12]],
    }


# ------------------------------------------------------------------- build
def build_step(per_chip_batch: int, n_devices: int):
    """Flagship full-width engine + abstract (state, batch, seed) avals for
    the bf16 bs-per-chip train step, exactly as bench.py measures it."""
    import jax
    import numpy as np

    from __graft_entry__ import _flagship_cfg, _synth_batch
    from rdfc_gan_tpu.engines import build_engine

    cfg = _flagship_cfg()
    cfg.merge(dict(batch_size=per_chip_batch * n_devices, remat=False))
    engine = build_engine(cfg, is_train=True, steps_per_epoch=100)

    # one host-side sample row to derive batch avals; never materialized
    # at the global size
    row = _synth_batch(cfg, 1)
    global_batch = {k: jax.ShapeDtypeStruct(
        (per_chip_batch * n_devices,) + v.shape[1:], v.dtype)
        for k, v in row.items()}

    # abstract state: eval_shape traces init without running it
    state_avals = jax.eval_shape(
        lambda r: engine.init_state(r, {k: np.zeros((2,) + v.shape[1:],
                                                    v.dtype)
                                        for k, v in row.items()}),
        jax.random.PRNGKey(0))
    return engine, state_avals, global_batch


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--topology", default="v5e:2x4",
                   help="PJRT TPU topology name (v5e:2x4 = one v5e-8 host)")
    p.add_argument("--num_slices", type=int, default=1,
                   help=">1 compiles a multi-slice (DCN-connected) program")
    p.add_argument("--per_chip_batch", type=int, default=8)
    p.add_argument("--measured_step_ms", type=float, default=254.8,
                   help="measured single-chip step time at the same "
                        "per-chip batch (PERF_AB.jsonl round-4 A/B)")
    p.add_argument("--out", default=os.path.join(
        os.path.dirname(__file__), "..", "MULTICHIP_AOT.json"))
    p.add_argument("--dump_hlo", default="",
                   help="optional path to dump the optimized HLO text")
    args = p.parse_args()

    import jax
    import numpy as np
    from jax.experimental import topologies
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    t0 = time.time()
    kwargs = {}
    if args.num_slices > 1:
        kwargs["num_slices"] = args.num_slices
    topo = topologies.get_topology_desc(args.topology, "tpu", **kwargs)
    devs = np.array(topo.devices)
    n = devs.size
    print(f"topology {args.topology} x{args.num_slices}: {n} compile-only "
          f"devices ({devs.flat[0].device_kind})", flush=True)

    mesh = Mesh(devs.reshape(n), ("data",))
    engine, state_avals, batch_avals = build_step(args.per_chip_batch, n)

    repl = NamedSharding(mesh, P())
    dp = NamedSharding(mesh, P("data"))

    def with_sh(aval, sh):
        return jax.ShapeDtypeStruct(aval.shape, aval.dtype, sharding=sh)

    state_in = jax.tree.map(lambda a: with_sh(a, repl), state_avals)
    batch_in = {k: with_sh(v, dp) for k, v in batch_avals.items()}
    seed_in = with_sh(jax.ShapeDtypeStruct((2,), np.uint32), repl)

    def step(state, batch, seed):
        rng = jax.random.wrap_key_data(seed)
        return engine._train_step_impl(state, batch, rng)

    print("lowering...", flush=True)
    lowered = jax.jit(step, donate_argnums=(0,)).lower(
        state_in, batch_in, seed_in)
    t_lower = time.time() - t0
    print(f"lowered in {t_lower:.0f}s; compiling for {n} chips...",
          flush=True)
    compiled = lowered.compile()
    t_compile = time.time() - t0 - t_lower
    print(f"compiled in {t_compile:.0f}s", flush=True)

    hlo = compiled.as_text()
    if args.dump_hlo:
        with open(args.dump_hlo, "w") as f:
            f.write(hlo)
    coll = audit_collectives(hlo)

    cost = compiled.cost_analysis() or {}
    mem = compiled.memory_analysis()
    mem_d = {}
    for k in ("argument_size_in_bytes", "output_size_in_bytes",
              "temp_size_in_bytes", "generated_code_size_in_bytes",
              "alias_size_in_bytes"):
        v = getattr(mem, k, None)
        if v is not None:
            mem_d[k] = int(v)

    # ---------------- scaling projection (documented assumptions above)
    ar_bytes = coll["bytes"].get("all-reduce", 0)
    # non-all-reduce collective bytes (collective-permute / all-to-all the
    # partitioner inserted) cross the ICI once; small (<1 MB) collectives
    # are latency-bound — charge the per-op launch+hop band instead of
    # bandwidth (they are BN stat syncs of ~200 B each)
    other_bytes = sum(v for k, v in coll["bytes"].items()
                      if k != "all-reduce")
    n_small = coll["small_lt_1mb"]["count"]
    # grad truth: trainable param bytes of the state (f32 grads)
    import jax.numpy as jnp  # noqa: F401

    param_bytes = sum(
        int(np.prod(a.shape)) * a.dtype.itemsize
        for a in jax.tree.leaves(state_avals.params))
    axes = 2 if "x" in args.topology.split(":")[-1] else 1
    t1 = args.measured_step_ms
    per_chip = args.per_chip_batch

    def comm_ms(torus: bool) -> float:
        agg = axes * V5E_ICI_ONEWAY_BPS * 2.0 / (1.0 if torus else 2.0)
        lat_us = ICI_SMALL_COLLECTIVE_US[0 if torus else 1]
        return (allreduce_ms(ar_bytes, n, axes, torus=torus)
                + other_bytes / agg * 1e3
                + n_small * lat_us * 1e-3)

    def project(t_ar):
        # pessimistic: zero overlap of the grad all-reduce with backward
        # compute (XLA overlaps in practice — latency-hiding scheduler)
        t_noverlap = t1 + t_ar
        # optimistic: full overlap (comm < compute here by a wide margin)
        t_overlap = max(t1, t_ar)
        return {
            "comm_ms": round(t_ar, 2),
            "step_ms_no_overlap": round(t_noverlap, 2),
            "step_ms_full_overlap": round(t_overlap, 2),
            "imgs_per_sec_no_overlap": round(
                n * per_chip / t_noverlap * 1e3, 1),
            "imgs_per_sec_full_overlap": round(
                n * per_chip / t_overlap * 1e3, 1),
            "dp_efficiency_no_overlap": round(t1 / t_noverlap, 4),
        }

    doc = {
        "metric": "aot_topology_dp_scaling",
        "topology": args.topology,
        "num_slices": args.num_slices,
        "n_chips": n,
        "device_kind": str(devs.flat[0].device_kind),
        "per_chip_batch": per_chip,
        "global_batch": per_chip * n,
        "lower_s": round(t_lower, 1),
        "compile_s": round(t_compile, 1),
        "collectives": coll,
        "param_bytes_f32": int(param_bytes),
        "cost_analysis": {k: float(cost[k]) for k in
                          ("flops", "bytes accessed") if k in cost},
        "memory_analysis_per_device": mem_d,
        "measured_single_chip_step_ms": t1,
        "ici_model": {
            "link_oneway_Bps": V5E_ICI_ONEWAY_BPS,
            "axes_used": axes,
            "note": "band = [wrapped-torus rate, open-mesh rate]; v5e "
                    "slices smaller than 16 per axis are open meshes",
        },
        "projection_torus": project(comm_ms(torus=True)),
        "projection_mesh": project(comm_ms(torus=False)),
    }
    with open(args.out, "w") as f:
        json.dump(doc, f, indent=1)
    print(json.dumps({k: doc[k] for k in
                      ("topology", "n_chips", "collectives",
                       "projection_mesh")}, indent=1))
    print(f"wrote {os.path.abspath(args.out)}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
