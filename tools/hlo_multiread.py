"""Rank multi-read tensors in a dumped optimized HLO module.

The step is HBM-bandwidth-bound and every component sits at its
logical-byte floor (docs/PERF_NOTES.md round-3 decomposition), so the only
wins left come from REMOVING reads. This tool finds them: instructions in
the entry computation whose output is consumed by two or more compute
fusions — each extra consumer is (approximately) one extra full HBM read
of that buffer. The classic offender is a norm chain: conv output read by
the stats reduce-fusion AND the normalize elementwise-fusion (fixed by
attic/norm_kernel.py, retired); the backward's dy/y double-reads are the same
shape (fixed by the output-residual VJPs in models/layers.py).

Approximations, so treat the output as a RANKING not a byte count:
a slice consumer reads only part of the buffer; a fusion parameter used
twice inside one fusion still counts once; while-loop bodies re-read per
iteration but appear once. Use cost_analysis "bytes accessed" for totals.

Usage: python tools/hlo_multiread.py DUMP.txt [--min-mb 8] [--top 30]
(dump via tools/hlo_audit.py --out, or XLA_FLAGS=--xla_dump_to)
"""

from __future__ import annotations

import argparse
import collections
import re
import sys


def scan(text: str, min_bytes: int, top: int):
    from tools.hlo_audit import shape_bytes

    entries = [m.start() for m in re.finditer(r"^ENTRY ", text, re.M)]
    if not entries:
        raise SystemExit("no ENTRY computation found in dump")
    seg = text[entries[-1]:]
    end = seg.find("\n}\n")
    seg = seg[:end] if end > 0 else seg
    instr_re = re.compile(
        r"^\s*(?:ROOT\s+)?%?([\w.-]+) = ([a-z0-9]+\[[0-9,]*\][^ ]*) "
        r"([\w-]+)\((.*?)\)", re.M)
    defs = {}
    consumers = collections.defaultdict(list)
    for m in instr_re.finditer(seg):
        name, shape, op, args = m.groups()
        defs[name] = (shape, op)
        for a in re.findall(r"%?([\w.-]+)", args):
            consumers[a].append((name, op))

    compute_ops = ("fusion", "convolution", "custom-call", "reduce", "dot")
    rows, total = [], 0
    for name, (shape, op) in defs.items():
        if op in ("parameter", "constant"):
            continue
        fus = [c for c in consumers.get(name, []) if c[0] != name
               and c[1] in compute_ops]
        if len(fus) < 2:
            continue
        b = shape_bytes(shape)
        if b < min_bytes:
            continue
        extra = (len(fus) - 1) * b
        total += extra
        rows.append((extra, name, shape, op, len(fus)))
    rows.sort(reverse=True)
    for r in rows[:top]:
        print(f"{r[0] / 1e6:9.1f} MB extra  {r[3]:>18s} x{r[4]}  "
              f"{r[2]:40s} {r[1][:48]}")
    print(f"TOTAL extra reads (>= {min_bytes // (1024 * 1024)} MB tensors, "
          f"consumers-1 each): {total / 1e9:.2f} GB")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("dump")
    p.add_argument("--min-mb", type=float, default=8.0)
    p.add_argument("--top", type=int, default=30)
    args = p.parse_args()
    scan(open(args.dump).read(), int(args.min_mb * 1024 * 1024), args.top)


if __name__ == "__main__":
    import os

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    main()
