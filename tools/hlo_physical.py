"""Physical (layout-padded) HBM traffic ranking from a dumped HLO file.

tools/hlo_audit.py ranks by LOGICAL bytes; TPU tiled layouts pad the minor
dim to 128 lanes and the second-minor to 8 sublanes (x2-packed for 16-bit
types), so low-channel tensors physically move up to 8x their logical
bytes and a logical ranking is blind to them. This parses the layout
annotations ({perm:T(8,128)(2,1)}) and prints traffic ranked by PHYSICAL
bytes, plus the padding waste per shape.

Usage: python tools/hlo_physical.py /tmp/step_hlo.txt [--top 40]
"""

from __future__ import annotations

import argparse
import collections
import math
import re

_DTYPE_BYTES = {"f32": 4, "bf16": 2, "f16": 2, "s32": 4, "u32": 4, "pred": 1,
                "s8": 1, "u8": 1, "f64": 8, "s64": 8, "u64": 8, "s16": 2,
                "u16": 2}

# dtype[dims]{minor_to_major:T(a,b)(c,d)...}
_SHAPE_RE = re.compile(
    r"([a-z0-9]+)\[([0-9,]*)\](?:\{([0-9,]+)(?::T\((\d+),(\d+)\)"
    r"(?:\((\d+),(\d+)\))?[^}]*)?\})?")

_COMP_RE = re.compile(r"^(?:ENTRY\s+)?%?([\w.-]+)\s+\([^)]*\)\s*->")
_INSTR_RE = re.compile(
    r"^\s*(?:ROOT\s+)?%?([\w.-]+)\s*=\s*((?:\([^)]*\)|[a-z0-9]+\[[0-9,]*\]"
    r"(?:\{[^}]*\})?))\s+([\w-]+)\(")
_OPND_RE = re.compile(r"%([\w.-]+)")


def physical_bytes(m) -> int:
    dt, dims_s, order_s, ta, tb, pa, pb = m.groups()
    if dt not in _DTYPE_BYTES:
        return 0
    b = _DTYPE_BYTES[dt]
    dims = [int(d) for d in dims_s.split(",") if d]
    if not dims:
        return b
    if not order_s or not ta:
        n = 1
        for d in dims:
            n *= d
        return n * b
    order = [int(i) for i in order_s.split(",")]
    ta, tb = int(ta), int(tb)
    if pa:  # sub-int32 packing tile, e.g. (2,1) for bf16
        ta *= int(pa)
    minor = dims[order[0]]
    n = math.ceil(minor / tb) * tb
    if len(dims) > 1:
        subminor = dims[order[1]]
        n *= math.ceil(subminor / ta) * ta
        for i in order[2:]:
            n *= dims[i]
    return n * b


def shape_phys_logical(shape_str: str):
    phys = logical = 0
    for m in _SHAPE_RE.finditer(shape_str):
        p = physical_bytes(m)
        phys += p
        dt, dims_s = m.group(1), m.group(2)
        if dt in _DTYPE_BYTES:
            n = 1
            for d in dims_s.split(","):
                if d:
                    n *= int(d)
            logical += n * _DTYPE_BYTES[dt]
    return phys, logical


def main():
    p = argparse.ArgumentParser()
    p.add_argument("hlo_file")
    p.add_argument("--top", type=int, default=40)
    args = p.parse_args()

    text = open(args.hlo_file).read()
    size = {}
    lines = text.splitlines()
    in_fusion = False
    for line in lines:
        cm = _COMP_RE.match(line)
        if cm:
            in_fusion = cm.group(1).startswith("fused_computation")
            continue
        if in_fusion:
            continue
        m = _INSTR_RE.match(line)
        if m:
            size[m.group(1)] = shape_phys_logical(m.group(2))

    by_shape_phys = collections.Counter()
    by_shape_logical = collections.Counter()
    tot_phys = tot_log = 0
    in_fusion = False
    for line in lines:
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
        ph, lg = shape_phys_logical(shape)
        rest = line.split(f"{op}(", 1)[-1].split(")")[0]
        for on in _OPND_RE.findall(rest):
            p2, l2 = size.get(on, (0, 0))
            ph += p2
            lg += l2
        key = re.sub(r"\{[^}]*\}", "", shape)
        by_shape_phys[key] += ph
        by_shape_logical[key] += lg
        tot_phys += ph
        tot_log += lg

    print(f"TOTAL approx traffic: physical {tot_phys/1e9:.1f} GB, "
          f"logical {tot_log/1e9:.1f} GB, pad waste "
          f"{(tot_phys-tot_log)/1e9:.1f} GB "
          f"({100*(tot_phys/max(tot_log,1)-1):.0f}%)")
    print(f"\n== traffic by shape, physical GB (pad factor), top {args.top} ==")
    for sh, b in by_shape_phys.most_common(args.top):
        lg = by_shape_logical[sh]
        print(f"  {b/1e9:7.2f} GB  x{b/max(lg,1):4.2f}  {sh}")


if __name__ == "__main__":
    main()
