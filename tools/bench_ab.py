"""Round-4 A/B sweep of the round-3 byte-cut fast paths on the real chip.

Each config runs tools/bench_step.py in a fresh subprocess (the toggles are
read at trace time, and a fresh process guarantees no jit-cache bleed).
Results append to PERF_AB.jsonl, one JSON line per config, so a partial
sweep still records evidence.

Usage: python tools/bench_ab.py [--iters 30] [--only tag1,tag2]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# tag -> extra env. Round-4 defaults: outres VJPs and Pallas IN are OFF
# (the r4 A/B measured them neutral / -23 ms regressive on chip — see
# docs/PERF_NOTES.md round-4); the opt-in tags re-measure them.
CONFIGS = {
    "default": {},
    # round-3 batch-2 pieces, opt-in for re-measurement
    "outres": {"RDFC_OUTRES_VJP": "all"},
    "outres_bn": {"RDFC_OUTRES_VJP": "bn"},
    "outres_in": {"RDFC_OUTRES_VJP": "in"},
}
# retired tags (code now in attic/): "pallas_in" (r4: regressed -23 ms),
# "pallas_in_db" (r5: double-buffer-only mode, 255.7 vs 255.8 default —
# exactly neutral), fused_blocks (r4: 298.1 vs 254.8)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--iters", type=int, default=30)
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--nlspn", action="store_true")
    p.add_argument("--remat", default="none")
    p.add_argument("--only", default="")
    p.add_argument("--out", default=os.path.join(ROOT, "PERF_AB.jsonl"))
    args = p.parse_args()

    tags = [t for t in args.only.split(",") if t] or list(CONFIGS)
    for tag in tags:
        env = dict(os.environ, **CONFIGS[tag])
        cmd = [sys.executable, os.path.join(ROOT, "tools", "bench_step.py"),
               "--batch", str(args.batch), "--iters", str(args.iters),
               "--remat", args.remat, "--tag", tag]
        if args.nlspn:
            cmd.append("--nlspn")
        print(f"[ab] {tag} ...", flush=True)
        r = subprocess.run(cmd, env=env, capture_output=True, text=True,
                           timeout=3600)
        line = r.stdout.strip().splitlines()[-1] if r.stdout.strip() else ""
        rec = {"tag": tag, "nlspn": args.nlspn}
        try:
            rec.update(json.loads(line))
        except (json.JSONDecodeError, ValueError):
            rec["error"] = (r.stderr or "no output").strip()[-500:]
        with open(args.out, "a") as f:
            f.write(json.dumps(rec) + "\n")
        print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
