"""Regenerate the committed dryrun compile cache (.jax_cache_dryrun/).

The driver's multichip dryrun runs on THIS 1-core host with a cold XLA
cache each round (MULTICHIP_r03: 374 s of the 420 s budget was one
compile). This script runs the full three-pass dryrun once with the cache
pointed at the committed seed directory; commit the result so the next
driver run compiles from disk.

Run AFTER any model/engine code change (stale entries are harmless — the
key no longer matches — but the driver then pays cold compiles again):

    python tools/warm_dryrun_cache.py [--n 8] [--budget 9000]

Prints per-pass wall times twice (cold-ish generation, then a warm
verification run in a fresh process) so the warm gate multipliers in
__graft_entry__.dryrun_multichip stay calibrated.
"""

from __future__ import annotations

import argparse
import os
import shutil
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_once(n: int, budget: int) -> float:
    env = dict(os.environ, GRAFT_DRYRUN_BUDGET=str(budget),
               GRAFT_DRYRUN_WARM_CACHE="1")
    t0 = time.time()
    r = subprocess.run(
        [sys.executable, "-c",
         "from __graft_entry__ import dryrun_multichip; "
         f"dryrun_multichip({n})"],
        cwd=ROOT, env=env, text=True)
    dt = time.time() - t0
    if r.returncode != 0:
        raise SystemExit(f"dryrun failed rc={r.returncode}")
    return dt


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--n", type=int, default=8)
    p.add_argument("--budget", type=int, default=9000)
    p.add_argument("--fresh", action="store_true",
                   help="wipe the seed dir first (full regeneration)")
    p.add_argument("--skip-verify", action="store_true")
    args = p.parse_args()

    seed = os.path.join(ROOT, ".jax_cache_dryrun")
    if args.fresh and os.path.isdir(seed):
        shutil.rmtree(seed)
    t_gen = run_once(args.n, args.budget)
    size = sum(os.path.getsize(os.path.join(seed, f))
               for f in os.listdir(seed)) if os.path.isdir(seed) else 0
    print(f"[warm_dryrun_cache] generation pass: {t_gen:.0f}s, "
          f"cache {size / 1e6:.1f} MB, {len(os.listdir(seed))} entries")
    if not args.skip_verify:
        t_warm = run_once(args.n, args.budget)
        print(f"[warm_dryrun_cache] warm verification pass: {t_warm:.0f}s "
              f"(driver budget default 420s)")


if __name__ == "__main__":
    main()
