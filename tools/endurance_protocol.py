"""Full-protocol endurance + resume-equivalence exercise (VERDICT r4 #6).

Two phases over the 200-scene real-file NYUv2 fixture at tiny width:

A. **Endurance**: the reference's full 150-epoch training envelope
   (config.py:44-55 — Adam, linear LR decay from epoch 100) end-to-end
   through train.py, with periodic eval + checkpointing. Proves the
   scheduler zoo, checkpoint rotation, best-tracking and logger survive
   the complete protocol, not just 3-30 epoch fixtures.

B. **Resume equivalence**: train 2N epochs straight vs N epochs +
   ``--resume_from`` + N more — the 8-metric eval of both final
   checkpoints must match. train.py derives the per-step RNG from the
   GLOBAL step (it = start_epoch * steps_per_epoch + i) and optax
   schedule state rides in the checkpoint, so a resumed run replays the
   exact key stream of an uninterrupted one (reference counterpart:
   checkpoint.py:138-168 resume_from).

Usage:
  python tools/endurance_protocol.py [--epochs 150] [--n 3]
      [--data_root /tmp/nyuv2_endurance] [--work /tmp/endurance]
      [--skip_endurance] [--skip_resume]

Writes ENDURANCE.json at the repo root with both phases' evidence.
"""

from __future__ import annotations

import argparse
import json
import os
import re
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
ROOT = os.path.abspath(os.path.join(HERE, ".."))
sys.path.insert(0, ROOT)

METRICS = ["RMSE", "MAE", "iRMSE", "iMAE", "REL", "D^1", "D^2", "D^3"]


def run(cmd, log_to=None):
    print("+ " + " ".join(cmd), flush=True)
    t0 = time.time()
    r = subprocess.run(cmd, cwd=ROOT, capture_output=True, text=True)
    dt = time.time() - t0
    if log_to:
        with open(log_to, "w") as f:
            f.write(r.stdout + "\n--- stderr ---\n" + r.stderr)
    if r.returncode != 0:
        print(r.stdout[-4000:])
        print(r.stderr[-4000:])
        raise SystemExit(f"command failed rc={r.returncode}")
    return dt


def parse_metrics(log_path):
    """Last 8-metric block from a train/test log."""
    vals = {}
    with open(log_path) as f:
        for line in f:
            m = re.search(r"INFO (\w+\^?\d?): ([\d.eE+-]+)", line)
            if m and m.group(1) in METRICS:
                vals[m.group(1)] = float(m.group(2))
    missing = [k for k in METRICS if k not in vals]
    assert not missing, f"metrics missing from {log_path}: {missing}"
    return vals


def train_cmd(args, work_dir, n_epochs, extra=()):
    return [sys.executable, "train.py",
            "--dataset", "nyuv2", "--data_root", args.data_root,
            "--model_cfg_path", "configs/rdfc_gan_tiny.yaml",
            "--work_dir", work_dir, "--batch_size", "8",
            "--n_epochs", str(n_epochs), "--num_classes", "14",
            "--seed", "7", "--log_interval", "50",
            "--sample_interval", "1000000",
            "--num_workers", "2", *extra]


def eval_cmd(args, work_dir, ckpt):
    return [sys.executable, "test.py",
            "--dataset", "nyuv2", "--data_root", args.data_root,
            "--model_cfg_path", "configs/rdfc_gan_tiny.yaml",
            "--work_dir", work_dir, "--batch_size", "8",
            "--num_classes", "14", "--seed", "7",
            "--load_from", ckpt]


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--data_root", default="/tmp/nyuv2_endurance")
    p.add_argument("--work", default="/tmp/endurance")
    p.add_argument("--epochs", type=int, default=150)
    p.add_argument("--n", type=int, default=3,
                   help="resume A/B: 2N straight vs N + resume + N")
    p.add_argument("--scenes", type=int, default=200)
    p.add_argument("--skip_endurance", action="store_true")
    p.add_argument("--skip_resume", action="store_true")
    p.add_argument("--out", default=os.path.join(ROOT, "ENDURANCE.json"))
    args = p.parse_args()

    from tools.bench_e2e import ensure_fixture

    ensure_fixture(args.data_root, args.scenes)
    os.makedirs(args.work, exist_ok=True)
    doc = {"fixture_scenes": args.scenes, "width": "tiny (configs/"
           "rdfc_gan_tiny.yaml)", "shape": "224x304", "batch": 8}

    if not args.skip_endurance:
        d = os.path.join(args.work, "full150")
        dt = run(train_cmd(args, d, args.epochs,
                           extra=("--save_interval", "50",
                                  "--val_interval", "30")),
                 log_to=os.path.join(args.work, "full150.out"))
        final = parse_metrics(os.path.join(d, "train.log"))
        ckpts = sorted(f for f in os.listdir(d) if f.endswith(".ckpt"))
        doc["endurance"] = {
            "epochs": args.epochs,
            "schedule": "linear decay from epoch 100 (reference "
                        "config.py:44-55)",
            "wall_s": round(dt, 1),
            "final_eval": final,
            "checkpoints": ckpts,
        }
        print("endurance:", json.dumps(doc["endurance"]), flush=True)

    if not args.skip_resume:
        n = args.n
        d_straight = os.path.join(args.work, "straight")
        d_half = os.path.join(args.work, "half")
        d_resumed = os.path.join(args.work, "resumed")
        # straight: 2N epochs, ckpt at 2N
        run(train_cmd(args, d_straight, 2 * n,
                      extra=("--save_interval", str(2 * n),
                             "--val_interval", "1000")),
            log_to=os.path.join(args.work, "straight.out"))
        # half: N epochs, ckpt at N
        run(train_cmd(args, d_half, n,
                      extra=("--save_interval", str(n),
                             "--val_interval", "1000")),
            log_to=os.path.join(args.work, "half.out"))
        # resumed: N more from the half ckpt, into a fresh dir
        run(train_cmd(args, d_resumed, 2 * n,
                      extra=("--save_interval", str(2 * n),
                             "--val_interval", "1000", "--resume_from",
                             os.path.join(d_half, f"epoch_{n}.ckpt"))),
            log_to=os.path.join(args.work, "resumed.out"))

        ck_s = os.path.join(d_straight, f"epoch_{2 * n}.ckpt")
        ck_r = os.path.join(d_resumed, f"epoch_{2 * n}.ckpt")
        run(eval_cmd(args, os.path.join(args.work, "eval_straight"), ck_s))
        run(eval_cmd(args, os.path.join(args.work, "eval_resumed"), ck_r))
        m_s = parse_metrics(os.path.join(args.work, "eval_straight",
                                         "train.log"))
        m_r = parse_metrics(os.path.join(args.work, "eval_resumed",
                                         "train.log"))
        drift = {k: abs(m_s[k] - m_r[k]) for k in METRICS}
        doc["resume_equivalence"] = {
            "n": n, "straight": m_s, "resumed": m_r,
            "abs_drift": drift,
            "max_abs_drift": max(drift.values()),
            "exact": m_s == m_r,
        }
        print("resume A/B:", json.dumps(doc["resume_equivalence"]),
              flush=True)

    with open(args.out, "w") as f:
        json.dump(doc, f, indent=1)
    print(f"wrote {args.out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
