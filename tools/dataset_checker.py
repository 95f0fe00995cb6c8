"""Dataset smoke checker (parity: RDFC-GAN/dataset_checker.py:8-54).

Instantiates each registered dataset and pulls one sample, reporting key
shapes/dtypes. Works out of the box for `synthetic`; real datasets need
--data_root pointing at their layout.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def check(name: str, **kwargs):
    from rdfc_gan_tpu.registry import build_dataset

    try:
        ds = build_dataset(dict(type=name, **kwargs))
        sample = ds[0]
        print(f"[{name}] len={len(ds)}")
        for k, v in sample.items():
            import numpy as np

            v = np.asarray(v)
            print(f"  {k}: shape={v.shape} dtype={v.dtype} "
                  f"range=({v.min():.3f}, {v.max():.3f})")
    except Exception as e:
        print(f"[{name}] FAILED: {type(e).__name__}: {e}")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--dataset", default="synthetic")
    p.add_argument("--data_root", default=None)
    p.add_argument("--mode", default="train")
    args = p.parse_args()

    import rdfc_gan_tpu.data  # noqa: F401  (registers datasets)

    kwargs = {"mode": args.mode}
    if args.data_root:
        kwargs["data_root"] = args.data_root
    check(args.dataset, **kwargs)


if __name__ == "__main__":
    main()
