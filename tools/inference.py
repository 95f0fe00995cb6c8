"""Single-image inference (parity: RDF-GAN/lib/tools/inference.py:38-94).

Loads an RGB png + a raw-depth png (millimeters), normalizes with the
training statistics, runs the flagship generator, un-normalizes and saves
the completed depth (16-bit png, millimeters) plus a viridis colormap jpg.

Usage:
  python tools/inference.py --model_cfg_path configs/rdf_cycle_patchgan_config.yaml \
      --load_from work/best.ckpt --rgb img.png --depth depth.png --out out.png
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import cv2
import jax
import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--model_cfg_path", required=True)
    p.add_argument("--load_from", default=None)
    p.add_argument("--rgb", required=True)
    p.add_argument("--depth", required=True)
    p.add_argument("--out", default="pred_depth.png")
    p.add_argument("--out_height", type=int, default=224)
    p.add_argument("--out_width", type=int, default=304)
    p.add_argument("--depth_only", action="store_true", default=False,
                   help="skip G_label (pred_depth never consumes it — "
                        "reference quirk rdfc_gan.py:172-180); ~8 ms less "
                        "device work per call")
    args = p.parse_args(argv)

    from rdfc_gan_tpu.config import default_config, load_config
    from rdfc_gan_tpu.engines import build_engine
    from rdfc_gan_tpu.utils.checkpoint import load_checkpoint

    cfg = default_config()
    load_config(cfg, args.model_cfg_path)
    cfg.merge(dict(out_height=args.out_height, out_width=args.out_width))

    rgb = cv2.cvtColor(cv2.imread(args.rgb, cv2.IMREAD_UNCHANGED),
                       cv2.COLOR_BGR2RGB).astype(np.float32) / 255.0
    depth = cv2.imread(args.depth, cv2.IMREAD_UNCHANGED).astype(np.float32)
    depth = depth / 1000.0  # mm -> m

    size = (args.out_width, args.out_height)
    rgb = cv2.resize(rgb, size)
    depth = cv2.resize(depth, size, interpolation=cv2.INTER_NEAREST)

    rgb_n = ((rgb - (0.485, 0.456, 0.406)) / (0.229, 0.224, 0.225))[None]
    depth_n = ((depth - 5.0) / 5.0)[None, ..., None]

    engine = build_engine(cfg, is_train=False)
    import jax.numpy as jnp

    batch = dict(rgb=jnp.asarray(rgb_n, jnp.float32),
                 raw_depth=jnp.asarray(depth_n, jnp.float32),
                 gt_depth=jnp.asarray(depth_n, jnp.float32))
    state = engine.init_state(jax.random.PRNGKey(0), batch)
    if args.load_from:
        state, _ = load_checkpoint(state, args.load_from)

    ret = engine.forward_test(state, rgb=batch["rgb"],
                              raw_depth=batch["raw_depth"],
                              depth_only=args.depth_only)
    pred = np.asarray(ret["pred_depth"])[0, ..., 0] * 5.0 + 5.0  # meters

    cv2.imwrite(args.out, (pred * 1000.0).astype(np.uint16))
    vis = cv2.applyColorMap(
        np.clip(pred / 10.0 * 255.0, 0, 255).astype(np.uint8),
        cv2.COLORMAP_VIRIDIS)
    cv2.imwrite(os.path.splitext(args.out)[0] + "_vis.jpg", vis)
    print(f"saved {args.out}; depth range [{pred.min():.3f}, {pred.max():.3f}] m")


if __name__ == "__main__":
    main()
