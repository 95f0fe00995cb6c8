"""G_label (PSPNet dilated-R50) per-stage floor decomposition (VERDICT r4 #2).

The round-3 flagship decomposition carried G_label as an UNMEASURED
"(residual ~30 ms)" row: the monolithic dilated-R50 grad takes >30 min to
compile on the tunneled backend, so it was never timed. This tool measures
it anyway by splitting the net at its stage boundaries — stem, layer1..4,
PSP head (+aux) — and timing each stage's train-mode forward and
forward+grad in isolation (chained in one jit against tunnel RTT, same
discipline as bench_decompose), against cost_analysis logical-byte floors.
Per-stage compiles are minutes, not tens of minutes, and the stage sum
bounds the monolith: the backward of a sequential net is the sum of its
stage backwards plus one activation handoff per boundary (already counted
in both stages' logical bytes — the sum slightly OVERcounts, i.e. is a
conservative ceiling for the true G_label cost).

Stage widths/dilations mirror the flagship build exactly
(engines/rdfc_gan.py:93-102 -> models/label_net.py; reference
backbone_resnet50.py:126-235 + labels_model.py:12-40,89-94). Params are
freshly initialized — timing and logical bytes are value-independent.

Usage: python tools/bench_label_floor.py [--batch 8] [--reps 8]
           [--only stem,l1,...] [--skip_bytes] [--skip_time]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

V5E_BW = 819e9


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--reps", type=int, default=8)
    p.add_argument("--only", default=None)
    p.add_argument("--skip_bytes", action="store_true")
    p.add_argument("--skip_time", action="store_true")
    args = p.parse_args()

    import flax.linen as nn
    import jax
    import jax.numpy as jnp

    from rdfc_gan_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()

    from __graft_entry__ import _flagship_cfg
    from bench_decompose import chain_timer
    from bytes_by_component import ca_of
    from rdfc_gan_tpu.models.label_net import PSPModule
    from rdfc_gan_tpu.models.layers import BatchNorm, bilinear_resize
    from rdfc_gan_tpu.models.resnet import DeepStem, make_stages

    cfg = _flagship_cfg()
    B, H, W = args.batch, cfg.out_height, cfg.out_width
    lg = cfg.model.get("Label_G", {})
    depth = lg.get("backbone_depth", 50)
    planes = tuple(lg.get("planes", (64, 128, 256, 512)))
    stem_f = lg.get("stem_features", 64)
    ncls = cfg.num_classes

    stem = DeepStem(features=stem_f)
    l1, l2, l3, l4 = make_stages(depth, dilated=True, planes=planes)

    class Head(nn.Module):
        """PSP pyramid + cls conv + aux head (train mode), as in
        PSPNet.__call__ after layer4 (label_net.py:95-110)."""

        @nn.compact
        def __call__(self, h, x_aux, train: bool = True):
            out = PSPModule()(h, train)
            out = nn.Conv(ncls, (1, 1))(out)
            out = bilinear_resize(out, (H, W), align_corners=True)
            aux = nn.relu(BatchNorm(use_running_average=not train,
                                    momentum=0.9, epsilon=1e-5,
                                    dtype=x_aux.dtype)(
                nn.Conv(planes[3], (3, 3), padding=1,
                        use_bias=False)(x_aux)))
            aux = nn.Dropout(0.1, deterministic=not train,
                             broadcast_dims=(1, 2))(aux)
            aux = nn.Conv(ncls, (1, 1))(aux)
            aux = bilinear_resize(aux, (H, W), align_corners=True)
            return [out, aux]

    head = Head()
    expansion = 4 if depth >= 50 else 1
    h8, w8 = -(-H // 8), -(-W // 8)  # output-stride 8 past layer2
    h4, w4 = -(-H // 4), -(-W // 4)
    shapes = {
        "stem": (stem, (B, H, W, 3)),
        "l1": (l1, (B, h4, w4, stem_f * 2)),
        "l2": (l2, (B, h4, w4, planes[0] * expansion)),
        "l3": (l3, (B, h8, w8, planes[1] * expansion)),
        "l4": (l4, (B, h8, w8, planes[2] * expansion)),
        # head consumes (layer4 out, layer3 out) — the aux tap
        "head": (head, ((B, h8, w8, planes[3] * expansion),
                        (B, h8, w8, planes[2] * expansion))),
    }
    if args.only:
        keep = set(args.only.split(","))
        shapes = {k: v for k, v in shapes.items() if k in keep}

    print(f"G_label stages: depth={depth} planes={planes} bs={B} {H}x{W}")
    print(f"{'stage':8s} {'pass':5s} {'TFLOP':>7s} {'GB':>8s} "
          f"{'floor ms':>9s} {'chip ms':>9s}")

    key = jax.random.PRNGKey(0)
    tot = {"fwd": 0.0, "grad": 0.0}
    tot_fl = {"fwd": 0.0, "grad": 0.0}
    for name, (mod, shp) in shapes.items():
        multi = isinstance(shp[0], tuple)
        xs = tuple(jax.random.normal(jax.random.fold_in(key, i), s,
                                     jnp.bfloat16)
                   for i, s in enumerate(shp if multi else (shp,)))
        init_rngs = {"params": key, "dropout": jax.random.fold_in(key, 9)}
        variables = jax.jit(lambda *a: mod.init(init_rngs, *a,
                                                train=True))(*xs)
        params = variables.get("params", {})
        stats = variables.get("batch_stats", {})
        rngs = ({"dropout": jax.random.fold_in(key, 7)}
                if name == "head" else None)

        def fwd(p, *a):
            # bf16 cast of params mirrors engines/base.py _apply
            pc = jax.tree.map(
                lambda t: t.astype(jnp.bfloat16)
                if t.dtype == jnp.float32 else t, p)
            out, _ = mod.apply({"params": pc, "batch_stats": stats}, *a,
                               train=True, mutable=["batch_stats"],
                               rngs=rngs)
            return out

        def fwd_loss(p, *a):
            def loss(pp):
                out = fwd(pp, *a)
                return sum(jnp.sum(l.astype(jnp.float32) ** 2)
                           for l in jax.tree.leaves(out))
            return jax.value_and_grad(loss)(p)

        for kind, f in (("fwd", fwd), ("grad", fwd_loss)):
            fl = by = float("nan")
            if not args.skip_bytes:
                fl, by = ca_of(f, params, *xs)
            ms = float("nan")
            if not args.skip_time:
                # params ride the chain_timer params slot; the carry is
                # injected into xs[0] (first input array) to serialize reps
                ms = chain_timer(f, args.reps, params, *xs)
            if ms == ms:
                tot[kind] += ms
            if by == by:
                tot_fl[kind] += by / V5E_BW * 1e3
            print(f"{name:8s} {kind:5s} {fl / 1e12:7.3f} {by / 1e9:8.2f} "
                  f"{by / V5E_BW * 1e3:9.2f} {ms:9.2f}", flush=True)

    print(f"{'SUM':8s} {'fwd':5s} {'':7s} {'':8s} "
          f"{tot_fl['fwd']:9.2f} {tot['fwd']:9.2f}")
    print(f"{'SUM':8s} {'grad':5s} {'':7s} {'':8s} "
          f"{tot_fl['grad']:9.2f} {tot['grad']:9.2f}")


if __name__ == "__main__":
    main()
