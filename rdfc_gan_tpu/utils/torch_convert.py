"""PyTorch checkpoint -> flax pytree conversion utilities.

SURVEY.md §7.2 step 9: released reference checkpoints
(``{net}_state_dict`` keys per lib/utils/checkpoint.py:27-30) map onto our
GANTrainState params/batch_stats with:
  * conv weights OIHW -> HWIO transpose;
  * transposed-conv weights: torch stores (Cin, Cout, kh, kw) and correlates
    with flipped kernels relative to flax ConvTranspose — (2,3,0,1) transpose
    + spatial flip;
  * linear (out,in) -> (in,out);
  * BatchNorm weight/bias/running_mean/running_var ->
    scale/bias + batch_stats mean/var;
  * EqualLinear: the reference stores ``weight_orig`` and rescales by
    sqrt(2/fan_in) at call time (model_utils.py:7-36); our EqualLinear stores
    the SAME unscaled tensor, so ``weight_orig`` maps verbatim (transposed).

``convert_tensor`` handles the per-tensor layout; ``walk_state_dict`` groups
a torch state dict by module prefix so engine-specific name maps stay small.
No released checkpoints ship with the reference repo; these utilities are
exercised by synthetic round-trip tests (tests/test_torch_convert.py).
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import numpy as np


def convert_tensor(name: str, t: np.ndarray) -> Tuple[str, np.ndarray]:
    """Map one torch parameter to (flax leaf name, converted array)."""
    arr = np.asarray(t)
    leaf = name.rsplit(".", 1)[-1]
    if leaf in ("weight", "weight_orig"):
        if arr.ndim == 4:  # conv OIHW -> HWIO
            return "kernel", arr.transpose(2, 3, 1, 0)
        if arr.ndim == 2:  # linear (out,in) -> (in,out)
            return "kernel" if leaf == "weight" else "weight", arr.T
        return "scale", arr  # norm affine weight
    if leaf == "bias":
        return "bias", arr
    if leaf == "running_mean":
        return "mean", arr
    if leaf == "running_var":
        return "var", arr
    return leaf, arr


def convert_convtranspose_weight(arr: np.ndarray) -> np.ndarray:
    """torch ConvTranspose2d (Cin, Cout, kh, kw) -> flax (kh, kw, Cin, Cout)
    with spatial flip (flax ConvTranspose uses the correlation convention)."""
    return np.asarray(arr).transpose(2, 3, 0, 1)[::-1, ::-1]


def load_torch_state_dict(path: str) -> Dict[str, np.ndarray]:
    """Load a .pth file to numpy without CUDA. Accepts either a raw state
    dict or the reference's multi-net schema (``{k}_state_dict``)."""
    import torch

    obj = torch.load(path, map_location="cpu")
    if isinstance(obj, dict) and any(k.endswith("_state_dict") for k in obj):
        out = {}
        for k, v in obj.items():
            if k.endswith("_state_dict") and not k.endswith(
                    ("optimizer_state_dict", "lr_scheduler_state_dict")):
                net = k[: -len("_state_dict")]
                for pk, pv in v.items():
                    out[f"{net}.{pk}"] = pv.numpy()
        return out
    return {k: v.numpy() for k, v in obj.items()}


def walk_state_dict(sd: Dict[str, np.ndarray]) -> Dict[str, Dict[str, np.ndarray]]:
    """Group flat torch names by module prefix: 'a.b.weight' -> {'a.b': {...}}."""
    groups: Dict[str, Dict[str, np.ndarray]] = {}
    for name, arr in sd.items():
        prefix, leaf = name.rsplit(".", 1)
        groups.setdefault(prefix, {})[leaf] = arr
    return groups


def torchvision_resnet_to_stages(sd: Dict[str, np.ndarray],
                                 prefix: str = "") -> Dict[str, Any]:
    """Map torchvision resnet18/34 layerN.* weights onto our ResNetStage
    param tree layout (BasicBlock: Conv_0/Conv_1[/Conv_2 downsample] +
    BatchNorm_0/1/2)."""
    out: Dict[str, Any] = {}
    groups = walk_state_dict(sd)
    for layer in range(1, 5):
        block_idx = 0
        stage: Dict[str, Any] = {}
        while f"{prefix}layer{layer}.{block_idx}.conv1" in groups:
            g = lambda s: groups[f"{prefix}layer{layer}.{block_idx}.{s}"]
            blk: Dict[str, Any] = {
                "Conv_0": {"kernel": g("conv1")["weight"].transpose(2, 3, 1, 0)},
                "Conv_1": {"kernel": g("conv2")["weight"].transpose(2, 3, 1, 0)},
                "BatchNorm_0": _bn(g("bn1")),
                "BatchNorm_1": _bn(g("bn2")),
            }
            ds = f"{prefix}layer{layer}.{block_idx}.downsample.0"
            if ds in groups:
                blk["Conv_2"] = {
                    "kernel": groups[ds]["weight"].transpose(2, 3, 1, 0)}
                blk["BatchNorm_2"] = _bn(
                    groups[f"{prefix}layer{layer}.{block_idx}.downsample.1"])
            stage[f"BasicBlock_{block_idx}"] = blk
            block_idx += 1
        out[f"layer{layer}"] = stage
    return out


def _bn(g: Dict[str, np.ndarray]) -> Dict[str, Any]:
    return {
        "params": {"scale": g["weight"], "bias": g["bias"]},
        "batch_stats": {"mean": g["running_mean"], "var": g["running_var"]},
    }


def split_stage_tree(stage_tree: Dict[str, Any]):
    """Split a torchvision_resnet_to_stages stage into (params, batch_stats)
    trees matching our ResNetStage collections."""
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}
    for blk, sub in stage_tree.items():
        params[blk] = {}
        for k, v in sub.items():
            if k.startswith("BatchNorm"):
                params[blk][k] = v["params"]
                stats.setdefault(blk, {})[k] = v["batch_stats"]
            else:
                params[blk][k] = v
    return params, stats


def apply_pretrained_torsos(net_params: Dict[str, Any],
                            net_stats: Dict[str, Any], pth_path: str):
    """Load a torchvision resnet .pth into every EncoderDecoder torso
    (``rgb_ed`` / ``depth_ed`` subtrees) of a generator's param tree — the
    ``pretrained_on_imagenet`` behavior (common.py:12-26). Returns updated
    (params, stats)."""
    sd = load_torch_state_dict(pth_path)
    net_params = dict(net_params)
    net_stats = dict(net_stats)
    if "core" in net_params:  # DCVGANGenerator nests an RDFGenerator core
        net_params["core"], net_stats["core"] = apply_torso_dicts(
            net_params["core"], net_stats.get("core", {}), sd)
        return net_params, net_stats
    return apply_torso_dicts(net_params, net_stats, sd)


def apply_torso_dicts(net_params, net_stats, sd):
    net_params = dict(net_params)
    net_stats = dict(net_stats)
    for branch in ("rgb_ed", "depth_ed"):
        if branch in net_params:
            p, s = load_resnet_torso(net_params[branch],
                                     net_stats.get(branch, {}), sd)
            net_params[branch] = p
            net_stats[branch] = s
    return net_params, net_stats


def load_resnet_torso(ed_params: Dict[str, Any], ed_stats: Dict[str, Any],
                      sd: Dict[str, np.ndarray], prefix: str = ""):
    """Load torchvision resnet18/34 layer1-4 weights into an EncoderDecoder's
    en2..en5 stages (the pretrained_on_imagenet path the reference gets from
    pretrained_model/resnet/*.pth — encoder_decoder/common.py:5-26).

    Mutates + returns (ed_params, ed_stats) copies."""
    tree = torchvision_resnet_to_stages(sd, prefix)
    ed_params = dict(ed_params)
    ed_stats = dict(ed_stats)
    for i, layer in enumerate(("layer1", "layer2", "layer3", "layer4"),
                              start=2):
        if not tree[layer]:
            continue
        p, s = split_stage_tree(tree[layer])
        ed_params[f"en{i}"] = p
        ed_stats[f"en{i}"] = s
    return ed_params, ed_stats


def _conv_entry(g: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    e = {"kernel": np.ascontiguousarray(g["weight"].transpose(2, 3, 1, 0))}
    if "bias" in g:
        e["bias"] = g["bias"]
    return e


def _put_bn(params: Dict, stats: Dict, name: str, g: Dict[str, np.ndarray]):
    b = _bn(g)
    params[name] = b["params"]
    stats[name] = b["batch_stats"]


def convert_nnet(sd: Dict[str, np.ndarray], width: float = 1.6,
                 depth: float = 2.2):
    """G_normal (NNET) torch state dict -> flax param/batch_stats trees.

    Torch layout: ``encoder.original_model.*`` is the gen-efficientnet
    tf_efficientnet_b5_ap graph (conv_stem/bn1/blocks.s.b.{conv_pw,bn1,
    conv_dw,bn2,se.conv_reduce,se.conv_expand,conv_pwl,bn3}/conv_head;
    normal_net/submodules/encoder.py:10-13) and ``decoder.*`` is
    conv2/up{1-4}._net.{0,1,3,4}/conv3 (decoder.py). The encoder's bn2/act2
    never feed the decoder (it taps features[11] = conv_head output), so
    bn2 is intentionally dropped."""
    from ..models.normal_net import _B0_BLOCKS, _round_repeats

    groups = walk_state_dict(sd)
    ep, es = {}, {}
    pre = "encoder.original_model"
    ep["Conv_0"] = _conv_entry(groups[f"{pre}.conv_stem"])
    _put_bn(ep, es, "BatchNorm_0", groups[f"{pre}.bn1"])
    mb = 0
    for si, (e, _c, r, _s, _k) in enumerate(_B0_BLOCKS):
        for bi in range(_round_repeats(r, depth)):
            bp = f"{pre}.blocks.{si}.{bi}"
            p, st = {}, {}
            if e != 1:  # InvertedResidual
                p["Conv_0"] = _conv_entry(groups[f"{bp}.conv_pw"])
                _put_bn(p, st, "BatchNorm_0", groups[f"{bp}.bn1"])
                p["Conv_1"] = _conv_entry(groups[f"{bp}.conv_dw"])
                _put_bn(p, st, "BatchNorm_1", groups[f"{bp}.bn2"])
                p["SqueezeExcite_0"] = {
                    "Conv_0": _conv_entry(groups[f"{bp}.se.conv_reduce"]),
                    "Conv_1": _conv_entry(groups[f"{bp}.se.conv_expand"]),
                }
                p["Conv_2"] = _conv_entry(groups[f"{bp}.conv_pwl"])
                _put_bn(p, st, "BatchNorm_2", groups[f"{bp}.bn3"])
            else:  # DepthwiseSeparable
                p["Conv_0"] = _conv_entry(groups[f"{bp}.conv_dw"])
                _put_bn(p, st, "BatchNorm_0", groups[f"{bp}.bn1"])
                p["SqueezeExcite_0"] = {
                    "Conv_0": _conv_entry(groups[f"{bp}.se.conv_reduce"]),
                    "Conv_1": _conv_entry(groups[f"{bp}.se.conv_expand"]),
                }
                p["Conv_1"] = _conv_entry(groups[f"{bp}.conv_pw"])
                _put_bn(p, st, "BatchNorm_1", groups[f"{bp}.bn2"])
            ep[f"MBConv_{mb}"] = p
            es[f"MBConv_{mb}"] = st
            mb += 1
    ep["Conv_1"] = _conv_entry(groups[f"{pre}.conv_head"])

    dp, ds = {}, {}
    dp["Conv_0"] = _conv_entry(groups["decoder.conv2"])
    for i in range(4):
        up, ust = {}, {}
        for j, (ci, bi) in enumerate(((0, 1), (3, 4))):
            up[f"Conv_{j}"] = _conv_entry(groups[f"decoder.up{i+1}._net.{ci}"])
            _put_bn(up, ust, f"BatchNorm_{j}",
                    groups[f"decoder.up{i+1}._net.{bi}"])
        dp[f"UpSampleBN_{i}"] = up
        ds[f"UpSampleBN_{i}"] = ust
    dp["Conv_1"] = _conv_entry(groups["decoder.conv3"])

    return {
        "params": {"EfficientNetEncoder_0": ep, "NormalDecoder_0": dp},
        "batch_stats": {"EfficientNetEncoder_0": es, "NormalDecoder_0": ds},
    }
