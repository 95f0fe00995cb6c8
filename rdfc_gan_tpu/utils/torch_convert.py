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
    dict or the reference's multi-net schema (``{k}_state_dict``).

    ``weights_only=True``: these are tensor-only state dicts and full
    unpickling of downloaded checkpoints is arbitrary code execution —
    the same threat class utils/checkpoint.py's JSON meta header avoids."""
    import torch

    try:
        obj = torch.load(path, map_location="cpu", weights_only=True)
    except TypeError:  # torch too old for weights_only
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


def _basicblock_blocks(groups: Dict[str, Dict[str, np.ndarray]],
                       layer_prefix: str):
    """torchvision-layout BasicBlocks (conv1/bn1/conv2/bn2/downsample.{0,1})
    -> our BasicBlock naming (Conv_0/1 + BatchNorm_0/1, downsample at
    Conv_2/BatchNorm_2)."""
    params, stats = {}, {}
    bi = 0
    while f"{layer_prefix}.{bi}.conv1" in groups:
        bp = f"{layer_prefix}.{bi}"
        p, st = {}, {}
        for ci in range(2):
            p[f"Conv_{ci}"] = _conv_entry(groups[f"{bp}.conv{ci + 1}"])
            _put_bn(p, st, f"BatchNorm_{ci}", groups[f"{bp}.bn{ci + 1}"])
        if f"{bp}.downsample.0" in groups:
            p["Conv_2"] = _conv_entry(groups[f"{bp}.downsample.0"])
            _put_bn(p, st, "BatchNorm_2", groups[f"{bp}.downsample.1"])
        params[f"BasicBlock_{bi}"] = p
        stats[f"BasicBlock_{bi}"] = st
        bi += 1
    return params, stats


def _tconv_entry(g: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    e = {"kernel": convert_convtranspose_weight(g["weight"]).copy()}
    if "bias" in g:
        e["bias"] = g["bias"]
    return e


def _convbnact(groups, prefix, bn=True):
    """conv_bn_relu Sequential -> ConvBNAct subtree ({Conv_0[,BatchNorm_0]})."""
    p, st = {"Conv_0": _conv_entry(groups[f"{prefix}.0"])}, {}
    if bn:
        _put_bn(p, st, "BatchNorm_0", groups[f"{prefix}.1"])
    return p, st


def _encoder_decoder(groups, prefix):
    """TorchEncoderDecoder (encoder_decoder.py:5-122) -> our EncoderDecoder
    subtree (en2..en6 + de5..de2)."""
    p, st = {}, {}
    for en in ("en2", "en3", "en4", "en5"):
        p[en], st[en] = _basicblock_blocks(groups, f"{prefix}.{en}")
    p["en6"], en6_st = _convbnact(groups, f"{prefix}.en6")
    st["en6"] = en6_st
    for de in ("de5", "de4", "de3", "de2"):
        dp = {"TorchConvTranspose_0": _tconv_entry(groups[f"{prefix}.{de}.0"])}
        ds = {}
        _put_bn(dp, ds, "BatchNorm_0", groups[f"{prefix}.{de}.1"])
        p[de] = dp
        st[de] = ds
    return p, st


def nlspn_offset_channel_perm(num: int) -> np.ndarray:
    """Output-channel permutation taking the reference conv_offset_aff layout
    to ours. Reference chunks its 3*num output into (o1, o2, aff) and
    re-views cat(o1,o2) as (num, 2) — tap i reads channels (2i, 2i+1)
    (nlspn_model.py:73-80). We emit [off_y(num) | off_x(num) | aff(num)]
    (ops/nlspn.py:73-75), so our channel i := reference channel 2i (y),
    our channel num+i := reference channel 2i+1 (x); aff passes through."""
    return np.asarray(
        [2 * i for i in range(num)]
        + [2 * i + 1 for i in range(num)]
        + list(range(2 * num, 3 * num)), np.int64)


def convert_rdf_generator(sd: Dict[str, np.ndarray],
                          use_nlspn_refine: bool = True,
                          adain_weighting: bool = False):
    """G_A2B (RDFGenerator) torch state dict -> flax param/batch_stats trees.

    Handles the three non-mechanical mappings VERDICT round-1 flags:
    EqualLinear ``weight_orig`` passes through UNscaled (both sides scale by
    sqrt(2/fan_in) at call, model_utils.py:7-36 vs layers.EqualLinear);
    the NLSPN offset-channel interleave (``nlspn_offset_channel_perm``);
    fuse_layer5 exists in checkpoints but is unused by the forward
    (rdf_generator.py:371) and is dropped."""
    groups = walk_state_dict(sd)
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}

    def hwio(prefix):
        return groups[prefix]["weight"].transpose(2, 3, 1, 0)

    # fused stem (layers.BlockFusedConv): rgb 64ch + depth-branch 48/16ch
    params["stem_fused"] = {
        "kernel_0_0": np.ascontiguousarray(hwio("rgb_branch_en1.0")),
        "bias_0": groups["rgb_branch_en1.0"]["bias"],
        "kernel_1_0": np.ascontiguousarray(hwio("depth_branch_en1_rgb.0")),
        "bias_1": groups["depth_branch_en1_rgb.0"]["bias"],
        "kernel_2_1": np.ascontiguousarray(hwio("depth_branch_en1_depth.0")),
        "bias_2": groups["depth_branch_en1_depth.0"]["bias"],
    }
    params["rgb_ed"], stats["rgb_ed"] = _encoder_decoder(
        groups, "rgb_branch_encoder_decoder")
    params["depth_ed"], stats["depth_ed"] = _encoder_decoder(
        groups, "depth_branch_encoder_decoder")

    def fused_dec1(name, prefixes):
        """Per-head conv_bn_relu stacks -> one fused ConvBNAct: kernels and
        per-channel BN params concatenate along the output-channel axis."""
        ks = [hwio(f"{p}.0") for p in prefixes]
        bns = [groups[f"{p}.1"] for p in prefixes]
        params[name] = {
            "Conv_0": {"kernel": np.ascontiguousarray(
                np.concatenate(ks, axis=3))},
            "BatchNorm_0": {
                "scale": np.concatenate([b["weight"] for b in bns]),
                "bias": np.concatenate([b["bias"] for b in bns]),
            },
        }
        stats[name] = {"BatchNorm_0": {
            "mean": np.concatenate([b["running_mean"] for b in bns]),
            "var": np.concatenate([b["running_var"] for b in bns]),
        }}

    def fused_dec0(name, prefixes, own_chans, shared_idx):
        """Per-head convs over concat(own_i, fe1) -> BlockFusedConv params:
        split each torch kernel's input rows at own_chans[i] (the reference
        concatenates fd first, fe second — rdf_generator.py:244-258)."""
        sub = {}
        for i, (p, oc) in enumerate(zip(prefixes, own_chans)):
            k = hwio(f"{p}.0")
            sub[f"kernel_{i}_{i}"] = np.ascontiguousarray(k[:, :, :oc])
            sub[f"kernel_{i}_{shared_idx}"] = np.ascontiguousarray(
                k[:, :, oc:])
            sub[f"bias_{i}"] = groups[f"{p}.0"]["bias"]
        params[name] = sub

    fused_dec1("rgb_dec1", ["rgb_pred_dec1", "rgb_conf_dec1"])
    fused_dec0("rgb_dec0", ["rgb_pred_dec0", "rgb_conf_dec0"],
               own_chans=(64, 32), shared_idx=2)
    if use_nlspn_refine:
        fused_dec1("depth_dec1", ["id_dec1", "gd_dec1", "cf_dec1"])
        fused_dec0("depth_dec0", ["id_dec0", "gd_dec0", "cf_dec0"],
                   own_chans=(64, 64, 32), shared_idx=3)
    else:
        fused_dec1("depth_dec1", ["id_dec1", "cf_dec1"])
        fused_dec0("depth_dec0", ["id_dec0", "cf_dec0"],
                   own_chans=(64, 32), shared_idx=2)

    if use_nlspn_refine:
        oa = groups["nlspn_refine_module.prop_layer.conv_offset_aff"]
        num = oa["bias"].shape[0] // 3
        perm = nlspn_offset_channel_perm(num)
        params["conv_offset_aff"] = {
            "kernel": np.ascontiguousarray(
                oa["weight"].transpose(2, 3, 1, 0)[..., perm]),
            "bias": oa["bias"][perm],
        }
        params["aff_scale_const"] = np.asarray(
            sd["nlspn_refine_module.prop_layer.aff_scale_const"]
        ).reshape(())

    for i in range(4):  # fuse_layer5 is dead weight in the reference
        fl = f"fuse_layer{i + 1}.style.linear"
        sub = {"EqualLinear_0": {
            "weight": np.asarray(groups[fl]["weight_orig"]).T,
            "bias": groups[fl]["bias"],
        }}
        if adain_weighting:
            sub["Conv_0"] = _conv_entry(
                groups[f"fuse_layer{i + 1}.gamma_weight_layer"])
            sub["Conv_1"] = _conv_entry(
                groups[f"fuse_layer{i + 1}.beta_weight_layer"])
        params[f"fuse_layers_{i}"] = sub

    return {"params": params, "batch_stats": stats}


def _bottleneck_blocks(groups: Dict[str, Dict[str, np.ndarray]],
                       layer_prefix: str):
    """Map torch Bottleneck blocks (conv1-3/bn1-3 + optional downsample,
    label_net/backbone_resnet50.py:27-66) onto our Bottleneck naming
    (Conv_0..2 + BatchNorm_0..2, downsample at Conv_3/BatchNorm_3)."""
    params, stats = {}, {}
    bi = 0
    while f"{layer_prefix}.{bi}.conv1" in groups:
        bp = f"{layer_prefix}.{bi}"
        p, st = {}, {}
        for ci in range(3):
            p[f"Conv_{ci}"] = _conv_entry(groups[f"{bp}.conv{ci + 1}"])
            _put_bn(p, st, f"BatchNorm_{ci}", groups[f"{bp}.bn{ci + 1}"])
        if f"{bp}.downsample.0" in groups:
            p["Conv_3"] = _conv_entry(groups[f"{bp}.downsample.0"])
            _put_bn(p, st, "BatchNorm_3", groups[f"{bp}.downsample.1"])
        params[f"Bottleneck_{bi}"] = p
        stats[f"Bottleneck_{bi}"] = st
        bi += 1
    return params, stats


def convert_pspnet(sd: Dict[str, np.ndarray]):
    """G_label (PSPNet) torch state dict -> flax param/batch_stats trees.

    Torch layout (labels_model.py:44-96 + backbone_resnet50.py): deep stem
    ``initial.0.{0,3,6}`` convs + ``initial.0.{1,4}`` / ``initial.1`` BNs,
    dilated-R50 ``layer{1-4}`` bottlenecks, PSP head
    ``master_branch.0.stages.{i}.{1,2}`` + ``.bottleneck.{0,1}`` +
    ``master_branch.1`` class conv, aux head ``auxiliary_branch.{0,1,4}``."""
    groups = walk_state_dict(sd)
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}

    stem_p, stem_s = {}, {}
    for i, (ci, bi) in enumerate(((0, 1), (3, 4))):
        stem_p[f"Conv_{i}"] = _conv_entry(groups[f"initial.0.{ci}"])
        _put_bn(stem_p, stem_s, f"BatchNorm_{i}", groups[f"initial.0.{bi}"])
    stem_p["Conv_2"] = _conv_entry(groups["initial.0.6"])
    _put_bn(stem_p, stem_s, "BatchNorm_2", groups["initial.1"])
    params["DeepStem_0"] = stem_p
    stats["DeepStem_0"] = stem_s

    for li in range(4):
        p, st = _bottleneck_blocks(groups, f"layer{li + 1}")
        params[f"ResNetStage_{li}"] = p
        stats[f"ResNetStage_{li}"] = st

    psp_p, psp_s = {}, {}
    nbins = 0
    while f"master_branch.0.stages.{nbins}.1" in groups:
        psp_p[f"Conv_{nbins}"] = _conv_entry(
            groups[f"master_branch.0.stages.{nbins}.1"])
        _put_bn(psp_p, psp_s, f"BatchNorm_{nbins}",
                groups[f"master_branch.0.stages.{nbins}.2"])
        nbins += 1
    psp_p[f"Conv_{nbins}"] = _conv_entry(groups["master_branch.0.bottleneck.0"])
    _put_bn(psp_p, psp_s, f"BatchNorm_{nbins}",
            groups["master_branch.0.bottleneck.1"])
    params["PSPModule_0"] = psp_p
    stats["PSPModule_0"] = psp_s

    params["Conv_0"] = _conv_entry(groups["master_branch.1"])
    if "auxiliary_branch.0" in groups:
        params["Conv_1"] = _conv_entry(groups["auxiliary_branch.0"])
        _put_bn(params, stats, "BatchNorm_0", groups["auxiliary_branch.1"])
        params["Conv_2"] = _conv_entry(groups["auxiliary_branch.4"])

    return {"params": params, "batch_stats": stats}


def _effnet_encoder_trees(groups, pre: str, width: float, depth: float):
    """gen-efficientnet/timm layout (conv_stem/bn1/blocks.s.b.*/conv_head)
    -> our EfficientNetEncoder param/batch_stats trees."""
    from ..models.normal_net import _B0_BLOCKS, _round_repeats

    dot = pre + "." if pre else ""
    ep, es = {}, {}
    ep["Conv_0"] = _conv_entry(groups[f"{dot}conv_stem"])
    _put_bn(ep, es, "BatchNorm_0", groups[f"{dot}bn1"])
    mb = 0
    for si, (e, _c, r, _s, _k) in enumerate(_B0_BLOCKS):
        for bi in range(_round_repeats(r, depth)):
            bp = f"{dot}blocks.{si}.{bi}"
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
    ep["Conv_1"] = _conv_entry(groups[f"{dot}conv_head"])
    return ep, es


def load_efficientnet_torso(nnet_params: Dict[str, Any],
                            nnet_stats: Dict[str, Any],
                            sd: Dict[str, np.ndarray],
                            width: float = 1.6, depth: float = 2.2):
    """Load a timm `tf_efficientnet_b5_ap` checkpoint (raw names, or the
    NNET wrapper's `encoder.original_model.` prefix) into an NNET param
    tree's encoder — the torch.hub pretrained-encoder behavior
    (normal_net/submodules/encoder.py:10-13). Returns updated copies."""
    groups = walk_state_dict(sd)
    pre = "encoder.original_model" \
        if any(k.startswith("encoder.original_model.") for k in sd) else ""
    ep, es = _effnet_encoder_trees(groups, pre, width, depth)
    nnet_params = dict(nnet_params)
    nnet_stats = dict(nnet_stats)
    nnet_params["EfficientNetEncoder_0"] = ep
    nnet_stats["EfficientNetEncoder_0"] = es
    return nnet_params, nnet_stats


def load_pspnet_backbone(psp_params: Dict[str, Any],
                         psp_stats: Dict[str, Any],
                         sd: Dict[str, np.ndarray]):
    """Load the reference's pretrained dilated-R50 backbone .pth
    (backbone_resnet50.py naming: deep stem ``conv1.{0,1,3,4,6}`` + ``bn1``
    + ``layer1-4`` bottlenecks; loaded from ./pretrained at
    backbone_resnet50.py:263-278) into a PSPNet param tree. Returns updated
    copies; PSP/aux heads are left at init (they are not in the file)."""
    groups = walk_state_dict(sd)
    psp_params = dict(psp_params)
    psp_stats = dict(psp_stats)
    stem_p, stem_s = {}, {}
    for i, (ci, bi) in enumerate(((0, 1), (3, 4))):
        stem_p[f"Conv_{i}"] = _conv_entry(groups[f"conv1.{ci}"])
        _put_bn(stem_p, stem_s, f"BatchNorm_{i}", groups[f"conv1.{bi}"])
    stem_p["Conv_2"] = _conv_entry(groups["conv1.6"])
    _put_bn(stem_p, stem_s, "BatchNorm_2", groups["bn1"])
    psp_params["DeepStem_0"] = stem_p
    psp_stats["DeepStem_0"] = stem_s
    for li in range(4):
        p, st = _bottleneck_blocks(groups, f"layer{li + 1}")
        if p:
            psp_params[f"ResNetStage_{li}"] = p
            psp_stats[f"ResNetStage_{li}"] = st
    return psp_params, psp_stats


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
    groups = walk_state_dict(sd)
    ep, es = _effnet_encoder_trees(groups, "encoder.original_model",
                                   width, depth)

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
