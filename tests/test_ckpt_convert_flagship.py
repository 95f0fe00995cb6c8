"""Output-parity tests for the flagship-net torch->flax converters
(G_normal / G_label / G_A2B — VERDICT round-1 item #1).

Each test builds the torch mirror with the reference's exact state-dict
layout (tools/torch_ref_models.py), randomizes weights AND BatchNorm
running stats, converts, and asserts eval-mode output parity <= 1e-4.
"""

import os
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402


def _randomize_bn(model, rng):
    with torch.no_grad():
        for m in model.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.uniform_(-0.5, 0.5)
                m.running_var.uniform_(0.5, 2.0)
                m.weight.uniform_(0.5, 1.5)
                m.bias.uniform_(-0.2, 0.2)


def _to_variables(tree):
    v = {"params": jax.tree.map(jnp.asarray, tree["params"])}
    if tree.get("batch_stats"):
        v["batch_stats"] = jax.tree.map(jnp.asarray, tree["batch_stats"])
    return v


def test_nnet_conversion_output_parity(rng):
    """G_normal: gen-efficientnet encoder + UpSampleBN decoder
    (normal_net/) at reduced width/depth."""
    from torch_ref_models import TorchNNET

    from rdfc_gan_tpu.models.normal_net import NNET
    from rdfc_gan_tpu.utils.torch_convert import convert_nnet

    W, D = 0.5, 0.5
    tm = TorchNNET(out_height=40, out_width=56, width=W, depth=D)
    _randomize_bn(tm, rng)
    tm.eval()
    x = rng.normal(size=(2, 3, 64, 64)).astype(np.float32)
    with torch.no_grad():
        want = tm(torch.from_numpy(x)).numpy()

    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    tree = convert_nnet(sd, width=W, depth=D)

    fm = NNET(out_height=40, out_width=56, width=W, depth=D)
    got = fm.apply(_to_variables(tree), jnp.asarray(x.transpose(0, 2, 3, 1)),
                   train=False)
    np.testing.assert_allclose(np.asarray(got).transpose(0, 3, 1, 2), want,
                               rtol=1e-4, atol=1e-4)


def test_pspnet_conversion_output_parity(rng):
    """G_label: deep-stem dilated R50 + PSP head (label_net/), both main
    and aux outputs, train-layout param tree."""
    from torch_ref_models import TorchPSPNet

    from rdfc_gan_tpu.models.label_net import PSPNet
    from rdfc_gan_tpu.utils.torch_convert import convert_pspnet

    tm = TorchPSPNet(num_classes=5)
    _randomize_bn(tm, rng)
    tm.eval()
    x = rng.normal(size=(1, 3, 48, 48)).astype(np.float32)
    xt = torch.from_numpy(x)
    with torch.no_grad():
        want_main = tm(xt).numpy()
        # aux target: replay the backbone to layer3 and run the aux head in
        # eval mode (Dropout2d identity, BN running stats)
        h = tm.layer2(tm.layer1(tm.initial(xt)))
        x_aux = tm.layer3(h)
        want_aux = torch.nn.functional.interpolate(
            tm.auxiliary_branch(x_aux), size=xt.shape[2:], mode="bilinear",
            align_corners=True).numpy()

    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    tree = convert_pspnet(sd)

    fm = PSPNet(num_classes=5, backbone_depth=50)
    xj = jnp.asarray(x.transpose(0, 2, 3, 1))
    got_main, got_aux = fm.apply(_to_variables(tree), xj, train=False,
                                 force_aux=True)
    np.testing.assert_allclose(np.asarray(got_main).transpose(0, 3, 1, 2),
                               want_main, rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(got_aux).transpose(0, 3, 1, 2),
                               want_aux, rtol=1e-3, atol=1e-4)

    # structure check: converted tree covers the full train-mode param tree
    variables = fm.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        jnp.zeros((1, 48, 48, 3)), train=True)
    want_shapes = jax.tree.map(lambda a: a.shape, variables["params"])
    got_shapes = jax.tree.map(lambda a: tuple(a.shape), tree["params"])
    assert want_shapes == got_shapes


def _rand_params(model, rng):
    with torch.no_grad():
        for n, p in model.named_parameters():
            if n.endswith("aff_scale_const") or n.endswith((".w", ".b",
                                                            ".w_conf")):
                continue
            p.uniform_(-0.15, 0.15)


def test_rdf_generator_conversion_output_parity(rng):
    """G_A2B: two-branch encoder/decoder + W-AdaIN fusion + NLSPN refine —
    the round-1 VERDICT headline (EqualLinear scale semantics + NLSPN
    offset-channel permute). Gather impl = reference-exact path."""
    from torch_ref_models import TorchRDFGenerator

    from rdfc_gan_tpu.models.rdf_generator import RDFGenerator
    from rdfc_gan_tpu.utils.torch_convert import convert_rdf_generator

    enc = (8, 8, 16, 24, 32, 32)
    dec = (16, 8, 8, 8)
    nlspn_cfg = dict(prop_kernel=3, prop_time=3, affinity="TGASS",
                     affinity_gamma=0.5, conf_prop=True, preserve_input=False)
    tm = TorchRDFGenerator(rgb_channels_encoder=enc,
                           depth_channels_encoder=enc,
                           rgb_channels_decoder=dec,
                           depth_channels_decoder=dec,
                           use_nlspn_refine=True, nlspn_configs=nlspn_cfg)
    _rand_params(tm, rng)
    _randomize_bn(tm, rng)
    # non-zero offsets/affinities so the NLSPN permute is actually exercised
    with torch.no_grad():
        oa = tm.nlspn_refine_module.prop_layer.conv_offset_aff
        oa.weight.uniform_(-0.1, 0.1)
        oa.bias.uniform_(-0.5, 0.5)
    tm.eval()

    B, H, W = 2, 32, 48
    nrm = rng.normal(size=(B, 3, H, W)).astype(np.float32)
    dep = np.abs(rng.normal(size=(B, 1, H, W))).astype(np.float32)
    rgbx = rng.normal(size=(B, 3, H, W)).astype(np.float32)
    with torch.no_grad():
        want = tm(torch.from_numpy(rgbx), torch.from_numpy(dep),
                  torch.from_numpy(nrm))

    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    tree = convert_rdf_generator(sd, use_nlspn_refine=True)

    fm = RDFGenerator(rgb_channels_encoder=enc, depth_channels_encoder=enc,
                      rgb_channels_decoder=dec, depth_channels_decoder=dec,
                      use_nlspn_refine=True, nlspn_configs=nlspn_cfg,
                      nlspn_impl="gather")
    got = fm.apply(_to_variables(tree),
                   jnp.asarray(rgbx.transpose(0, 2, 3, 1)),
                   jnp.asarray(dep.transpose(0, 2, 3, 1)),
                   jnp.asarray(nrm.transpose(0, 2, 3, 1)), train=False)
    for k in ("depth_map_1", "confidence_map_1", "depth_map_2",
              "confidence_map_2", "pred_depth"):
        np.testing.assert_allclose(
            np.asarray(got[k])[..., 0], want[k].numpy()[:, 0],
            rtol=1e-3, atol=1e-4, err_msg=k)

    # converted tree must exactly match the flax init structure
    variables = fm.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, H, W, 3)), jnp.zeros((1, H, W, 1)),
                        jnp.zeros((1, H, W, 3)), train=False)
    want_shapes = jax.tree.map(lambda a: a.shape, variables["params"])
    got_shapes = jax.tree.map(lambda a: tuple(np.shape(a)), tree["params"])
    assert want_shapes == got_shapes


@pytest.mark.slow  # 6-net synthetic .pth -> engine -> forward_test (~2 min)
def test_full_ckpt_end_to_end_conversion(rng, tmp_path):
    """End-to-end: synthetic 6-net reference-schema .pth (tiny widths) ->
    converter -> engine state; every net converted (zero skips) and the
    engine's forward_test (G_label + G_normal + G_A2B chain,
    rdfc_gan.py:168-182) matches the same chain through the torch mirrors."""
    from convert_torch_ckpt import convert_reference_state
    from make_synth_ref_ckpt import make_ckpt

    from rdfc_gan_tpu.config import default_config, load_config
    from rdfc_gan_tpu.engines import build_engine
    from rdfc_gan_tpu.utils.torch_convert import load_torch_state_dict

    cfg = default_config()
    load_config(cfg, os.path.join(os.path.dirname(__file__), "..",
                                  "configs", "rdfc_gan_tiny.yaml"))
    H, W = 64, 64
    cfg.merge(dict(num_classes=5, out_height=H, out_width=W))

    pth = str(tmp_path / "synth_ref.pth")
    nets = make_ckpt(cfg, pth, num_classes=5, seed=3)

    engine = build_engine(cfg, is_train=False)
    batch = {
        "rgb": jnp.asarray(rng.normal(size=(1, H, W, 3)), jnp.float32),
        "raw_depth": jnp.abs(jnp.asarray(
            rng.normal(size=(1, H, W, 1)), jnp.float32)),
        "gt_depth": jnp.abs(jnp.asarray(
            rng.normal(size=(1, H, W, 1)), jnp.float32)),
    }
    state = engine.init_state(jax.random.PRNGKey(0), batch)

    sd = load_torch_state_dict(pth)
    state, report = convert_reference_state(sd, cfg, state)
    assert set(report) == {"G_A2B", "G_B2A", "disc_A", "disc_B",
                           "G_normal", "G_label"}
    assert all(msg.startswith("converted") for msg in report.values()), report

    got = engine.forward_test(state, rgb=batch["rgb"],
                              raw_depth=batch["raw_depth"])

    # the same chain through the torch mirrors
    for m in nets.values():
        m.eval()
    rgb_t = torch.from_numpy(np.asarray(batch["rgb"]).transpose(0, 3, 1, 2))
    raw_t = torch.from_numpy(
        np.asarray(batch["raw_depth"]).transpose(0, 3, 1, 2))
    with torch.no_grad():
        nrm = nets["G_normal"](rgb_t)[:, :3]
        nrm = nrm / torch.sqrt((nrm ** 2).sum(1, keepdim=True) + 1e-12)
        want = nets["G_A2B"](rgb_t, raw_t, nrm)["pred_depth"].numpy()
    np.testing.assert_allclose(
        np.asarray(got["pred_depth"])[..., 0], want[:, 0],
        rtol=1e-3, atol=1e-4)


@pytest.mark.slow  # builds the full-width B5 torch mirror (~1 min, CPU)
def test_nnet_b5_full_width_structure():
    """The converted B5-width tree must exactly match the flax NNET param
    structure (every leaf present, every shape equal) — catches channel
    arithmetic drift without running the full net."""
    from torch_ref_models import TorchNNET

    from rdfc_gan_tpu.models.normal_net import NNET
    from rdfc_gan_tpu.utils.torch_convert import convert_nnet

    tm = TorchNNET(out_height=8, out_width=8, width=1.6, depth=2.2)
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    tree = convert_nnet(sd, width=1.6, depth=2.2)

    fm = NNET(out_height=8, out_width=8, width=1.6, depth=2.2)
    variables = fm.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)),
                        train=False)
    want_shapes = jax.tree.map(lambda a: a.shape, variables["params"])
    got_shapes = jax.tree.map(lambda a: tuple(a.shape), tree["params"])
    assert want_shapes == got_shapes
    want_bs = jax.tree.map(lambda a: a.shape, variables["batch_stats"])
    got_bs = jax.tree.map(lambda a: tuple(a.shape), tree["batch_stats"])
    assert want_bs == got_bs


def test_efficientnet_torso_loader(rng):
    """pretrained_normal_path: a raw timm-layout B5 checkpoint (no wrapper
    prefix) loads into the NNET encoder and reproduces the wrapped
    conversion exactly (encoder.py:10-13 torch.hub behavior)."""
    from torch_ref_models import TorchNNET

    from rdfc_gan_tpu.utils.torch_convert import (convert_nnet,
                                                  load_efficientnet_torso)

    W, D = 0.5, 0.5
    tm = TorchNNET(out_height=16, out_width=16, width=W, depth=D)
    _randomize_bn(tm, rng)
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    full = convert_nnet(sd, width=W, depth=D)

    # raw timm layout: strip the NNET wrapper prefix
    raw_sd = {k[len("encoder.original_model."):]: v for k, v in sd.items()
              if k.startswith("encoder.original_model.")}
    init_p = {"EfficientNetEncoder_0": {}, "NormalDecoder_0": {"keep": 1}}
    init_s = {"EfficientNetEncoder_0": {}, "NormalDecoder_0": {}}
    p, s = load_efficientnet_torso(init_p, init_s, raw_sd, width=W, depth=D)
    got = jax.tree.map(lambda a: a.tolist(), p["EfficientNetEncoder_0"])
    want = jax.tree.map(lambda a: a.tolist(),
                        full["params"]["EfficientNetEncoder_0"])
    assert got == want
    assert p["NormalDecoder_0"] == {"keep": 1}  # decoder untouched
    got_s = jax.tree.map(lambda a: a.tolist(), s["EfficientNetEncoder_0"])
    want_s = jax.tree.map(lambda a: a.tolist(),
                          full["batch_stats"]["EfficientNetEncoder_0"])
    assert got_s == want_s


def test_pspnet_backbone_loader(rng):
    """pretrained_label_path: a backbone-layout dilated-R50 .pth (deep stem
    conv1.{0,1,3,4,6} + bn1 + layer1-4, backbone_resnet50.py:263-278) loads
    into the PSPNet tree and matches the full-checkpoint conversion."""
    from torch_ref_models import TorchPSPNet

    from rdfc_gan_tpu.utils.torch_convert import (convert_pspnet,
                                                  load_pspnet_backbone)

    tm = TorchPSPNet(num_classes=5, planes=(8, 8, 16, 16), stem=8)
    _randomize_bn(tm, rng)
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    full = convert_pspnet(sd)

    # backbone-layout file: initial.0.* -> conv1.*, initial.1 -> bn1
    bb_sd = {}
    for k, v in sd.items():
        if k.startswith("initial.0."):
            bb_sd["conv1." + k[len("initial.0."):]] = v
        elif k.startswith("initial.1."):
            bb_sd["bn1." + k[len("initial.1."):]] = v
        elif k.startswith("layer"):
            bb_sd[k] = v
    p, s = load_pspnet_backbone({"Conv_0": {"keep": 1}}, {}, bb_sd)
    assert p["Conv_0"] == {"keep": 1}  # heads untouched
    for key in ("DeepStem_0", "ResNetStage_0", "ResNetStage_3"):
        got = jax.tree.map(lambda a: a.tolist(), p[key])
        want = jax.tree.map(lambda a: a.tolist(), full["params"][key])
        assert got == want, key
        got_s = jax.tree.map(lambda a: a.tolist(), s[key])
        want_s = jax.tree.map(lambda a: a.tolist(),
                              full["batch_stats"][key])
        assert got_s == want_s, key
