"""NLSPN offset-clamp guard (VERDICT round-1 weak #3): telemetry + the
escalation dispatcher must do the right thing when a trained checkpoint
carries offsets larger than the stencil radius."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from rdfc_gan_tpu.models.rdf_generator import RDFGenerator
from rdfc_gan_tpu.ops.nlspn_guard import (MAX_STENCIL_RADIUS,
                                          escalate_nlspn_cfg)

ENC = (8, 8, 16, 16, 16, 16)
DEC = (8, 8, 8, 8)
NLSPN_CFG = dict(prop_kernel=3, prop_time=4, affinity="TGASS")


def _model(impl="gather", R=2):
    return RDFGenerator(rgb_channels_encoder=ENC, depth_channels_encoder=ENC,
                        rgb_channels_decoder=DEC, depth_channels_decoder=DEC,
                        use_nlspn_refine=True, nlspn_configs=NLSPN_CFG,
                        nlspn_impl=impl, nlspn_offset_radius=R)


def _inputs(rng, H=16, W=16):
    return (jnp.asarray(rng.normal(size=(1, H, W, 3)), jnp.float32),
            jnp.abs(jnp.asarray(rng.normal(size=(1, H, W, 1)), jnp.float32)),
            jnp.asarray(rng.normal(size=(1, H, W, 3)), jnp.float32))


def _with_offset_bias(variables, bias_val, rng=None):
    """Force large learned offsets via the conv_offset_aff bias (the first
    2*num output channels are offsets; the last num are affinities — those
    must be nonzero too, else all propagation weight sits on the center tap
    and the clamp has nothing to bite on)."""
    params = jax.device_get(variables["params"])
    b = np.array(params["conv_offset_aff"]["bias"])
    num = b.shape[0] // 3
    if rng is None:
        b[: 2 * num] = bias_val
    else:
        b[: 2 * num] = rng.uniform(bias_val * 0.5, bias_val, size=2 * num)
    b[2 * num:] = np.linspace(0.3, 1.2, num)
    params["conv_offset_aff"]["bias"] = jnp.asarray(b)
    out = dict(variables)
    out["params"] = params
    return out


def test_max_offset_telemetry(rng):
    m = _model()
    x = _inputs(rng)
    variables = m.init(jax.random.PRNGKey(0), *x, train=False)
    variables = _with_offset_bias(variables, 3.5)
    ret = m.apply(variables, *x, train=False)
    assert "nlspn_max_offset" in ret
    assert float(ret["nlspn_max_offset"]) >= 3.5


def test_stencil_exact_within_radius_divergent_beyond(rng):
    """Offsets > R: gather is ground truth; stencil-with-escalated-R matches
    it, stencil at the small R does not (the clamp bites)."""
    x = _inputs(rng)
    mg = _model("gather")
    variables = mg.init(jax.random.PRNGKey(0), *x, train=False)
    variables = _with_offset_bias(variables, 3.0, rng)
    want = np.asarray(mg.apply(variables, *x, train=False)["depth_map_2"])

    got_r4 = np.asarray(_model("stencil", R=4).apply(
        variables, *x, train=False)["depth_map_2"])
    np.testing.assert_allclose(got_r4, want, rtol=1e-4, atol=1e-5)

    got_r2 = np.asarray(_model("stencil", R=2).apply(
        variables, *x, train=False)["depth_map_2"])
    assert np.abs(got_r2 - want).max() > 1e-3


@pytest.mark.slow  # compiles the tiny engine's full forward_test (~2 min)
def test_probe_uses_forward_test_path(rng):
    """VERDICT r2 weak #6: probe_max_offset must measure the REAL inference
    path — engine-predicted normals feeding G_A2B — not RGB-as-normals. With
    a non-zero offset conv the two input distributions give different
    max|offset| values (the probe input changes the verdict), and the probe
    must match forward_test's telemetry bit-for-bit."""
    from rdfc_gan_tpu.config import default_config
    from rdfc_gan_tpu.data import DataLoader, SyntheticDataset
    from rdfc_gan_tpu.engines import build_engine
    from rdfc_gan_tpu.ops.nlspn_guard import probe_max_offset

    enc, dec = list(ENC), list(DEC)
    cfg = default_config()
    cfg.merge(dict(out_height=16, out_width=16, num_classes=5, batch_size=2,
                   donate=False))
    cfg.merge({"model": {
        "type": "RDFCGAN",
        "G_A2B": {"type": "RDFGenerator", "semantic_channels_in": 3,
                  "rgb_channels_encoder": enc, "depth_channels_encoder": enc,
                  "rgb_channels_decoder": dec, "depth_channels_decoder": dec,
                  "use_nlspn_refine": True, "nlspn_configs": dict(NLSPN_CFG),
                  "nlspn_impl": "gather"},
        "G_B2A": {"type": "ResnetGenerator", "input_channels": 1,
                  "output_channels": 3, "ngf": 8, "n_blocks": 2,
                  "norm_layer": "IN2d"},
        "Normal_G": {"width": 0.35, "depth": 0.3},
        "Label_G": {"backbone_depth": 18},
        "D_A": {"type": "PatchGANDiscriminator", "in_channels": 1,
                "out_channels": [8, 8, 1], "kernel_size": [4, 4, 4],
                "stride": [2, 2, 1], "padding": [1, 1, 1],
                "activation": "LeakyReLU"},
        "D_B": {"type": "PatchGANDiscriminator", "in_channels": 3,
                "out_channels": [8, 8, 1], "kernel_size": [4, 4, 4],
                "stride": [2, 2, 1], "padding": [1, 1, 1],
                "activation": "LeakyReLU"},
    }})
    eng = build_engine(cfg, is_train=False)
    ds = SyntheticDataset(length=2, height=16, width=16, num_classes=5)
    batch = {k: jnp.asarray(v)
             for k, v in next(iter(DataLoader(ds, 2, shuffle=False))).items()}
    state = eng.init_state(jax.random.PRNGKey(0), batch)
    # non-zero offset conv => offsets depend on the net input
    oa = state.params["G_A2B"]["conv_offset_aff"]
    oa["kernel"] = 0.5 * jax.random.normal(jax.random.PRNGKey(1),
                                           oa["kernel"].shape)

    probe = probe_max_offset(eng, state, batch)
    want = eng.forward_test(state, rgb=batch["rgb"],
                            raw_depth=batch["raw_depth"])
    assert probe == float(want["nlspn_max_offset"])  # bit-for-bit

    # the pre-fix behavior (RGB fed as the normal input) measures a
    # DIFFERENT activation distribution => different verdict input
    variables = {"params": state.params["G_A2B"]}
    if state.batch_stats.get("G_A2B"):
        variables["batch_stats"] = state.batch_stats["G_A2B"]
    rgb_fed = eng.modules["G_A2B"].apply(
        variables, batch["rgb"], batch["raw_depth"], batch["rgb"],
        train=False)
    assert float(rgb_fed["nlspn_max_offset"]) != probe


def test_escalation_policy():
    base = dict(use_nlspn_refine=True, nlspn_impl="auto",
                nlspn_offset_radius=2)
    # small offsets: unchanged
    cfg, changed = escalate_nlspn_cfg(dict(base), 1.0)
    assert not changed
    # moderate: escalate R, keep stencil
    cfg, changed = escalate_nlspn_cfg(dict(base), 2.8)
    assert changed and cfg["nlspn_offset_radius"] == 4
    assert cfg.get("nlspn_impl", "auto") != "gather"
    # large: fall back to gather
    cfg, changed = escalate_nlspn_cfg(dict(base), MAX_STENCIL_RADIUS + 3.0)
    assert changed and cfg["nlspn_impl"] == "gather"
    # no NLSPN: no-op
    cfg, changed = escalate_nlspn_cfg(dict(use_nlspn_refine=False), 99.0)
    assert not changed
