"""NLSPN offset-clamp guard (VERDICT round-1 weak #3): telemetry + the
escalation dispatcher must do the right thing when a trained checkpoint
carries offsets larger than the stencil radius."""

import numpy as np
import jax
import jax.numpy as jnp

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
