"""main_vanilla driver contract (the reference ships the bash recipe but not
the driver — bash/test_nyuv2_Rs2T.sh:4): the vanilla generator trains a step
and evaluates through tools/main_v1.py --model vanilla."""

import os
import sys

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))


@pytest.mark.slow
def test_main_vanilla_smoke(tmp_path):
    from main_v1 import main

    rc = main([
        "--dataset", "synthetic", "--model", "vanilla", "--height", "64",
        "--width", "64", "--num_classes", "5", "--batch_size", "2",
        "--n_epochs", "1", "--val_interval", "1", "--log_interval", "4",
        "--save_interval", "1", "--use_guidance",
        "--work_dir", str(tmp_path / "vanilla_run"),
    ])
    assert rc == 0
    assert (tmp_path / "vanilla_run" / "epoch_1.ckpt").exists()


def test_vanilla_generator_tuple_contract(rng):
    """DCVGANGeneratorVanilla returns the reference 5-tuple; the engine
    adapter maps it onto the dict interface."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from rdfc_gan_tpu.engines.rdf_gan import _as_ret_dict
    from rdfc_gan_tpu.models.dcv_gan_generator_vanilla import (
        DCVGANGeneratorVanilla)

    m = DCVGANGeneratorVanilla(use_guidance=False,
                               rgb_channels_decoder=(8, 8, 8, 8, 8),
                               depth_channels_decoder=(8, 8, 8, 8, 8),
                               nr_decoder_blocks=(1, 0, 0, 0, 0))
    # >= 64px: the 1/32 bottleneck must stay >= 2x2 — AdaIN's unbiased
    # variance (calc_mean_std, model_utils.py:92-100) is NaN on a single
    # spatial element (true of the reference torch .var too)
    rgb = jnp.asarray(rng.normal(size=(1, 64, 64, 3)), jnp.float32)
    dep = jnp.asarray(rng.normal(size=(1, 64, 64, 1)), jnp.float32)
    variables = m.init(jax.random.PRNGKey(0), rgb, dep, train=False)
    ret = m.apply(variables, rgb, dep, train=False)
    assert isinstance(ret, tuple) and len(ret) == 5
    d = _as_ret_dict(ret)
    assert set(d) == {"depth_map_1", "confidence_map_1", "depth_map_2",
                      "confidence_map_2", "pred_depth"}
    assert np.isfinite(np.asarray(d["pred_depth"])).all()
