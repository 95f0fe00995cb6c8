"""test.py driver regression: the NLSPN guard must work for BOTH config
layouts (model.G_A2B cycle configs and model.G single-generator configs) —
the latter crashed with AttributeError before the round-2 review fix."""

import os
import sys

import pytest
import yaml

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

TINY_ENC = [16, 16, 16, 16, 16, 16]
TINY_DEC = [16, 16, 16, 16]


@pytest.mark.slow
def test_testpy_with_rdfgan_config(tmp_path):
    import jax

    import test as test_driver
    from rdfc_gan_tpu.config import default_config
    from rdfc_gan_tpu.data import SyntheticDataset
    from rdfc_gan_tpu.engines import build_engine
    from rdfc_gan_tpu.utils.checkpoint import save_checkpoint

    model_yaml = {
        "model": {
            "type": "RDFGAN",
            "G": {"type": "RDFGenerator", "semantic_channels_in": 3,
                  "rgb_channels_encoder": TINY_ENC,
                  "depth_channels_encoder": TINY_ENC,
                  "rgb_channels_decoder": TINY_DEC,
                  "depth_channels_decoder": TINY_DEC,
                  "use_nlspn_refine": True,
                  "nlspn_configs": {"prop_kernel": 3, "prop_time": 2}},
            "D": {"type": "PatchGANDiscriminator", "in_channels": 1,
                  "out_channels": [8, 8, 1], "kernel_size": [4, 4, 4],
                  "stride": [2, 2, 1], "padding": [1, 1, 1],
                  "activation": "LeakyReLU"},
        }
    }
    cfg_path = str(tmp_path / "rdfgan.yaml")
    with open(cfg_path, "w") as f:
        yaml.safe_dump(model_yaml, f)

    # build a matching eval-mode engine and save a checkpoint to load
    cfg = default_config()
    from rdfc_gan_tpu.config import load_config

    load_config(cfg, cfg_path)
    cfg.merge(dict(out_height=32, out_width=32, num_classes=5, batch_size=2))
    eng = build_engine(cfg, is_train=False)
    ds = SyntheticDataset(length=2, height=32, width=32, num_classes=5)
    import jax.numpy as jnp
    import numpy as np

    batch = {k: jnp.asarray(np.stack([ds[i][k] for i in range(2)]))
             for k in ds[0]}
    state = eng.init_state(jax.random.PRNGKey(0), batch)
    ckpt = str(tmp_path / "g.ckpt")
    save_checkpoint(state, ckpt, meta=dict(epoch=1))

    rc = test_driver.main([
        "--dataset", "synthetic", "--model_cfg_path", cfg_path,
        "--work_dir", str(tmp_path / "w"), "--batch_size", "2",
        "--out_height", "32", "--out_width", "32", "--num_classes", "5",
        "--load_from", ckpt,
    ])
    assert rc == 0
