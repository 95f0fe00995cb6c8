"""End-to-end parity harness test (VERDICT r2 missing #1): synthetic
reference-schema .pth + real-format fixture corpus -> convert -> eval ->
side-by-side torch-mirror table, all through tools/parity_check.py's CLI."""

import os
import sys

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

TINY_CFG = os.path.join(os.path.dirname(__file__), "..", "configs",
                        "rdfc_gan_tiny.yaml")


@pytest.mark.slow
def test_parity_check_end_to_end(tmp_path, capsys):
    from rdfc_gan_tpu.config import default_config, load_config
    from tools.make_nyuv2_fixture import write_split
    from tools.make_synth_ref_ckpt import make_ckpt
    import tools.parity_check as pc

    root = str(tmp_path / "nyuv2")
    os.makedirs(root, exist_ok=True)
    write_split(root, "train", 2, seed=0)
    write_split(root, "test", 4, seed=1)

    cfg = default_config()
    load_config(cfg, TINY_CFG)
    pth = str(tmp_path / "synth_ref.pth")
    make_ckpt(cfg, pth, num_classes=14, seed=0)

    rc = pc.main(["--torch_ckpt", pth, "--data_root", root,
                  "--dataset", "nyuv2", "--model_cfg_path", TINY_CFG,
                  "--batch_size", "8", "--torch_eval"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "max |delta|" in out
    worst = float(out.rsplit("max |delta| =", 1)[1].strip())
    # converted flax engine and the torch mirrors must agree per-metric on
    # the same val images (same protocol, same un-normalization)
    assert worst < 5e-3, out
