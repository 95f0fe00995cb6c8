"""Single-image inference CLI (tools/inference.py — parity:
RDF-GAN/lib/tools/inference.py:38-94): png in -> 16-bit depth png +
colormap jpg out, with the training-stat (un)normalization applied."""

import os
import sys

import numpy as np
import pytest

TOOLS = os.path.join(os.path.dirname(__file__), "..", "tools")
sys.path.insert(0, os.path.abspath(TOOLS))


@pytest.mark.slow  # full tiny-engine compile + CLI end-to-end (~2 min)
def test_inference_tool_end_to_end(tmp_path):
    import cv2

    rng = np.random.default_rng(0)
    rgb = (rng.uniform(0, 255, (40, 56, 3))).astype(np.uint8)
    depth_mm = (rng.uniform(500, 8000, (40, 56))).astype(np.uint16)
    rgb_p = str(tmp_path / "rgb.png")
    dep_p = str(tmp_path / "depth.png")
    out_p = str(tmp_path / "pred.png")
    cv2.imwrite(rgb_p, rgb)
    cv2.imwrite(dep_p, depth_mm)

    from inference import main

    cfg = os.path.join(os.path.dirname(__file__), "..", "configs",
                       "rdfc_gan_tiny.yaml")
    main(["--model_cfg_path", cfg, "--rgb", rgb_p, "--depth", dep_p,
          "--out", out_p, "--out_height", "32", "--out_width", "48"])

    assert os.path.exists(out_p)
    assert os.path.exists(str(tmp_path / "pred_vis.jpg"))
    pred = cv2.imread(out_p, cv2.IMREAD_UNCHANGED)
    assert pred.dtype == np.uint16 and pred.shape == (32, 48)
    # un-normalization is x*5+5 meters -> [0, 10] m plausible band in mm
    assert 0 <= pred.min() and pred.max() <= 12000
