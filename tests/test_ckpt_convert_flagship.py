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
