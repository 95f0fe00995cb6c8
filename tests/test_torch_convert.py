"""Torch->flax layout conversion oracles: converted weights must reproduce
the torch op's output through the JAX op."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from rdfc_gan_tpu.utils.torch_convert import (  # noqa: E402
    convert_convtranspose_weight,
    convert_tensor,
)


def test_conv_oihw_to_hwio(rng):
    x = rng.normal(size=(1, 3, 8, 8)).astype(np.float32)
    w = rng.normal(size=(5, 3, 3, 3)).astype(np.float32)
    want = torch.nn.functional.conv2d(
        torch.from_numpy(x), torch.from_numpy(w), padding=1).numpy()

    _, kernel = convert_tensor("conv.weight", w)
    got = jax.lax.conv_general_dilated(
        jnp.asarray(x.transpose(0, 2, 3, 1)), jnp.asarray(kernel),
        (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    np.testing.assert_allclose(np.asarray(got).transpose(0, 3, 1, 2), want,
                               rtol=1e-4, atol=1e-4)


def test_linear_transpose(rng):
    x = rng.normal(size=(2, 6)).astype(np.float32)
    w = rng.normal(size=(4, 6)).astype(np.float32)
    want = torch.nn.functional.linear(torch.from_numpy(x),
                                      torch.from_numpy(w)).numpy()
    _, kernel = convert_tensor("fc.weight", w)
    got = np.asarray(jnp.asarray(x) @ jnp.asarray(kernel))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_convtranspose_k3s2(rng):
    """torch ConvTranspose2d(k3,s2,p1,op1) vs TorchConvTranspose with
    converted weights — EXACT geometry parity (decoder convt_bn_relu)."""
    from rdfc_gan_tpu.models.layers import TorchConvTranspose

    x = rng.normal(size=(1, 4, 5, 6)).astype(np.float32)  # NCHW
    tconv = torch.nn.ConvTranspose2d(4, 3, 3, stride=2, padding=1,
                                     output_padding=1, bias=False)
    want = tconv(torch.from_numpy(x)).detach().numpy()

    w = tconv.weight.detach().numpy()  # (Cin, Cout, kh, kw)
    kernel = convert_convtranspose_weight(w)

    mod = TorchConvTranspose(3, kernel=3, stride=2, padding=1,
                             output_padding=1, use_bias=False)
    got = mod.apply({"params": {"kernel": jnp.asarray(kernel.copy())}},
                    jnp.asarray(x.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(got).transpose(0, 3, 1, 2), want,
                               rtol=1e-4, atol=1e-4)


def test_batchnorm_mapping(rng):
    import flax.linen as nn

    x = rng.normal(size=(2, 4, 4, 3)).astype(np.float32)
    bn = torch.nn.BatchNorm2d(3).eval()
    bn.weight.data = torch.from_numpy(rng.normal(size=3).astype(np.float32))
    bn.bias.data = torch.from_numpy(rng.normal(size=3).astype(np.float32))
    bn.running_mean.data = torch.from_numpy(
        rng.normal(size=3).astype(np.float32))
    bn.running_var.data = torch.from_numpy(
        rng.uniform(0.5, 2, size=3).astype(np.float32))
    want = bn(torch.from_numpy(x.transpose(0, 3, 1, 2))).detach().numpy()

    names = {}
    for tname in ["weight", "bias", "running_mean", "running_var"]:
        leaf, arr = convert_tensor(f"bn.{tname}",
                                   getattr(bn, tname).detach().numpy())
        names[leaf] = jnp.asarray(arr)
    mod = nn.BatchNorm(use_running_average=True, epsilon=1e-5)
    got = mod.apply({"params": {"scale": names["scale"],
                                "bias": names["bias"]},
                     "batch_stats": {"mean": names["mean"],
                                     "var": names["var"]}},
                    jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got).transpose(0, 3, 1, 2), want,
                               rtol=1e-4, atol=1e-4)
