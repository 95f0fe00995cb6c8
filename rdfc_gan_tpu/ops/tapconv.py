"""Tap-decomposed dilated 3x3 convolution — an MXU-geometry rewrite.

Motivation (docs/PERF_NOTES.md round 5 "G_label measured"): the dilated
R50 stages of G_label (layer3 dilation 2, layer4 dilation 4 multi-grid —
reference backbone_resnet50.py:126-235) are the ONE component of the
flagship step not at its byte floor: XLA's dilated-conv lowering runs at
30-35% of v5e bf16 peak over the 28x38 output-stride-8 plane. The
space-to-batch rewrite was measured/rejected (it shrinks the plane
further); THIS rewrite goes the other way: a stride-1 dilated 3x3 conv
is exactly a sum of nine SHIFTED POINTWISE products,

    y[i,j] = sum_{ky,kx in {0,1,2}} x_pad[i+ky*d, j+kx*d] @ K[ky,kx]

so each tap becomes one (B*H*W, Cin) x (Cin, Cout) GEMM — M ~ 8500 rows
at bs8 — which tiles the systolic array the way a 1x1 conv does,
regardless of dilation. FLOPs are identical; the extra bytes (the
activation is read 9x instead of once) are ~0.26 ms/step at the l3/l4
sizes against a measured ~18 ms MXU-utilization excess. Partial sums
accumulate in f32 (preferred_element_type), matching conv semantics.

Opt-in via RDFC_TAPCONV_DILATED=1 (chip A/B pending; the winner becomes
the default, PERF_AB.jsonl discipline). Parameter tree is IDENTICAL to
the nn.Conv it replaces (kernel HWIO under the same module name), so
checkpoints and converters are unaffected by the flag.
"""

from __future__ import annotations

import os
from typing import Any, Callable

import flax.linen as nn
import jax.numpy as jnp
from jax import lax


def tapconv_enabled() -> bool:
    return os.environ.get("RDFC_TAPCONV_DILATED", "0") not in ("", "0")


def dilated_conv3x3_tapsum(x: jnp.ndarray, kernel: jnp.ndarray,
                           dilation: int) -> jnp.ndarray:
    """Stride-1 'SAME' (padding=dilation) dilated 3x3 conv as 9 pointwise
    GEMMs. x: (B,H,W,Cin) NHWC; kernel: (3,3,Cin,Cout) HWIO."""
    b, h, w, cin = x.shape
    cout = kernel.shape[-1]
    d = int(dilation)
    xp = jnp.pad(x, ((0, 0), (d, d), (d, d), (0, 0)))
    rows = b * h * w
    acc = jnp.zeros((rows, cout), jnp.float32)
    for ky in range(3):
        for kx in range(3):
            xs = lax.slice(xp, (0, ky * d, kx * d, 0),
                           (b, ky * d + h, kx * d + w, cin))
            acc = acc + lax.dot_general(
                xs.reshape(rows, cin), kernel[ky, kx],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
    return acc.reshape(b, h, w, cout).astype(x.dtype)


class TapDilatedConv3x3(nn.Module):
    """Drop-in for ``nn.Conv(features, (3,3), padding=d,
    kernel_dilation=(d,d), use_bias=False)`` at stride 1 — same 'kernel'
    param (HWIO), same output, tap-GEMM compute path. Instantiate with
    the explicit ``name=`` the nn.Conv would have auto-received so the
    variable tree is unchanged."""

    features: int
    dilation: int
    kernel_init: Callable[..., Any] = nn.initializers.lecun_normal()

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        kernel = self.param("kernel", self.kernel_init,
                            (3, 3, x.shape[-1], self.features))
        kernel = kernel.astype(x.dtype)
        return dilated_conv3x3_tapsum(x, kernel, self.dilation)
