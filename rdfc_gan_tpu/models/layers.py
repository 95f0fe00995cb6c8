"""Shared Flax layers: conv/convT blocks, norms, W-AdaIN fusion family.

Parity targets:
  * conv_bn_relu / convt_bn_relu — encoder_decoder/common.py:33-63
    (LeakyReLU(0.2), BN when requested, bias iff no BN).
  * EqualLinear / AdaptiveInstanceNorm (W-AdaIN) / AdaIN / IN —
    rdf_generator/model_utils.py:7-129. EqualLinear stores a unit-normal
    weight and rescales by sqrt(2/fan_in) at call time (equalized LR);
    checkpoint converters must keep the stored (unscaled) tensor.

Layout: NHWC. Norm semantics: InstanceNorm is per-image (no params, matching
torch affine=False default); BatchNorm carries running stats in the
"batch_stats" collection and can psum batch statistics across the data mesh
axis (``axis_name``) — the SyncBN the reference registers but never ships
(module/norm.py:10).
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn
import numpy as np

# pix2pix-style init used by the reference engines (init_weights.py:5-44)
gan_kernel_init = nn.initializers.normal(stddev=0.02)
kaiming_init = nn.initializers.variance_scaling(2.0, "fan_in", "normal")


def leaky_relu02(x):
    return nn.leaky_relu(x, negative_slope=0.2)


def _outres_vjp_disabled(which: str) -> bool:
    """Output-residual norm VJPs are OFF by default (read at trace time).

    The round-4 chip A/B (PERF_AB.jsonl, bs8/224x304 flagship step) measured
    them neutral-to-negative: plain XLA autodiff 254.8 ms vs outres-on
    256.5 ms (Pallas disabled) — saving the backward's re-read of the
    pre-norm x is cancelled by materializing the norm OUTPUT y as the
    residual, which XLA would otherwise have fused into the consumer's
    elementwise chain. Opt back in for A/B with RDFC_OUTRES_VJP =
    "1"/"all" (both), "bn", or "in"; RDFC_DISABLE_OUTRES_VJP wins if both
    are set (docs/PERF_NOTES.md round-4)."""
    import os

    v = os.environ.get("RDFC_DISABLE_OUTRES_VJP", "")
    if v in ("1", "all") or v == which:
        return True
    e = os.environ.get("RDFC_OUTRES_VJP", "")
    return not (e in ("1", "all") or e == which)


def _bn_group(x, pack):
    """(grouped view, reduction axes) for per-ORIGINAL-channel batch stats."""
    if pack > 1:
        xg = x.reshape(*x.shape[:-1], x.shape[-1] // pack, pack)
        return xg, tuple(range(x.ndim - 1)) + (x.ndim,)
    return x, tuple(range(x.ndim - 1))


def _bn_train_fwd_impl(x, scale, bias, eps, pack, axis_name):
    xg, red = _bn_group(x, pack)
    mean = jnp.mean(xg.astype(jnp.float32), axis=red)
    mean2 = jnp.mean(jnp.square(xg.astype(jnp.float32)), axis=red)
    if axis_name is not None:
        mean = jax.lax.pmean(mean, axis_name)
        mean2 = jax.lax.pmean(mean2, axis_name)
    var = jnp.maximum(mean2 - jnp.square(mean), 0.0)
    rstd = jax.lax.rsqrt(var + eps)
    a = scale.astype(jnp.float32) * rstd
    b = bias.astype(jnp.float32) - mean * a
    af, bf = (jnp.repeat(a, pack), jnp.repeat(b, pack)) if pack > 1 \
        else (a, b)
    y = x * af.astype(x.dtype) + bf.astype(x.dtype)
    return y, mean, var, rstd


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def _bn_train(x, scale, bias, eps, pack, axis_name):
    """Train-mode batch norm with an output-residual backward.

    Returns (y, batch_mean, batch_var); mean/var feed the running-stat
    update only (their cotangents are zero — the update is outside grad).
    The custom backward reconstructs the normalized activation from the
    OUTPUT, x_hat = (y - beta) / gamma, so the pre-norm x is neither kept
    alive into the backward nor re-read by the reduction-gradient chains
    (one full activation read saved per BN per backward; same trick as
    ``instance_norm``). SyncBN: the dx correction sums are psum'd over
    ``axis_name`` with the GLOBAL element count, matching autodiff of the
    pmean'd forward; the returned scale/bias grads stay per-replica (the
    data-parallel gradient psum averages them, as with every other param).
    """
    y, mean, var, _ = _bn_train_fwd_impl(x, scale, bias, eps, pack,
                                         axis_name)
    return y, mean, var


def _bn_train_fwd(x, scale, bias, eps, pack, axis_name):
    y, mean, var, rstd = _bn_train_fwd_impl(x, scale, bias, eps, pack,
                                            axis_name)
    return (y, mean, var), (y, rstd, scale, bias)


def _bn_train_bwd(eps, pack, axis_name, res, cts):
    dy = cts[0]  # cotangents for (mean, var) are zero: running update only
    y, rstd, scale, bias = res
    sf = scale.astype(jnp.float32)
    bf = bias.astype(jnp.float32)
    # x_hat = (y - bias) / scale; guard scale==0 (then y == bias and the
    # reconstruction — like the gradient itself — is identically zero)
    ginv = jnp.where(jnp.abs(sf) > 1e-30, 1.0 / sf, 0.0)
    yg, red = _bn_group(y, pack)
    dyg, _ = _bn_group(dy, pack)
    n = 1
    for ax in red:
        n *= yg.shape[ax]
    # per-original-channel sums in f32, one sweep of y/dy
    s1 = jnp.sum(dyg.astype(jnp.float32), axis=red)            # sum dy
    sy = jnp.sum((dyg * yg).astype(jnp.float32), axis=red)     # sum dy*y
    # sum dy * x_hat = (sum dy*y - bias * sum dy) / scale
    s2 = (sy - bf * s1) * ginv
    dscale = s2.astype(scale.dtype)
    dbias = s1.astype(bias.dtype)
    n_glob = n
    if axis_name is not None:
        s1 = jax.lax.psum(s1, axis_name)
        s2 = jax.lax.psum(s2, axis_name)
        n_glob = n * jax.lax.axis_size(axis_name)
    m1, m2 = s1 / n_glob, s2 / n_glob
    # dx = A*(dy - m1 - x_hat*m2) with x_hat = (y - bias)*ginv collapses to
    # a per-channel axpby: dx = A*dy + cy*y + c0 — one fused sweep of y/dy
    A = sf * rstd
    cy = -A * ginv * m2
    c0 = A * (ginv * m2 * bf - m1)
    if pack > 1:
        A, cy, c0 = (jnp.repeat(A, pack), jnp.repeat(cy, pack),
                     jnp.repeat(c0, pack))
    dx = (A.astype(dy.dtype) * dy + cy.astype(dy.dtype) * y
          + c0.astype(dy.dtype))
    return dx, dscale, dbias


_bn_train.defvjp(_bn_train_fwd, _bn_train_bwd)


class BatchNorm(nn.Module):
    """Drop-in BatchNorm that keeps full-resolution traffic in the
    activation dtype.

    flax.linen.BatchNorm upcasts the activation to f32 for BOTH the
    statistics and the normalization elementwise chain; in the flagship
    train step those f32 copies of full-res tensors were 129 GB of the
    237 GB HBM traffic per step (docs/PERF_NOTES.md round-2 HLO audit).
    Here the per-channel statistics are f32 reductions (converts fuse into
    the reduces — nothing f32 materializes at activation shape) and the
    normalization is a single fused x*a+b in x.dtype with per-channel
    a = scale/sqrt(var+eps), b = bias - mean*a computed in f32.

    Same class name => same flax auto-naming (``BatchNorm_N``) => identical
    param/batch_stats trees and checkpoint/converter compatibility. Biased
    variance for both normalization and the running update (flax
    semantics). ``axis_name`` pmeans the statistics across the mesh axis
    (SyncBN)."""

    use_running_average: bool = False
    momentum: float = 0.9
    epsilon: float = 1e-5
    axis_name: Optional[str] = None
    dtype: Any = None  # accepted for drop-in compat; math is fixed as above
    # W-packed input (ops/packed.py): x's channel dim holds ``pack``
    # interleaved column phases per ORIGINAL channel (c-major). Stats are
    # per original channel: reduce the phase sub-axis too. Params and
    # running stats keep the original (C,) shape — checkpoint-identical.
    pack: int = 1

    @nn.compact
    def __call__(self, x):
        feat = x.shape[-1] // self.pack
        scale = self.param("scale", nn.initializers.ones, (feat,))
        bias = self.param("bias", nn.initializers.zeros, (feat,))
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros((feat,), jnp.float32))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones((feat,), jnp.float32))
        if self.use_running_average:
            mean, var = ra_mean.value, ra_var.value
            a = scale.astype(jnp.float32) * jax.lax.rsqrt(var + self.epsilon)
            b = bias.astype(jnp.float32) - mean * a
            if self.pack > 1:
                a = jnp.repeat(a, self.pack)
                b = jnp.repeat(b, self.pack)
            return x * a.astype(x.dtype) + b.astype(x.dtype)
        if _outres_vjp_disabled("bn"):
            y, mean, var, _ = _bn_train_fwd_impl(
                x, scale, bias, self.epsilon, self.pack, self.axis_name)
            mean, var = jax.lax.stop_gradient((mean, var))
        else:
            y, mean, var = _bn_train(x, scale, bias, self.epsilon,
                                     self.pack, self.axis_name)
        if not self.is_initializing():
            m = self.momentum
            ra_mean.value = m * ra_mean.value + (1 - m) * mean
            ra_var.value = m * ra_var.value + (1 - m) * var
        return y


def _in_group(x, pack):
    """(grouped view, reduction axes) for per-ORIGINAL-channel stats."""
    if pack > 1:
        B, H, Wp, C2 = x.shape
        return x.reshape(B, H, Wp, C2 // pack, pack), (1, 2, 4)
    return x, (1, 2)


def _instance_norm_fwd_impl(x, eps, pack):
    """Returns (y, af) — af the per-PACKED-channel (B, C) f32 scale
    broadcast (the VJP residual). One-pass stats (mean + mean-of-squares
    in a single reduce fusion); a fused Pallas single-read variant was
    tried and retired A/B-neutral on chip (attic/, PERF_NOTES round 5)."""
    xg, red = _in_group(x, pack)
    mean = jnp.mean(xg.astype(jnp.float32), axis=red)
    mean2 = jnp.mean(jnp.square(xg.astype(jnp.float32)), axis=red)
    var = jnp.maximum(mean2 - jnp.square(mean), 0.0)
    a = jax.lax.rsqrt(var + eps)  # (B, C_orig)
    b = -mean * a
    af, bf = a, b
    if pack > 1:
        af = jnp.repeat(af, pack, axis=-1)
        bf = jnp.repeat(bf, pack, axis=-1)
    y = x * af[:, None, None, :].astype(x.dtype) \
        + bf[:, None, None, :].astype(x.dtype)
    return y, af


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2))
def _instance_norm(x, eps, pack):
    return _instance_norm_fwd_impl(x, eps, pack)[0]


def _instance_norm_fwd(x, eps, pack):
    y, a = _instance_norm_fwd_impl(x, eps, pack)
    # residuals: the OUTPUT y (already live as the next op's input — costs
    # nothing extra) and the tiny per-(image,channel) scale. The autodiff
    # backward instead keeps x alive and re-reads it in the two
    # reduction-gradient chains — one full extra activation read per IN in
    # the backward, and x's buffer pinned across the whole backward.
    return y, (y, a)


def _instance_norm_bwd(eps, pack, res, dy):
    y, af = res
    # exact: y = (x - mu) * a with a = rsqrt(var + eps)  =>
    # dx = a * (dy - E[dy] - y * E[dy * y])   (E over the instance axes)
    yg, red = _in_group(y, pack)
    dyg, _ = _in_group(dy, pack)
    n = 1
    for ax in red:
        n *= yg.shape[ax]
    s1 = jnp.sum(dyg.astype(jnp.float32), axis=red) / n        # E[dy]
    # f32 multiply (not bf16-multiply-then-cast): matches the Pallas fused
    # backward's precision so the two dispatch paths agree to reduction
    # order; the converts fuse into the reduce either way (no extra bytes)
    s2 = jnp.sum(dyg.astype(jnp.float32) * yg.astype(jnp.float32),
                 axis=red) / n                                  # E[dy*y]
    m1, m2 = s1, s2
    if pack > 1:
        m1 = jnp.repeat(m1, pack, axis=-1)
        m2 = jnp.repeat(m2, pack, axis=-1)
    af = af[:, None, None, :]
    m1 = m1[:, None, None, :]
    m2 = m2[:, None, None, :]
    dx = af.astype(dy.dtype) * (
        dy - m1.astype(dy.dtype) - y * m2.astype(dy.dtype))
    return (dx,)


_instance_norm.defvjp(_instance_norm_fwd, _instance_norm_bwd)


def instance_norm(x: jnp.ndarray, eps: float = 1e-5,
                  pack: int = 1) -> jnp.ndarray:
    """Per-image, per-channel normalization; no affine (torch IN2d default).

    Statistics are f32 ONE-PASS reductions (mean and mean-of-squares in the
    same sweep): jnp.var's two-pass form makes XLA materialize a full f32
    copy of the activation (the round-3 HLO audit found six 280 MB
    f32[2B,H,W/2,128] copies of exactly this cast in the G_B2A step —
    this function was the hottest f32 writer). With the converts fused into
    the reduces, nothing f32 ever exists at activation shape and the
    normalization applies as one fused x*a+b in x.dtype.

    Carries a custom VJP whose residual is the OUTPUT (plus the (B,C)
    scale): dx = a*(dy - E[dy] - y*E[dy*y]), exact including eps. The
    autodiff backward re-reads the pre-norm activation x in its two
    reduction-gradient chains; the output form drops both that extra HBM
    read and x's liveness into the backward (docs/PERF_NOTES.md round-3).

    ``pack``: W-packed input (ops/packed.py) — per ORIGINAL channel stats
    (the phase sub-axis reduces with H, W)."""
    if _outres_vjp_disabled("in"):
        xg, red = _in_group(x, pack)
        mean = jnp.mean(xg.astype(jnp.float32), axis=red)
        mean2 = jnp.mean(jnp.square(xg.astype(jnp.float32)), axis=red)
        var = jnp.maximum(mean2 - jnp.square(mean), 0.0)
        a = jax.lax.rsqrt(var + eps)
        b = -mean * a
        if pack > 1:
            a = jnp.repeat(a, pack, axis=-1)
            b = jnp.repeat(b, pack, axis=-1)
        return x * a[:, None, None, :].astype(x.dtype) \
            + b[:, None, None, :].astype(x.dtype)
    return _instance_norm(x, eps, pack)


class PackedConv(nn.Module):
    """nn.Conv drop-in over a W-packed input (ops/packed.py).

    Parameters keep the ORIGINAL (kh, kw, Cin, Cout) 'kernel' / (Cout,)
    'bias' shapes and names, so checkpoints and converters are unchanged —
    instantiate with an explicit ``name`` (e.g. "Conv_0") to keep the
    param path identical to the nn.Conv it replaces. The packed kernel is
    assembled at trace time (exact; tests/test_packed.py)."""

    features: int
    kernel_size: Tuple[int, int] = (3, 3)
    strides: Tuple[int, int] = (1, 1)
    padding: int = 1  # ORIGINAL-space LEFT/symmetric padding
    use_bias: bool = True
    in_packed: bool = True
    out_packed: bool = True
    kernel_init: Callable = gan_kernel_init
    feature_group_count: int = 1
    # asymmetric right pads (SAME-geometry stems); None = symmetric
    padding_right: Optional[int] = None
    h_pad: Optional[Tuple[int, int]] = None

    @nn.compact
    def __call__(self, x):
        from ..ops.packed import conv_packed, wpack

        kh, kw = self.kernel_size
        cin = x.shape[-1] // (2 if self.in_packed else 1)
        w = self.param("kernel", self.kernel_init,
                       (kh, kw, cin // self.feature_group_count,
                        self.features))
        if not self.in_packed:
            x = wpack(x)
        out = conv_packed(x, w, self.padding, stride=self.strides,
                          out_packed=self.out_packed,
                          h_pad=self.h_pad, p_right=self.padding_right,
                          groups=self.feature_group_count)
        if self.use_bias:
            b = self.param("bias", nn.initializers.zeros, (self.features,))
            if self.out_packed:
                b = jnp.repeat(b, 2)
            out = out + b.astype(x.dtype)
        return out


class ConvBNAct(nn.Module):
    """conv(+BN|+IN)(+LeakyReLU0.2) — common.py:conv_bn_relu."""

    features: int
    kernel: int = 3
    stride: int = 1
    # None = torch-style symmetric (k-1)//2 — NOT XLA "SAME", which pads
    # (0,1) for k3/s2 on even sizes and breaks reference geometry parity
    padding: Any = None
    bn: bool = True
    use_in: bool = False
    relu: bool = True
    kernel_init: Callable = gan_kernel_init
    axis_name: Optional[str] = None
    packed: bool = False  # W-packed in AND out (ops/packed.py)

    @nn.compact
    def __call__(self, x, train: bool = True):
        assert not (self.bn and self.use_in)
        pad = (self.kernel - 1) // 2 if self.padding is None else self.padding
        if self.packed:
            x = PackedConv(
                self.features, (self.kernel, self.kernel),
                strides=(self.stride, self.stride), padding=pad,
                use_bias=not self.bn, kernel_init=self.kernel_init,
                name="Conv_0")(x)
        else:
            x = nn.Conv(
                self.features,
                (self.kernel, self.kernel),
                strides=(self.stride, self.stride),
                padding=pad,
                use_bias=not self.bn,
                kernel_init=self.kernel_init,
            )(x)
        if self.bn:
            x = BatchNorm(
                use_running_average=not train,
                momentum=0.9,
                epsilon=1e-5,
                axis_name=self.axis_name,
                dtype=x.dtype,
                pack=2 if self.packed else 1,
            )(x)
        if self.use_in:
            x = instance_norm(x)
        if self.relu:
            x = leaky_relu02(x)
        return x


class TorchConvTranspose(nn.Module):
    """Transposed conv with EXACT torch ConvTranspose2d(k, s, p, op) geometry:
    an lhs-dilated convolution with padding (k-1-p, k-1-p+op) and a spatially
    flipped kernel. Kernel stored HWIO (already flipped); converters map
    torch (Cin,Cout,kh,kw) via transpose(2,3,0,1)[::-1,::-1]."""

    features: int
    kernel: int = 3
    stride: int = 2
    padding: int = 1
    output_padding: int = 1
    use_bias: bool = True
    kernel_init: Callable = gan_kernel_init
    out_packed: bool = False  # W-packed output (ops/packed.py); s must be 2

    @nn.compact
    def __call__(self, x):
        k, s, p, op = self.kernel, self.stride, self.padding, self.output_padding
        w = self.param("kernel", self.kernel_init,
                       (k, k, x.shape[-1], self.features))
        if self.out_packed:
            from ..ops.packed import convt_packed_out

            assert s == 2
            out = convt_packed_out(x, w.astype(x.dtype), k=k, p=p, op=op)
        else:
            lo, hi = k - 1 - p, k - 1 - p + op
            out = jax.lax.conv_general_dilated(
                x, w.astype(x.dtype), window_strides=(1, 1),
                padding=((lo, hi), (lo, hi)), lhs_dilation=(s, s),
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
        if self.use_bias:
            b = self.param("bias", nn.initializers.zeros, (self.features,))
            if self.out_packed:
                b = jnp.repeat(b, 2)
            out = out + b.astype(x.dtype)
        return out


class ConvTBNAct(nn.Module):
    """convT(+BN)(+LeakyReLU0.2), torch ConvTranspose2d(k=3,s=2,p=1,op=1)
    geometry — common.py:convt_bn_relu; doubles H,W exactly."""

    features: int
    kernel: int = 3
    stride: int = 2
    bn: bool = True
    relu: bool = True
    kernel_init: Callable = gan_kernel_init
    axis_name: Optional[str] = None
    out_packed: bool = False

    @nn.compact
    def __call__(self, x, train: bool = True):
        x = TorchConvTranspose(
            self.features,
            kernel=self.kernel,
            stride=self.stride,
            padding=(self.kernel - 1) // 2,
            output_padding=self.stride - 1,
            use_bias=not self.bn,
            kernel_init=self.kernel_init,
            out_packed=self.out_packed,
        )(x)
        if self.bn:
            x = BatchNorm(
                use_running_average=not train,
                momentum=0.9,
                epsilon=1e-5,
                axis_name=self.axis_name,
                dtype=x.dtype,
                pack=2 if self.out_packed else 1,
            )(x)
        if self.relu:
            x = leaky_relu02(x)
        return x


class BlockFusedConv(nn.Module):
    """Several independent conv heads executed as ONE convolution.

    Each head reads a subset of the input tensors (``head_inputs[i]`` =
    indices into the ``inputs`` list) and produces ``head_out[i]`` channels.
    The fused kernel is assembled from per-head parameter blocks with
    structural ZEROS for unread inputs — zeros are trace-time constants, so
    no cross-head weights exist and gradients flow only to the real blocks.
    Mathematically identical to running the heads as separate convs over
    channel-concatenated inputs; on TPU it replaces several low-lane-count
    full-resolution convolutions with one wider MXU launch
    (docs/PERF_NOTES.md round-2).
    """

    head_out: Tuple[int, ...]
    head_inputs: Tuple[Tuple[int, ...], ...]
    kernel: int = 3
    kernel_init: Callable = gan_kernel_init
    packed: bool = False  # inputs and outputs W-packed (ops/packed.py)

    @nn.compact
    def __call__(self, inputs) -> Tuple[jnp.ndarray, ...]:
        k = self.kernel
        div = 2 if self.packed else 1
        chans = [x.shape[-1] // div for x in inputs]
        cols = []
        biases = []
        for i, (out, reads) in enumerate(zip(self.head_out,
                                             self.head_inputs)):
            rows = []
            for j, cj in enumerate(chans):
                if j in reads:
                    rows.append(self.param(f"kernel_{i}_{j}",
                                           self.kernel_init, (k, k, cj, out)))
                else:
                    rows.append(jnp.zeros((k, k, cj, out), jnp.float32))
            cols.append(jnp.concatenate(rows, axis=2))
            biases.append(self.param(f"bias_{i}", nn.initializers.zeros,
                                     (out,)))
        w = jnp.concatenate(cols, axis=3)
        b = jnp.concatenate(biases)
        x = jnp.concatenate(inputs, axis=-1)
        if self.packed:
            from ..ops.packed import conv_packed

            out = conv_packed(x, w.astype(x.dtype), k // 2)
            out = out + jnp.repeat(b, 2).astype(x.dtype)
            splits = 2 * np.cumsum(self.head_out)[:-1] if \
                len(self.head_out) > 1 else []
            return tuple(jnp.split(out, list(splits), axis=-1))
        out = jax.lax.conv_general_dilated(
            x, w.astype(x.dtype), window_strides=(1, 1),
            padding=((k // 2, k // 2),) * 2,
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        out = out + b.astype(x.dtype)
        splits = np.cumsum(self.head_out)[:-1] if len(self.head_out) > 1 \
            else []
        return tuple(jnp.split(out, list(splits), axis=-1))


class EqualLinear(nn.Module):
    """Equalized-LR linear (model_utils.py:7-50): weight stored ~N(0,1),
    scaled by sqrt(2/fan_in) at every call; bias starts at ``bias_init_value``.
    """

    features: int
    bias_init: Callable = nn.initializers.zeros

    @nn.compact
    def __call__(self, x):
        in_dim = x.shape[-1]
        w = self.param("weight", nn.initializers.normal(stddev=1.0),
                       (in_dim, self.features))
        b = self.param("bias", self.bias_init, (self.features,))
        scale = jnp.sqrt(2.0 / in_dim).astype(x.dtype)
        return x @ (w * scale) + b


def _wadain_bias_init(in_channel: int):
    """gamma half starts at 1, beta half at 0 (model_utils.py:60-62)."""

    def init(key, shape, dtype=jnp.float32):
        del key
        assert shape == (2 * in_channel,)
        return jnp.concatenate(
            [jnp.ones((in_channel,), dtype), jnp.zeros((in_channel,), dtype)]
        )

    return init


class AdaptiveInstanceNorm(nn.Module):
    """W-AdaIN: per-pixel style (gamma, beta) from the depth feature via an
    equalized-LR linear; optional 1x1-conv spatial weighting
    (model_utils.py:53-99)."""

    in_channel: int
    style_dim: int  # informational; inferred from the style input
    weighting: bool = False

    @nn.compact
    def __call__(self, content, style):
        # style: (B, H, W, style_dim) -> (B, H, W, 2*in_channel)
        s = EqualLinear(2 * self.in_channel,
                        bias_init=_wadain_bias_init(self.in_channel))(style)
        gamma, beta = jnp.split(s, 2, axis=-1)
        out = instance_norm(content)
        if self.weighting:
            gw = nn.Conv(self.in_channel, (1, 1))(content)
            bw = nn.Conv(self.in_channel, (1, 1))(content)
            return gw * gamma * out + bw * beta
        return gamma * out + beta


class AdaIN(nn.Module):
    """Parameter-free mean/std style transfer (model_utils.py:102-116)."""

    @nn.compact
    def __call__(self, content, style, eps: float = 1e-5):
        # calc_mean_std uses torch .var() == UNBIASED variance (ddof=1)
        # with eps added to var before sqrt (model_utils.py:92-100)
        sm = style.mean(axis=(1, 2), keepdims=True)
        ss = jnp.sqrt(style.var(axis=(1, 2), keepdims=True, ddof=1) + eps)
        cm = content.mean(axis=(1, 2), keepdims=True)
        cs = jnp.sqrt(content.var(axis=(1, 2), keepdims=True, ddof=1) + eps)
        return (content - cm) / cs * ss + sm


class INFuse(nn.Module):
    """concat -> IN -> 1x1 down-channel (model_utils.py:119-129)."""

    in_channel: int

    @nn.compact
    def __call__(self, content, style):
        x = jnp.concatenate([content, style], axis=-1)
        x = instance_norm(x)
        return nn.Conv(self.in_channel, (1, 1))(x)


class NonBottleneck1D(nn.Module):
    """ERFNet factorized residual block (model_utils.py:131-199)."""

    planes: int
    stride: int = 1
    dilation: int = 1
    use_in: bool = False
    residual_only: bool = False
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = True):
        def norm(z):
            if self.use_in:
                return instance_norm(z, eps=1e-3)
            return BatchNorm(use_running_average=not train, momentum=0.9,
                                epsilon=1e-3, axis_name=self.axis_name, dtype=z.dtype)(z)

        out = nn.Conv(self.planes, (3, 1), strides=(self.stride, 1),
                      padding=((1, 1), (0, 0)))(x)
        out = nn.relu(out)
        out = nn.Conv(self.planes, (1, 3), strides=(1, self.stride),
                      padding=((0, 0), (1, 1)))(out)
        out = norm(out)
        out = nn.relu(out)
        out = nn.Conv(self.planes, (3, 1),
                      padding=((self.dilation, self.dilation), (0, 0)),
                      kernel_dilation=(self.dilation, 1))(out)
        out = nn.relu(out)
        out = nn.Conv(self.planes, (1, 3),
                      padding=((0, 0), (self.dilation, self.dilation)),
                      kernel_dilation=(1, self.dilation))(out)
        out = norm(out)
        if self.residual_only:
            return out
        identity = x
        if self.stride != 1 or x.shape[-1] != self.planes:
            identity = nn.Conv(self.planes, (1, 1),
                               strides=(self.stride, self.stride))(x)
        return nn.relu(out + identity)


def _interp_matrix(src: int, dst: int) -> "np.ndarray":
    """(dst, src) align-corners bilinear interpolation matrix (trace-time
    numpy constant)."""
    import numpy as np

    m = np.zeros((dst, src), np.float32)
    if dst == 1 or src == 1:
        m[:, 0] = 1.0
        return m
    pos = np.linspace(0.0, src - 1, dst)
    lo = np.floor(pos).astype(np.int64)
    hi = np.minimum(lo + 1, src - 1)
    frac = (pos - lo).astype(np.float32)
    m[np.arange(dst), lo] += 1.0 - frac
    m[np.arange(dst), hi] += frac
    return m


def bilinear_resize(x: jnp.ndarray, size: Tuple[int, int],
                    align_corners: bool = False) -> jnp.ndarray:
    """Bilinear resize, NHWC, with torch-style align_corners option.

    jax.image.resize implements the align_corners=False (half-pixel)
    convention. align_corners=True runs as two dense interpolation matmuls
    (MXU-shaped, matrices are trace-time constants) — per-pixel gathers are
    pathological on the TPU vector units."""
    B, H, W, C = x.shape
    h, w = size
    if (H, W) == (h, w):
        return x
    if not align_corners:
        return jax.image.resize(x, (B, h, w, C), method="bilinear")
    wy = jnp.asarray(_interp_matrix(H, h), x.dtype)  # (h, H)
    wx = jnp.asarray(_interp_matrix(W, w), x.dtype)  # (w, W)
    out = jnp.einsum("hH,bHWc->bhWc", wy, x,
                     preferred_element_type=jnp.float32)
    out = jnp.einsum("wW,bhWc->bhwc", wx, out.astype(x.dtype),
                     preferred_element_type=jnp.float32)
    return out.astype(x.dtype)


def _reflect_fold(g: jnp.ndarray, pad: int, axis: int) -> jnp.ndarray:
    """Transpose of reflect padding along one axis: fold the mirrored border
    gradients back into the core (out[i] = x[pad - i] for i < pad, so
    dx[k] += g[pad - k], k = 1..pad; symmetric at the high end)."""
    n = g.shape[axis] - 2 * pad

    def sl(a, b):
        return tuple(slice(a, b) if d == axis else slice(None)
                     for d in range(g.ndim))

    core = g[sl(pad, pad + n)]
    lo = jnp.flip(g[sl(0, pad)], axis)
    hi = jnp.flip(g[sl(pad + n, 2 * pad + n)], axis)
    core = core.at[sl(1, pad + 1)].add(lo)
    return core.at[sl(n - pad - 1, n - 1)].add(hi)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def reflect_pad(x: jnp.ndarray, pad: int) -> jnp.ndarray:
    """Reflect-pad H and W. Carries a custom O(border) VJP: the transpose
    XLA derives for jnp.pad(mode="reflect") is a chain of FULL-tensor
    slice+add fusions (round-3 HLO audit: four ~140 MB passes per full-res
    pad in the G_B2A backward); the hand-written backward reads the
    gradient once and adds only the mirrored border strips."""
    return jnp.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0)), mode="reflect")


def _reflect_pad_fwd(x, pad):
    return reflect_pad(x, pad), None


def _reflect_pad_bwd(pad, _, g):
    return (_reflect_fold(_reflect_fold(g, pad, 1), pad, 2),)


reflect_pad.defvjp(_reflect_pad_fwd, _reflect_pad_bwd)
