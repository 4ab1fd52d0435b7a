"""Convolutional primitives (NHWC, TPU-native layout).

Re-implements the reference conv stack with torch-compatible shapes/inits:
  * Conv2d with torch default init (models/vae/conv.py:50-53 uses raw
    nn.Conv2d) and xavier variant.
  * ConvTranspose2d with exact torch output-size semantics
    out = (in-1)*s - 2p + k + output_padding, implemented as an
    input-dilated conv (XLA lowers this straight to the MXU).
  * torchkit WNconv2d / ResConv2d (reference models/layers2.py:238-330).
  * Bilinear x2 upsampling with align_corners=True (reference resconv
    decoder, models/vae/resconv.py:95-105): expressed as two small
    interpolation matmuls (H then W) instead of a gather — exact and
    MXU-friendly.

All spatial ops take/return (N, H, W, C).
"""

import math
from typing import Callable

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ardae_tpu.nn.initializers import (
    torch_conv_kernel_init,
    uniform_bound_init,
    xavier_uniform_conv_init,
    zeros_init,
)


def conv_out_size(hin, kernel_size, stride=1, padding=0, dilation=1):
    """(reference utils/msc.py:43-45)"""
    return int((hin + 2 * padding - dilation * (kernel_size - 1) - 1) / stride + 1)


def deconv_out_size(hin, kernel_size, stride=1, padding=0, output_padding=0, dilation=1):
    """(reference utils/msc.py:47-49)"""
    return int((hin - 1) * stride - 2 * padding + dilation * (kernel_size - 1) + output_padding + 1)


class Conv2d(nn.Module):
    """Plain conv, torch-1.2 default init; kernel stored HWIO."""

    features: int
    kernel_size: int
    stride: int = 1
    padding: int = 0
    use_bias: bool = True
    xavier: bool = False

    @nn.compact
    def __call__(self, x):
        in_ch = x.shape[-1]
        k = self.kernel_size
        kinit = xavier_uniform_conv_init if self.xavier else torch_conv_kernel_init
        kernel = self.param("kernel", kinit, (k, k, in_ch, self.features))
        y = jax.lax.conv_general_dilated(
            x, kernel,
            window_strides=(self.stride, self.stride),
            padding=[(self.padding, self.padding)] * 2,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        if self.use_bias:
            fan_in = in_ch * k * k
            binit = zeros_init if self.xavier else uniform_bound_init(1.0 / math.sqrt(fan_in))
            bias = self.param("bias", binit, (self.features,))
            y = y + bias
        return y


class ConvTranspose2d(nn.Module):
    """torch ConvTranspose2d semantics: out = (in-1)s - 2p + k + op.

    Implemented as conv_general_dilated with lhs_dilation=s, padding
    k-1-p (+op on the trailing side), and a spatially flipped kernel.
    """

    features: int
    kernel_size: int
    stride: int = 1
    padding: int = 0
    output_padding: int = 0
    use_bias: bool = True
    xavier: bool = False

    @nn.compact
    def __call__(self, x):
        in_ch = x.shape[-1]
        k = self.kernel_size
        # torch stores (in, out, k, k); fan_in = out*k*k for transposed conv.
        # we store HWIO with I=in_ch here and flip spatially at use.
        if self.xavier:
            # torch xavier on (in, out, k, k): fan_in=in*k*k? torch uses
            # dim1*rf = out*k*k as fan_in, dim0*rf = in*k*k as fan_out.
            def kinit(key, shape, dtype=jnp.float32):
                rf = k * k
                fan_in, fan_out = self.features * rf, in_ch * rf
                bound = math.sqrt(6.0 / (fan_in + fan_out))
                return jax.random.uniform(key, shape, dtype, -bound, bound)
        else:
            def kinit(key, shape, dtype=jnp.float32):
                bound = 1.0 / math.sqrt(self.features * k * k)
                return jax.random.uniform(key, shape, dtype, -bound, bound)

        kernel = self.param("kernel", kinit, (k, k, in_ch, self.features))
        flipped = kernel[::-1, ::-1, :, :]
        pad = k - 1 - self.padding
        y = jax.lax.conv_general_dilated(
            x, flipped,
            window_strides=(1, 1),
            padding=[(pad, pad + self.output_padding)] * 2,
            lhs_dilation=(self.stride, self.stride),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        if self.use_bias:
            fan_in = self.features * k * k
            binit = zeros_init if self.xavier else uniform_bound_init(1.0 / math.sqrt(fan_in))
            bias = self.param("bias", binit, (self.features,))
            y = y + bias
        return y


class WNConv2d(nn.Module):
    """torchkit WNconv2d (reference models/layers2.py:238-264): weight =
    scale * direction / ||direction|| per output channel; scale init 1."""

    features: int
    kernel_size: int
    stride: int = 1
    padding: int = 0
    use_bias: bool = True
    norm: bool = True

    @nn.compact
    def __call__(self, x):
        in_ch = x.shape[-1]
        k = self.kernel_size
        direction = self.param(
            "direction", torch_conv_kernel_init, (k, k, in_ch, self.features)
        )
        scale = self.param("scale", lambda key, s: jnp.ones(s), (self.features,))
        if self.norm:
            nrm = jnp.sqrt(jnp.sum(direction**2, axis=(0, 1, 2), keepdims=True))
            weight = direction / nrm * scale
        else:
            weight = direction * scale
        y = jax.lax.conv_general_dilated(
            x, weight,
            window_strides=(self.stride, self.stride),
            padding=[(self.padding, self.padding)] * 2,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        if self.use_bias:
            fan_in = in_ch * k * k
            bias = self.param(
                "bias", uniform_bound_init(1.0 / math.sqrt(fan_in)), (self.features,)
            )
            y = y + bias
        return y


class ResConv2d(nn.Module):
    """torchkit ResConv2d (reference models/layers2.py:305-330):
    out = conv_h1(act(conv_0h(x))) + conv_01(x); convs are WNconv2d
    (norm=True); conv_h1 is always 3x3 s1 p1."""

    features: int
    kernel_size: int
    stride: int = 1
    padding: int = 0
    activation: Callable = nn.relu

    @nn.compact
    def __call__(self, x):
        h = self.activation(
            WNConv2d(self.features, self.kernel_size, self.stride, self.padding,
                     name="conv_0h")(x)
        )
        out = WNConv2d(self.features, 3, 1, 1, name="conv_h1")(h)
        skip = WNConv2d(self.features, self.kernel_size, self.stride, self.padding,
                        name="conv_01")(x)
        return out + skip


class ResLinear2(nn.Module):
    """torchkit ResLinear (reference models/layers2.py:331-352): WNlinear
    with norm=True (unlike models/layers.py ResLinear which uses norm=False)."""

    features: int
    same_dim: bool = False
    activation: Callable = nn.relu

    @nn.compact
    def __call__(self, x):
        from ardae_tpu.nn.linear import WeightNormalizedLinear

        h = self.activation(
            WeightNormalizedLinear(self.features, norm=True, name="dot_0h")(x)
        )
        out = WeightNormalizedLinear(self.features, norm=True, name="dot_h1")(h)
        skip = x if self.same_dim else WeightNormalizedLinear(
            self.features, norm=True, name="dot_01"
        )(x)
        return out + skip


def _align_corners_matrix(n_in: int, n_out: int) -> np.ndarray:
    """(n_out, n_in) bilinear interpolation matrix with align_corners=True."""
    w = np.zeros((n_out, n_in), np.float32)
    if n_out == 1 or n_in == 1:
        w[:, 0] = 1.0
        return w
    scale = (n_in - 1) / (n_out - 1)
    for i in range(n_out):
        src = i * scale
        lo = int(math.floor(src))
        hi = min(lo + 1, n_in - 1)
        frac = src - lo
        w[i, lo] += 1.0 - frac
        w[i, hi] += frac
    return w


def upsample_bilinear_align_corners(x, factor: int = 2):
    """x2 bilinear upsample, align_corners=True (torch nn.Upsample parity).

    Expressed as two interpolation matmuls: (N,H,W,C) -> (N,2H,2W,C).
    Exact to torch semantics and lowers onto the MXU instead of gathers.
    """
    n, h, w, c = x.shape
    # interpolation matrices follow x's dtype so bf16 passes stay bf16
    # (an fp32 constant would promote the activations and mismatch the
    # bf16 conv kernels downstream)
    wh = jnp.asarray(_align_corners_matrix(h, h * factor), dtype=x.dtype)
    ww = jnp.asarray(_align_corners_matrix(w, w * factor), dtype=x.dtype)
    # interpolate H: (H_out, H) @ (N, H, W*C)
    y = jnp.einsum("oh,nhwc->nowc", wh, x)
    y = jnp.einsum("ow,nhwc->nhoc", ww, y)
    return y
