"""Conv primitive parity tests against torch (CPU) with shared weights."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as TF

from ardae_tpu.nn.conv import (
    Conv2d,
    ConvTranspose2d,
    ResConv2d,
    WNConv2d,
    conv_out_size,
    deconv_out_size,
    upsample_bilinear_align_corners,
)

KEY = jax.random.PRNGKey(0)


def _nchw(x_nhwc):
    return torch.from_numpy(np.array(x_nhwc).transpose(0, 3, 1, 2))


def _from_torch_kernel(w_torch):
    # torch conv weight (out, in, k, k) -> HWIO
    return jnp.asarray(w_torch.numpy().transpose(2, 3, 1, 0))


def test_conv2d_matches_torch():
    x = jax.random.normal(KEY, (2, 28, 28, 3))
    mod = Conv2d(features=8, kernel_size=5, stride=2, padding=2)
    params = mod.init(KEY, x)
    w = torch.randn(8, 3, 5, 5)
    b = torch.randn(8)
    params = {"params": {"kernel": _from_torch_kernel(w), "bias": jnp.asarray(b.numpy())}}
    y = mod.apply(params, x)
    yt = TF.conv2d(_nchw(x), w, b, stride=2, padding=2).numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(np.array(y), yt, atol=2e-4)
    assert y.shape[1] == conv_out_size(28, 5, 2, 2)


@pytest.mark.parametrize("hin,op", [(4, 0), (8, 0), (7, 1)])
def test_convtranspose2d_matches_torch(hin, op):
    x = jax.random.normal(KEY, (2, hin, hin, 4))
    mod = ConvTranspose2d(features=6, kernel_size=5, stride=2, padding=2, output_padding=op)
    params = mod.init(KEY, x)
    w = torch.randn(4, 6, 5, 5)  # torch transposed conv: (in, out, k, k)
    b = torch.randn(6)
    # our kernel is HWIO with I=in: (k, k, in, out)
    params = {
        "params": {
            "kernel": jnp.asarray(w.numpy().transpose(2, 3, 0, 1)),
            "bias": jnp.asarray(b.numpy()),
        }
    }
    y = mod.apply(params, x)
    yt = TF.conv_transpose2d(
        _nchw(x), w, b, stride=2, padding=2, output_padding=op
    ).numpy().transpose(0, 2, 3, 1)
    assert y.shape == yt.shape
    np.testing.assert_allclose(np.array(y), yt, atol=2e-4)
    assert y.shape[1] == deconv_out_size(hin, 5, 2, 2, op)


def test_upsample_bilinear_align_corners_matches_torch():
    x = jax.random.normal(KEY, (2, 4, 4, 3))
    y = upsample_bilinear_align_corners(x, 2)
    yt = TF.interpolate(_nchw(x), scale_factor=2, mode="bilinear", align_corners=True)
    np.testing.assert_allclose(np.array(y), yt.numpy().transpose(0, 2, 3, 1), atol=1e-5)


def test_wnconv_and_resconv_shapes():
    x = jax.random.normal(KEY, (2, 28, 28, 1))
    mod = ResConv2d(features=16, kernel_size=3, stride=2, padding=1)
    params = mod.init(KEY, x)
    y = mod.apply(params, x)
    assert y.shape == (2, 14, 14, 16)
    mod2 = WNConv2d(features=8, kernel_size=3, stride=1, padding=1)
    p2 = mod2.init(KEY, x)
    assert mod2.apply(p2, x).shape == (2, 28, 28, 8)
