"""Residual-conv MNIST VAE, torchkit-style (reference models/vae/resconv.py).

Encoder trunk: 5 weight-normalized ResConv2d blocks (28->14->14->7->7->4)
-> ResLinear(512 -> c_dim) -> act (reference :38-53).
Decoder: ResLinear stack -> reshape (4,4,32) -> [upsample x2 (align_corners),
ResConv2d x2] with a crop to 7 after the first stage -> logits at 28x28
(reference :87-109). NHWC throughout; upsampling is exact align_corners=True
as interpolation matmuls (nn/conv.py).
"""

import flax.linen as nn

from ardae_tpu.nn.activations import get_nonlinear_func
from ardae_tpu.nn.conv import ResConv2d, ResLinear2, upsample_bilinear_align_corners
from ardae_tpu.nn.heads import NormalHead


class ResConvTrunk(nn.Module):
    """Shared resconv feature trunk -> (bsz, c_dim) (reference :38-53;
    also reused by the resconv IVAE and auxresconv models)."""

    c_dim: int = 450
    nonlinearity: str = "elu"
    do_center: bool = False

    @nn.compact
    def __call__(self, x):
        afun = get_nonlinear_func(self.nonlinearity)
        bsz = x.shape[0]
        x = x.reshape(bsz, 28, 28, 1)
        if self.do_center:
            x = 2.0 * x - 1.0
        h = afun(ResConv2d(16, 3, 2, 1, name="block0")(x))
        h = afun(ResConv2d(16, 3, 1, 1, name="block1")(h))
        h = afun(ResConv2d(32, 3, 2, 1, name="block2")(h))
        h = afun(ResConv2d(32, 3, 1, 1, name="block3")(h))
        h = afun(ResConv2d(32, 3, 2, 1, name="block4")(h))
        h = h.reshape(bsz, 32 * 4 * 4)
        return afun(ResLinear2(self.c_dim, name="fc")(h))


class ResConvDecoder(nn.Module):
    """Bernoulli-logit resconv decoder (reference models/vae/resconv.py:75-140).

    do_m5bias initializes the last block's skip-conv bias ~ N(-3, 1e-4)
    (reference :106-107).
    """

    c_dim: int = 450
    nonlinearity: str = "elu"
    do_m5bias: bool = False

    @nn.compact
    def __call__(self, z):
        afun = get_nonlinear_func(self.nonlinearity)
        bsz = z.shape[0]
        h = afun(ResLinear2(self.c_dim, name="fc0")(z.reshape(bsz, -1)))
        h = afun(ResLinear2(32 * 4 * 4, name="fc1")(h))
        h = h.reshape(bsz, 4, 4, 32)
        h = upsample_bilinear_align_corners(h, 2)  # 8x8
        h = afun(ResConv2d(32, 3, 1, 1, name="block0")(h))
        h = afun(ResConv2d(32, 3, 1, 1, name="block1")(h))
        h = h[:, :-1, :-1, :]  # slicer[:, :, :-1, :-1] -> 7x7
        h = upsample_bilinear_align_corners(h, 2)  # 14x14
        h = afun(ResConv2d(16, 3, 1, 1, name="block2")(h))
        h = afun(ResConv2d(16, 3, 1, 1, name="block3")(h))
        h = upsample_bilinear_align_corners(h, 2)  # 28x28
        logit = ResConv2d(1, 3, 1, 1, name="block4")(h)
        if self.do_m5bias:
            # reference draws the bias from N(-3, 0.0001) at init; an additive
            # constant on the logit is the deterministic equivalent.
            logit = logit - 3.0
        return (logit.reshape(bsz, -1),)


class MNISTResConvVAE(nn.Module):
    """resconv / resconvct baseline (reference models/vae/resconv.py:142-240).

    Note: the reference driver passes do_center=False for BOTH 'resconv' and
    'resconvct' (vae.py:233-249) — documented quirk, kept configurable here.
    """

    input_height: int = 28
    input_channels: int = 1
    z_dim: int = 32
    c_dim: int = 450
    nonlinearity: str = "elu"
    do_center: bool = False
    do_m5bias: bool = False

    family: str = "gaussian_posterior"
    likelihood: str = "bernoulli"
    center_input: bool = True

    def setup(self):
        assert self.input_height == 28 and self.input_channels == 1
        self.trunk = ResConvTrunk(self.c_dim, self.nonlinearity, self.do_center,
                                  name="trunk")
        self.enc_reparam = NormalHead(self.z_dim, name="enc_reparam")
        self.decode = ResConvDecoder(self.c_dim, self.nonlinearity,
                                     self.do_m5bias, name="decode")

    def encode_params(self, x):
        return self.enc_reparam(self.trunk(x))

    def decode_params(self, z_flat):
        return self.decode(z_flat)

    def __call__(self, x):
        mu_z, logvar_z = self.encode_params(x)
        (logit,) = self.decode_params(mu_z)
        return (mu_z, logvar_z), (logit,)
