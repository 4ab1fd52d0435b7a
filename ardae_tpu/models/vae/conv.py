"""MNIST conv VAE (reference models/vae/conv.py:29-295).

Encoder: 3 x (5x5, stride 2) convs -> fc800 -> Normal head.
Decoder: MLP -> 3 deconvs with the reference's ZeroPad trim trick
(pad (0,1,0,1) after deconv1, crop (0,-1,0,-1) after the logit deconv)
so 4 -> 7 -> 8 -> 15 -> 29 -> 28. NHWC throughout.
"""

import flax.linen as nn
import jax.numpy as jnp

from ardae_tpu.nn.activations import get_nonlinear_func
from ardae_tpu.nn.conv import Conv2d, ConvTranspose2d, conv_out_size
from ardae_tpu.nn.heads import NormalHead
from ardae_tpu.nn.initializers import xavier_uniform_init, zeros_init
from ardae_tpu.nn.linear import Linear
from ardae_tpu.nn.mlp import MLP
from ardae_tpu.models.ivae.mnist import _XavierMLP


class ConvEncoderTrunk(nn.Module):
    """Shared conv trunk (reference models/vae/conv.py:29-77 minus the head)."""

    input_height: int = 28
    input_channels: int = 1
    nonlinearity: str = "softplus"
    xavier: bool = False

    @nn.compact
    def __call__(self, x):
        afun = get_nonlinear_func(self.nonlinearity)
        bsz = x.shape[0]
        x = x.reshape(bsz, self.input_height, self.input_height, self.input_channels)
        x = 2.0 * x - 1.0
        h = afun(Conv2d(16, 5, 2, 2, xavier=self.xavier, name="conv1")(x))
        h = afun(Conv2d(32, 5, 2, 2, xavier=self.xavier, name="conv2")(h))
        h = afun(Conv2d(32, 5, 2, 2, xavier=self.xavier, name="conv3")(h))
        return h.reshape(bsz, -1)


class ConvDecoder(nn.Module):
    """Deconv Bernoulli decoder (reference models/vae/conv.py:79-136)."""

    input_height: int = 28
    input_channels: int = 1
    nonlinearity: str = "softplus"
    xavier: bool = False
    m5bias: bool = False

    @nn.compact
    def __call__(self, z):
        afun = get_nonlinear_func(self.nonlinearity)
        bsz = z.shape[0]
        s_h8 = conv_out_size(
            conv_out_size(conv_out_size(self.input_height, 5, 2, 2), 5, 2, 2), 5, 2, 2
        )
        mlp_cls = _XavierMLP if self.xavier else MLP
        h = mlp_cls(
            hidden_dim=300,
            output_dim=s_h8 * s_h8 * 32,
            nonlinearity=self.nonlinearity,
            num_hidden_layers=1,
            use_nonlinearity_output=True,
            name="fc",
        )(z.reshape(bsz, -1))
        h = h.reshape(bsz, s_h8, s_h8, 32)
        h = afun(ConvTranspose2d(32, 5, 2, 2, xavier=self.xavier, name="deconv1")(h))
        # ZeroPad2d((0,1,0,1)): pad right/bottom by one
        h = jnp.pad(h, ((0, 0), (0, 1), (0, 1), (0, 0)))
        h = afun(ConvTranspose2d(16, 5, 2, 2, xavier=self.xavier, name="deconv2")(h))
        logit = ConvTranspose2d(
            self.input_channels, 5, 2, 2, xavier=self.xavier, name="reparam_logit"
        )(h)
        if self.m5bias:
            logit = logit - 5.0
        # ZeroPad2d((0,-1,0,-1)): crop one row/col from right/bottom
        logit = logit[:, :-1, :-1, :]
        return (logit.reshape(bsz, -1),)


class MNISTConvVAE(nn.Module):
    """conv baseline (reference models/vae/conv.py:138-295)."""

    input_height: int = 28
    input_channels: int = 1
    z_dim: int = 32
    nonlinearity: str = "softplus"
    do_xavier: bool = False
    do_m5bias: bool = False

    family: str = "gaussian_posterior"
    likelihood: str = "bernoulli"
    center_input: bool = True

    def setup(self):
        self.trunk = ConvEncoderTrunk(
            self.input_height, self.input_channels, self.nonlinearity,
            xavier=self.do_xavier, name="trunk",
        )
        lin_kwargs = (
            dict(kernel_init=xavier_uniform_init, bias_init=zeros_init)
            if self.do_xavier else {}
        )
        self.enc_fc = Linear(800, **lin_kwargs, name="enc_fc")
        if self.do_xavier:
            self.enc_mean = Linear(self.z_dim, **lin_kwargs, name="enc_mean")
            self.enc_logvar = Linear(self.z_dim, **lin_kwargs, name="enc_logvar")
        else:
            self.enc_reparam = NormalHead(self.z_dim, name="enc_reparam")
        self.decode = ConvDecoder(
            self.input_height, self.input_channels, self.nonlinearity,
            xavier=self.do_xavier, m5bias=self.do_m5bias, name="decode",
        )

    def encode_params(self, x):
        afun = get_nonlinear_func(self.nonlinearity)
        h = afun(self.enc_fc(self.trunk(x)))
        if self.do_xavier:
            return self.enc_mean(h), self.enc_logvar(h)
        return self.enc_reparam(h)

    def decode_params(self, z_flat):
        return self.decode(z_flat)

    def __call__(self, x):
        mu_z, logvar_z = self.encode_params(x)
        (logit,) = self.decode_params(mu_z)
        return (mu_z, logvar_z), (logit,)
