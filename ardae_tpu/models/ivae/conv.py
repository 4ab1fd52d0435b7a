"""MNIST conv implicit-posterior VAE — the flagship benchmark model
(reference models/ivae/conv.py:562-823; north-star config of BASELINE.md).

Conv trunk runs ONCE per item; noise concat happens at fc4 over the
bsz*nz flattened rows (reference :625-654). Decoder is the conv VAE's
deconv decoder (reference :17 imports models/vae/conv.Decoder).
Whole model xavier-initialized by default (do_xavier=True, reference :682-686).
"""

import flax.linen as nn
import jax.numpy as jnp

from ardae_tpu.nn.activations import get_nonlinear_func
from ardae_tpu.nn.initializers import xavier_uniform_init, zeros_init
from ardae_tpu.nn.linear import Linear
from ardae_tpu.models.vae.conv import ConvDecoder, ConvEncoderTrunk


class ConvIPVAE(nn.Module):
    input_height: int = 28
    input_channels: int = 1
    z_dim: int = 32
    noise_dim: int = 100
    nonlinearity: str = "softplus"
    do_xavier: bool = True

    family: str = "flat"
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
        # fc4 split: trunk-feature part computed ONCE per item and broadcast
        # across nz; noise part per sample. Same math as one Linear over the
        # concat (reference models/ivae/conv.py:591,625-632) at ~1/6 the
        # flops when nz=625.
        self.fc4_inp = Linear(800, **lin_kwargs, name="fc4_inp")
        self.fc4_eps = Linear(800, use_bias=False, **{k: v for k, v in lin_kwargs.items() if k != "bias_init"}, name="fc4_eps")
        self.fc5 = Linear(self.z_dim, **lin_kwargs, name="fc5")
        self.decode = ConvDecoder(
            self.input_height, self.input_channels, self.nonlinearity,
            xavier=self.do_xavier, name="decode",
        )

    def encode_inp(self, x):
        return self.trunk(x)

    def encode_all(self, inp, nos):
        afun = get_nonlinear_func(self.nonlinearity)
        h4 = afun(self.fc4_inp(inp) + self.fc4_eps(nos))
        return self.fc5(h4)

    def sample_z(self, x, eps):
        afun = get_nonlinear_func(self.nonlinearity)
        bsz = x.shape[0]
        nz = eps.shape[0] // bsz
        h_inp = self.fc4_inp(self.encode_inp(x))  # (bsz, 800), once per item
        h_inp = jnp.broadcast_to(h_inp[:, None, :], (bsz, nz, 800))
        h4 = afun(h_inp.reshape(bsz * nz, 800) + self.fc4_eps(eps))
        z = self.fc5(h4)
        return z.reshape(bsz, nz, self.z_dim)

    def decode_params(self, z_flat):
        return self.decode(z_flat)

    def __call__(self, x, eps):
        z = self.sample_z(x, eps)
        (logit,) = self.decode(z.reshape(-1, self.z_dim))
        return z, (logit,)
