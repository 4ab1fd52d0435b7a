"""Baseline MNIST MLP VAE (reference models/vae/mnist.py:28-255).

Encoder rescales to 2x-1; decoder is Bernoulli-logit. Optional xavier init
(do_xavier) and a (-5) decoder logit bias (do_m5bias), reference :125-129.
"""

import flax.linen as nn
import jax.numpy as jnp

from ardae_tpu.nn.heads import NormalHead
from ardae_tpu.nn.initializers import xavier_uniform_init, zeros_init
from ardae_tpu.nn.linear import Linear
from ardae_tpu.nn.mlp import MLP
from ardae_tpu.models.ivae.mnist import _XavierMLP


class MNISTVAE(nn.Module):
    input_dim: int = 784
    h_dim: int = 300
    z_dim: int = 32
    nonlinearity: str = "softplus"
    num_hidden_layers: int = 2
    do_xavier: bool = False
    do_m5bias: bool = False

    family: str = "gaussian_posterior"
    likelihood: str = "bernoulli"
    center_input: bool = True

    def setup(self):
        mlp_cls = _XavierMLP if self.do_xavier else MLP
        lin_kwargs = (
            dict(kernel_init=xavier_uniform_init, bias_init=zeros_init)
            if self.do_xavier
            else {}
        )
        self.enc_main = mlp_cls(
            hidden_dim=self.h_dim, output_dim=self.h_dim,
            nonlinearity=self.nonlinearity,
            num_hidden_layers=self.num_hidden_layers - 1,
            use_nonlinearity_output=True, name="enc_main",
        )
        if self.do_xavier:
            self.enc_mean = Linear(self.z_dim, **lin_kwargs, name="enc_mean")
            self.enc_logvar = Linear(self.z_dim, **lin_kwargs, name="enc_logvar")
        else:
            self.enc_reparam = NormalHead(self.z_dim, name="enc_reparam")
        self.dec_main = mlp_cls(
            hidden_dim=self.h_dim, output_dim=self.h_dim,
            nonlinearity=self.nonlinearity,
            num_hidden_layers=self.num_hidden_layers - 1,
            use_nonlinearity_output=True, name="dec_main",
        )
        if self.do_m5bias:
            bias_init = lambda key, shape, dtype=jnp.float32: jnp.full(shape, -5.0, dtype)
        elif self.do_xavier:
            bias_init = zeros_init
        else:
            bias_init = None
        self.dec_logit = Linear(
            self.input_dim,
            kernel_init=xavier_uniform_init if self.do_xavier else None,
            bias_init=bias_init,
            name="dec_logit",
        )

    def encode_params(self, x):
        x = 2.0 * x.reshape(x.shape[0], -1) - 1.0
        h = self.enc_main(x)
        if self.do_xavier:
            return self.enc_mean(h), self.enc_logvar(h)
        return self.enc_reparam(h)

    def decode_params(self, z_flat):
        h = self.dec_main(z_flat.reshape(z_flat.shape[0], -1))
        return (self.dec_logit(h),)

    def __call__(self, x):
        mu_z, logvar_z = self.encode_params(x)
        (logit,) = self.decode_params(mu_z)
        return (mu_z, logvar_z), (logit,)
