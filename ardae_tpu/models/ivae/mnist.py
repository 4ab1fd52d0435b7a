"""MNIST MLP implicit-posterior VAE (reference models/ivae/mnist.py:38-518).

Encoder rescales pixels to 2x-1, concat-fuses trunk features with raw noise;
decoder is an MLP Bernoulli-logit head. Decoder params are xavier-initialized
(reference :233-238 applies weight_init to decode only); the encoder output
layer kernel is N(0,1) under init='gaussian'.
"""

import flax.linen as nn
import jax.numpy as jnp

from ardae_tpu.nn.initializers import xavier_uniform_init, zeros_init
from ardae_tpu.nn.linear import Linear
from ardae_tpu.nn.mlp import MLP


import functools

# xavier-everywhere MLP (weight_init parity, reference models/ivae/mnist.py:20-25)
_XavierMLP = functools.partial(MLP, xavier=True)


class MNISTConcatEncoder(nn.Module):
    """ConcatEncoder (reference models/ivae/mnist.py:123-165): the driver
    constructs it with num_hidden_layers+1 (reference :227)."""

    input_dim: int = 784
    noise_dim: int = 100
    h_dim: int = 300
    z_dim: int = 32
    nonlinearity: str = "softplus"
    num_hidden_layers: int = 2  # already the +1'd value
    init_mode: str = "gaussian"

    def setup(self):
        self.inp_encode = MLP(
            hidden_dim=self.h_dim,
            output_dim=self.h_dim,
            nonlinearity=self.nonlinearity,
            num_hidden_layers=self.num_hidden_layers,
            use_nonlinearity_output=True,
            name="inp_encode",
        )
        # first fc layer split into trunk/noise parts (see conv.py note)
        self.fc_l0_inp = Linear(self.h_dim, name="fc_l0_inp")
        self.fc_l0_eps = Linear(self.h_dim, use_bias=False, name="fc_l0_eps")
        from ardae_tpu.nn.initializers import normal_init

        self.fc_out = Linear(
            self.z_dim,
            kernel_init=normal_init(1.0) if self.init_mode == "gaussian" else None,
            name="fc_out",
        )

    def forward_inp(self, x):
        x = x.reshape(x.shape[0], -1)
        return self.inp_encode(2.0 * x - 1.0)

    def forward_all(self, inp, nos):
        from ardae_tpu.nn.activations import get_nonlinear_func

        afun = get_nonlinear_func(self.nonlinearity)
        h = afun(self.fc_l0_inp(inp) + self.fc_l0_eps(nos))
        return self.fc_out(h)

    def __call__(self, x, eps):
        from ardae_tpu.nn.activations import get_nonlinear_func

        afun = get_nonlinear_func(self.nonlinearity)
        bsz = x.shape[0]
        nz = eps.shape[0] // bsz
        h_inp = self.fc_l0_inp(self.forward_inp(x))  # once per item
        h_inp = jnp.broadcast_to(h_inp[:, None, :], (bsz, nz, self.h_dim))
        h = afun(h_inp.reshape(bsz * nz, self.h_dim) + self.fc_l0_eps(eps))
        z = self.fc_out(h)
        return z.reshape(bsz, nz, self.z_dim)


class MNISTDecoder(nn.Module):
    """Bernoulli MLP decoder (reference models/ivae/mnist.py:167-199),
    xavier-initialized."""

    input_dim: int = 784
    h_dim: int = 300
    nonlinearity: str = "softplus"
    num_hidden_layers: int = 1

    def setup(self):
        self.main = _XavierMLP(
            hidden_dim=self.h_dim,
            output_dim=self.h_dim,
            nonlinearity=self.nonlinearity,
            num_hidden_layers=self.num_hidden_layers,
            use_nonlinearity_output=True,
            name="main",
        )
        # the logit head is a plain Linear hit by the same xavier weight_init
        self.reparam_logit = Linear(
            self.input_dim, kernel_init=xavier_uniform_init, bias_init=zeros_init,
            name="reparam_logit",
        )

    def __call__(self, z):
        h = self.main(z.reshape(z.shape[0], -1))
        return (self.reparam_logit(h),)  # (logit,)


class MNISTIPVAE(nn.Module):
    """mnist-concat implicit VAE (reference models/ivae/mnist.py:201-518)."""

    input_dim: int = 784
    noise_dim: int = 100
    h_dim: int = 300
    z_dim: int = 32
    nonlinearity: str = "softplus"
    num_hidden_layers: int = 1
    init_mode: str = "gaussian"
    enc_type: str = "concat"

    family: str = "flat"
    likelihood: str = "bernoulli"
    center_input: bool = True

    def setup(self):
        assert self.enc_type == "concat"
        self.encode = MNISTConcatEncoder(
            input_dim=self.input_dim,
            noise_dim=self.noise_dim,
            h_dim=self.h_dim,
            z_dim=self.z_dim,
            nonlinearity=self.nonlinearity,
            num_hidden_layers=self.num_hidden_layers + 1,
            init_mode=self.init_mode,
            name="encode",
        )
        self.decode = MNISTDecoder(
            input_dim=self.input_dim,
            h_dim=self.h_dim,
            nonlinearity=self.nonlinearity,
            num_hidden_layers=self.num_hidden_layers,
            name="decode",
        )

    def sample_z(self, x, eps):
        return self.encode(x, eps)

    def decode_params(self, z_flat):
        return self.decode(z_flat)

    def encode_inp(self, x):
        return self.encode.forward_inp(x)

    def encode_all(self, inp, nos):
        return self.encode.forward_all(inp, nos)

    def __call__(self, x, eps):
        z = self.encode(x, eps)
        (logit,) = self.decode(z.reshape(-1, self.z_dim))
        return z, (logit,)
