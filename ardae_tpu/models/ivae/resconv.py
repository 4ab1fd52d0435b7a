"""Residual-conv implicit-posterior VAE (reference models/ivae/resconv.py).

resconv trunk -> c_dim context, fused with noise through one of five fc
heads: mlp | res-wn-mlp | res-mlp | res-wn-mlp-lin | res-mlp-lin
(reference :529-546; the ResMLPs here are models/layers.py style, i.e.
WN-linear with norm=False — unlike the trunk's torchkit blocks).
Decoder = the resconv VAE decoder (reference :446 imports it).
"""

import flax.linen as nn
import jax.numpy as jnp

from ardae_tpu.nn.linear import Linear
from ardae_tpu.nn.mlp import MLP, ResMLP
from ardae_tpu.models.vae.resconv import ResConvDecoder, ResConvTrunk

FC_TYPES = ("mlp", "res-wn-mlp", "res-mlp", "res-wn-mlp-lin", "res-mlp-lin")


class ResConvIPVAE(nn.Module):
    input_height: int = 28
    input_channels: int = 1
    z_dim: int = 32
    noise_dim: int = 100
    c_dim: int = 512
    h_dim: int = 800
    num_hidden_layers: int = 1
    nonlinearity: str = "elu"
    do_center: bool = False
    do_m5bias: bool = False
    enc_type: str = "mlp"

    family: str = "flat"
    likelihood: str = "bernoulli"
    center_input: bool = True

    def setup(self):
        assert self.input_height == 28 and self.input_channels == 1
        assert self.enc_type in FC_TYPES
        assert self.num_hidden_layers > 0
        self.trunk = ResConvTrunk(self.c_dim, self.nonlinearity, self.do_center,
                                  name="trunk")
        common = dict(
            hidden_dim=self.h_dim,
            nonlinearity=self.nonlinearity,
        )
        if self.enc_type == "mlp":
            self.fc = MLP(**common, output_dim=self.z_dim,
                          num_hidden_layers=self.num_hidden_layers, name="fc")
        elif self.enc_type == "res-wn-mlp":
            self.fc = ResMLP(**common, output_dim=self.z_dim,
                             num_hidden_layers=self.num_hidden_layers,
                             layer="wnlinear", name="fc")
        elif self.enc_type == "res-mlp":
            self.fc = ResMLP(**common, output_dim=self.z_dim,
                             num_hidden_layers=self.num_hidden_layers,
                             layer="linear", name="fc")
        elif self.enc_type == "res-wn-mlp-lin":
            self.fc_res = ResMLP(**common, output_dim=self.h_dim,
                                 num_hidden_layers=self.num_hidden_layers - 1,
                                 use_nonlinearity_output=True,
                                 layer="wnlinear", name="fc_res")
            self.fc_lin = Linear(self.z_dim, name="fc_lin")
        elif self.enc_type == "res-mlp-lin":
            self.fc_res = ResMLP(**common, output_dim=self.h_dim,
                                 num_hidden_layers=self.num_hidden_layers - 1,
                                 use_nonlinearity_output=True,
                                 layer="linear", name="fc_res")
            self.fc_lin = Linear(self.z_dim, name="fc_lin")
        self.decode = ResConvDecoder(self.c_dim, self.nonlinearity,
                                     self.do_m5bias, name="decode")

    def encode_inp(self, x):
        return self.trunk(x)

    def encode_all(self, inp, nos):
        return self.encode_cat(jnp.concatenate([inp, nos], axis=1))

    def encode_cat(self, h):
        """fc over already-concatenated [trunk-ctx, noise] rows."""
        if self.enc_type.endswith("-lin"):
            return self.fc_lin(self.fc_res(h))
        return self.fc(h)

    def sample_z(self, x, eps):
        bsz = x.shape[0]
        nz = eps.shape[0] // bsz
        inp = self.encode_inp(x)
        # concat in 3-D so the per-item->per-sample broadcast fuses into the
        # concat fill and the flatten is a bitcast (broadcast_to().reshape()
        # materializes an extra (bsz*nz, c) copy — profiler)
        h = jnp.concatenate(
            [jnp.broadcast_to(inp[:, None, :], (bsz, nz, inp.shape[-1])),
             eps.reshape(bsz, nz, -1)], axis=-1
        ).reshape(bsz * nz, -1)
        z = self.encode_cat(h)
        return z.reshape(bsz, nz, self.z_dim)

    def decode_params(self, z_flat):
        return self.decode(z_flat)

    def __call__(self, x, eps):
        z = self.sample_z(x, eps)
        (logit,) = self.decode(z.reshape(-1, self.z_dim))
        return z, (logit,)
