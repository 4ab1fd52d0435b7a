"""Baseline Gaussian-posterior VAE on 2-D data
(reference models/vae/toy.py:21-244)."""

import flax.linen as nn

from ardae_tpu.nn.heads import NormalHead
from ardae_tpu.nn.initializers import normal_init
from ardae_tpu.nn.mlp import MLP


class ToyVAE(nn.Module):
    input_dim: int = 2
    h_dim: int = 64
    z_dim: int = 2
    nonlinearity: str = "softplus"
    num_hidden_layers: int = 1
    init_mode: str = "gaussian"

    family: str = "gaussian_posterior"
    likelihood: str = "gaussian"
    center_input: bool = False

    def setup(self):
        self.enc_main = MLP(
            hidden_dim=self.h_dim, output_dim=self.h_dim,
            nonlinearity=self.nonlinearity,
            num_hidden_layers=self.num_hidden_layers - 1,
            use_nonlinearity_output=True, name="enc_main",
        )
        self.enc_reparam = NormalHead(self.z_dim, name="enc_reparam")
        self.dec_main = MLP(
            hidden_dim=self.h_dim, output_dim=self.h_dim,
            nonlinearity=self.nonlinearity,
            num_hidden_layers=self.num_hidden_layers - 1,
            use_nonlinearity_output=True, name="dec_main",
        )
        self.dec_reparam = NormalHead(
            self.input_dim,
            mean_kernel_init=normal_init(1.0) if self.init_mode == "gaussian" else None,
            name="dec_reparam",
        )

    def encode_params(self, x):
        h = self.enc_main(x.reshape(x.shape[0], -1))
        return self.enc_reparam(h)  # (mu_z, logvar_z)

    def decode_params(self, z_flat):
        h = self.dec_main(z_flat.reshape(z_flat.shape[0], -1))
        return self.dec_reparam(h)  # (mu_x, logvar_x)

    def __call__(self, x):
        mu_z, logvar_z = self.encode_params(x)
        mu_x, logvar_x = self.decode_params(mu_z)
        return (mu_z, logvar_z), (mu_x, logvar_x)
