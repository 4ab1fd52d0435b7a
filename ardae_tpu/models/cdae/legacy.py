"""Legacy reconstruction-style DAEs (reference models/dae/mlp.py:21-193).

score = (recon(x) - x) / sigma^2; loss = mse(recon(x_bar), x). Registered in
the reference model zoo but unused by the drivers; provided for parity.
"""

import flax.linen as nn
import jax
import jax.numpy as jnp

from ardae_tpu.nn.mlp import MLP


class MLPDAE(nn.Module):
    """Plain reconstructing DAE (reference models/dae/mlp.py:21-82)."""

    input_dim: int
    h_dim: int = 1000
    num_hidden_layers: int = 1
    nonlinearity: str = "tanh"

    def setup(self):
        self.main = MLP(
            hidden_dim=self.h_dim,
            output_dim=self.input_dim,
            nonlinearity=self.nonlinearity,
            num_hidden_layers=self.num_hidden_layers,
            name="main",
        )

    def __call__(self, x):
        return self.main(x)


class MLPCDAE(nn.Module):
    """Conditional reconstructing DAE (reference models/dae/mlp.py:85-193)."""

    input_dim: int
    context_dim: int
    h_dim: int = 128
    num_hidden_layers: int = 1
    nonlinearity: str = "tanh"
    enc_input: bool = False
    enc_ctx: bool = True

    def setup(self):
        if self.enc_ctx:
            self.ctx_encode = MLP(
                hidden_dim=self.h_dim,
                output_dim=self.h_dim,
                nonlinearity=self.nonlinearity,
                num_hidden_layers=self.num_hidden_layers - 1,
                use_nonlinearity_output=True,
                name="ctx_encode",
            )
        if self.enc_input:
            self.inp_encode = MLP(
                hidden_dim=self.h_dim,
                output_dim=self.h_dim,
                nonlinearity=self.nonlinearity,
                num_hidden_layers=self.num_hidden_layers - 1,
                use_nonlinearity_output=True,
                name="inp_encode",
            )
        self.dae = MLP(
            hidden_dim=self.h_dim,
            output_dim=self.input_dim,
            nonlinearity=self.nonlinearity,
            num_hidden_layers=self.num_hidden_layers,
            name="dae",
        )

    def __call__(self, x, ctx):
        inp = self.inp_encode(x) if self.enc_input else x
        c = self.ctx_encode(ctx) if self.enc_ctx else ctx
        return self.dae(jnp.concatenate([inp, c], axis=-1))


def legacy_dae_loss(module, params, key, x, std, ctx=None):
    """mse(recon(x + std*eps), x)."""
    eps = jax.random.normal(key, x.shape, x.dtype)
    x_bar = x + std * eps
    recon = module.apply(params, x_bar) if ctx is None else module.apply(params, x_bar, ctx)
    return jnp.mean((recon - x) ** 2)


def legacy_dae_score(module, params, x, std, ctx=None):
    """(recon(x) - x) / std^2 (reference models/dae/mlp.py:72-82)."""
    recon = module.apply(params, x) if ctx is None else module.apply(params, x, ctx)
    return (recon - x) / (std**2)
