"""ToyMAFVAE: 2-D VAE with a conditional-MAF posterior flow.

The reference driver selects this model (vae.py:205-212 ``--model toy-maf``)
but its model zoo never shipped it (models/__init__.py lacks ToyMAFVAE —
the CLI crashes), leaving only the torchkit flow plumbing it would have
used (models/layers2.py:412-449 SequentialFlow/ContextWrapper). This is a
WORKING TPU-native realization of the evident intent, with the reference's
constructor surface (input_dim, h_dim, num_hidden_layers, nonlinearity,
z_dim — vae.py:206-212) and the baseline-VAE module contract
(encode_params/decode_params + family/likelihood tags for models/vae/api).

Posterior: q(z|x) is a Gaussian base N(mu(x), sigma(x)) pushed through the
inverse of a stack of conditional MAF blocks (reverse permutation between
blocks), all conditioned on the encoder's hidden features:

    z0 ~ N(mu, sigma);  z = T^{-1}(z0; ctx)
    log q(z|x) = log N(z0; mu, sigma) - sum_blocks sum_i a_i

where each block's density direction is u_i = (z_i - m_i(z_<i, ctx)) *
exp(-a_i(z_<i, ctx)). Sampling inverts block-by-block with the standard
d-pass fixed-point unroll (exact after d passes since pass k finalizes
coordinate k — cheap for toy z_dim). Output heads are zero-initialized, so
at init every block is the identity and the net flow is only the
inter-block coordinate reversal (logdet 0): the model starts as an exact
Gaussian-posterior ToyVAE (up to a coordinate permutation of z).
"""

import jax.numpy as jnp

from ardae_tpu.models.vae.toy import ToyVAE
from ardae_tpu.nn.made import ConditionalMADE


class ToyMAFVAE(ToyVAE):
    """ToyVAE (same encoder/decoder stack, inherited) + posterior flow."""

    n_flows: int = 2
    family: str = "flow_posterior"

    def setup(self):
        super().setup()  # enc_main / enc_reparam / dec_main / dec_reparam
        self.flows = [
            ConditionalMADE(input_dim=self.z_dim, hidden_dim=self.h_dim,
                            nonlinearity=self.nonlinearity, name=f"flow{b}")
            for b in range(self.n_flows)
        ]

    # -- encoder ----------------------------------------------------------
    def encode_ctx(self, x):
        """(mu, logvar, ctx): base-Gaussian params + flow context features."""
        h = self.enc_main(x.reshape(x.shape[0], -1))
        mu, logvar = self.enc_reparam(h)
        return mu, logvar, h

    # encode_params / decode_params are inherited from ToyVAE unchanged.

    # -- flow -------------------------------------------------------------
    def flow_forward(self, z, ctx):
        """Density direction z -> z0. Returns (z0, sum_a) with
        log|det dz0/dz| = -sum_a."""
        u, sum_a = z, jnp.zeros(z.shape[:-1], z.dtype)
        for b, made in enumerate(self.flows):
            if b > 0:
                u = u[..., ::-1]
            m, a = made(u, ctx)
            u = (u - m) * jnp.exp(-a)
            sum_a = sum_a + jnp.sum(a, axis=-1)
        return u, sum_a

    def flow_inverse(self, z0, ctx):
        """Sampling direction z0 -> z. Returns (z, sum_a) with
        log q(z|x) = log N(z0; mu, sigma) - sum_a."""
        u, sum_a = z0, jnp.zeros(z0.shape[:-1], z0.dtype)
        for b in reversed(range(self.n_flows)):
            made = self.flows[b]
            # d-pass fixed point: pass k finalizes coordinate k because
            # (m_i, a_i) depend only on v_{<i}, which pass k-1 finalized.
            v = jnp.zeros_like(u)
            for _ in range(self.z_dim):
                m, a = made(v, ctx)
                v = u * jnp.exp(a) + m
            sum_a = sum_a + jnp.sum(a, axis=-1)
            u = v[..., ::-1] if b > 0 else v
        return u, sum_a

    def __call__(self, x):
        """Deterministic pass (mirrors ToyVAE.__call__; used by init so all
        submodules — including the flow blocks — get parameters)."""
        mu_z, logvar_z, ctx = self.encode_ctx(x)
        z, _ = self.flow_inverse(mu_z, ctx)
        mu_x, logvar_x = self.decode_params(z)
        return (mu_z, logvar_z), (mu_x, logvar_x)
