"""Toy (2-D) implicit-posterior VAE with the 12 encoder fusion variants.

TPU-first re-design of /root/reference/models/ivae/toy.py:30-1024. The
posterior is a noise-fed sampler network z = f(x, eps); its density is never
evaluated (the entropy gradient comes from the CDAE). Shape law (SURVEY.md
2.4): input features are computed ONCE per item and broadcast across the
sample axis nz; eps has shape (bsz*nz, noise_dim); z is (bsz, nz, z_dim).

Noise is always an explicit input (never drawn inside the module), so the
module is deterministic and jit/vmap/grad compose trivially.
"""

import flax.linen as nn
import jax.numpy as jnp

from ardae_tpu.nn.heads import NormalHead
from ardae_tpu.nn.initializers import normal_init
from ardae_tpu.nn.mlp import (
    MLP,
    WNMLP,
    ContextBilinearMLP,
    ContextConcatMLP,
    ContextResMLP,
    ContextScaleMLP,
    ContextSPScaleMLP,
    ContextSPWNScaleMLP,
    ContextSWNBilinearMLP,
    ContextWNBilinearMLP,
    ContextWNScaleMLP,
)

ENC_TYPES = (
    "simple",
    "weightnorm",
    "concat",
    "scale-inpnos",
    "weightnorm-scale-inpnos",
    "softplus-scale-inpnos",
    "softplus-weightnorm-scale-inpnos",
    "scale-nosinp",
    "softplus-weightnorm-scale-nosinp",
    "bilinear",
    "weightnorm-bilinear",
    "stacked-weightnorm-bilinear",
    "res",
)


class ToyEncoder(nn.Module):
    """Implicit encoder: z = fuse(inp_encode(x), eps).

    Covers all fusion variants of reference models/ivae/toy.py:111-692.
    """

    noise_dim: int = 2
    h_dim: int = 64
    z_dim: int = 2
    nonlinearity: str = "tanh"
    num_hidden_layers: int = 1
    enc_type: str = "concat"
    init_mode: str = "gaussian"

    def setup(self):
        gauss = self.init_mode == "gaussian"
        mlp_cls = WNMLP if self.enc_type == "weightnorm" else MLP
        inp_kwargs = dict(
            hidden_dim=self.h_dim,
            output_dim=self.h_dim,
            nonlinearity=self.nonlinearity,
            num_hidden_layers=self.num_hidden_layers - 1,
            use_nonlinearity_output=True,
        )
        self.inp_encode = mlp_cls(**inp_kwargs, name="inp_encode")

        fc_kwargs = dict(
            hidden_dim=self.h_dim,
            output_dim=self.z_dim,
            nonlinearity=self.nonlinearity,
            num_hidden_layers=self.num_hidden_layers,
            use_nonlinearity_output=False,
        )
        et = self.enc_type
        if et == "simple":
            self.fc = MLP(**fc_kwargs, gaussian_out_init=gauss, name="fc")
        elif et == "weightnorm":
            # reference WeightNormalizedEncoder.reset_parameters references a
            # nonexistent self.fc2 (models/ivae/toy.py:686-687) and would
            # crash under init='gaussian'; we use the default WN init instead.
            self.fc = WNMLP(**fc_kwargs, name="fc")
        elif et == "concat":
            self.fc = ContextConcatMLP(**fc_kwargs, gaussian_out_init=gauss, name="fc")
        elif et in ("scale-inpnos", "scale-nosinp"):
            self.fc = ContextScaleMLP(**fc_kwargs, gaussian_out_init=gauss, name="fc")
        elif et == "weightnorm-scale-inpnos":
            self.fc = ContextWNScaleMLP(**fc_kwargs, gaussian_out_init=gauss, name="fc")
        elif et == "softplus-scale-inpnos":
            self.fc = ContextSPScaleMLP(**fc_kwargs, gaussian_out_init=gauss, name="fc")
        elif et in ("softplus-weightnorm-scale-inpnos", "softplus-weightnorm-scale-nosinp"):
            self.fc = ContextSPWNScaleMLP(**fc_kwargs, gaussian_out_init=gauss, name="fc")
        elif et == "bilinear":
            self.fc = ContextBilinearMLP(**fc_kwargs, gaussian_out_init=gauss, name="fc")
        elif et == "weightnorm-bilinear":
            self.fc = ContextWNBilinearMLP(**fc_kwargs, gaussian_out_init=gauss, name="fc")
        elif et == "stacked-weightnorm-bilinear":
            self.fc = ContextSWNBilinearMLP(
                hidden_dim=self.h_dim,
                output_dim=self.z_dim,
                nonlinearity=self.nonlinearity,
                num_hidden_layers=self.num_hidden_layers - 1,
                gaussian_out_init=gauss,
                name="fc",
            )
        elif et == "res":
            self.fc = ContextResMLP(**fc_kwargs, name="fc")
        else:
            raise NotImplementedError(et)

    def forward_inp(self, x):
        """Per-item input trunk (reference toy.py:67-74)."""
        return self.inp_encode(x.reshape(x.shape[0], -1))

    def forward_all(self, inp, nos):
        """Fuse flattened input features with (already scaled) noise rows."""
        et = self.enc_type
        if et in ("simple", "weightnorm"):
            return self.fc(jnp.concatenate([inp, nos], axis=1))
        if et in ("scale-nosinp", "softplus-weightnorm-scale-nosinp", "res"):
            # noise is the input path, features are the context
            return self.fc(nos, inp)
        return self.fc(inp, nos)

    def __call__(self, x, eps):
        """x: (bsz, input_dim); eps: (bsz*nz, noise_dim) -> z: (bsz, nz, z_dim)."""
        bsz = x.shape[0]
        nz = eps.shape[0] // bsz
        inp = self.forward_inp(x)
        inp = jnp.broadcast_to(inp[:, None, :], (bsz, nz, inp.shape[-1]))
        z = self.forward_all(inp.reshape(bsz * nz, -1), eps)
        return z.reshape(bsz, nz, self.z_dim)


class ToyDecoder(nn.Module):
    """Gaussian decoder (reference models/ivae/toy.py:694-737)."""

    input_dim: int = 2
    h_dim: int = 64
    nonlinearity: str = "tanh"
    num_hidden_layers: int = 1
    init_mode: str = "gaussian"

    def setup(self):
        self.main = MLP(
            hidden_dim=self.h_dim,
            output_dim=self.h_dim,
            nonlinearity=self.nonlinearity,
            num_hidden_layers=self.num_hidden_layers - 1,
            use_nonlinearity_output=True,
            name="main",
        )
        self.reparam = NormalHead(
            self.input_dim,
            mean_kernel_init=normal_init(1.0) if self.init_mode == "gaussian" else None,
            name="reparam",
        )

    def __call__(self, z):
        h = self.main(z.reshape(z.shape[0], -1))
        return self.reparam(h)  # (mu, logvar)


class ToyIPVAE(nn.Module):
    """mlp-* implicit VAE on 2-D data (reference models/ivae/toy.py:739-1024).

    family/likelihood fields drive the shared functional API in
    ardae_tpu.models.ivae.api.
    """

    input_dim: int = 2
    noise_dim: int = 2
    h_dim: int = 64
    z_dim: int = 2
    nonlinearity: str = "tanh"
    num_hidden_layers: int = 1
    init_mode: str = "gaussian"
    enc_type: str = "concat"

    family: str = "flat"  # flat (single implicit head) | aux (hierarchical)
    likelihood: str = "gaussian"
    center_input: bool = False

    def setup(self):
        assert self.enc_type in ENC_TYPES
        self.encode = ToyEncoder(
            noise_dim=self.noise_dim,
            h_dim=self.h_dim,
            z_dim=self.z_dim,
            nonlinearity=self.nonlinearity,
            num_hidden_layers=self.num_hidden_layers,
            enc_type=self.enc_type,
            init_mode=self.init_mode,
            name="encode",
        )
        self.decode = ToyDecoder(
            input_dim=self.input_dim,
            h_dim=self.h_dim,
            nonlinearity=self.nonlinearity,
            num_hidden_layers=self.num_hidden_layers,
            init_mode=self.init_mode,
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
        mu, logvar = self.decode(z.reshape(-1, self.z_dim))
        return z, (mu, logvar)
