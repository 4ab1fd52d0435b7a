"""Hierarchical ("aux") implicit-posterior VAEs.

q(z0|x) is a reparameterized Gaussian, then q(z|x,z0) a second one; both
noise draws are scaled by the external ``noise_scale`` (the reference's
``_std``; see models/ivae/auxmnist.py:32-39,76-116). The prior loss stays
the plain standard-normal energy — the entropy gradient comes from the CDAE.

Uniform aux API (family='aux'):
  sample_z(x, (eps0, eps), noise_scale) -> z (bsz, nz, z_dim)
  hidden_feats(x, (eps0, eps), noise_scale) -> 'hidden1a' context (nz==1)
  decode_params(z_flat)

Variants (reference files):
  ToyAuxIPVAE           models/ivae/auxtoy.py     (MLP towers, Gaussian dec)
  MNISTAuxIPVAE         models/ivae/auxmnist.py   (MLP towers, Bernoulli dec,
                                                   whole model xavier)
  MNISTConvAuxIPVAE     models/ivae/auxconv.py    (two conv towers)
  MNISTResConvAuxIPVAE  models/ivae/auxresconv.py (shared resconv trunk,
                        spm4 logvar clamp); clipped=True reproduces
                        auxresconv2.py (no clamp, z0 std floor +1)

Shape-law note: the toy reference draws eps with a quirky (bsz*nz, nz, zdim)
shape and returns (bsz, nz*nz, zdim) (models/ivae/auxtoy.py:84,102) while
every MNIST variant uses (bsz*nz, 1, zdim) -> (bsz, nz, zdim); we use the
sane MNIST law everywhere (identical when nz==1, the drivers' default).
"""

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp

from ardae_tpu.nn.heads import NormalHead
from ardae_tpu.nn.linear import Linear
from ardae_tpu.nn.mlp import MLP
from ardae_tpu.nn.activations import get_nonlinear_func
from ardae_tpu.nn.initializers import xavier_uniform_init, zeros_init
from ardae_tpu.models.ivae.toy import ToyDecoder
from ardae_tpu.models.ivae.mnist import MNISTDecoder
from ardae_tpu.models.vae.conv import ConvDecoder, ConvEncoderTrunk
from ardae_tpu.models.vae.resconv import ResConvDecoder, ResConvTrunk


def _scaled_sample(mu, logvar, eps, scale, min_std=0.0):
    """mu + (scale*exp(0.5*logvar) + min_std) * eps (reference
    auxresconv2.py sample_gaussian with min_std; plain when min_std=0)."""
    s = 1.0 if scale is None else scale
    return mu + (s * jnp.exp(0.5 * logvar) + min_std) * eps


def _bcast_rows(t, bsz, nz):
    """(bsz, d) -> (bsz*nz, d) repeating each item's row nz times."""
    return jnp.broadcast_to(t[:, None, :], (bsz, nz, t.shape[-1])).reshape(bsz * nz, -1)


class _AuxBase(nn.Module):
    """Shared plumbing; subclasses define towers + decoder in setup and the
    three *_params methods."""

    def trunk_feats(self, x):
        return x  # default: towers see (rescaled) raw input

    def aux_params(self, feats):
        raise NotImplementedError

    def main_params(self, feats_rows, z0):
        raise NotImplementedError

    def _sample_all(self, x, eps, noise_scale):
        eps0, eps1 = eps
        bsz = x.shape[0]
        nz = eps0.shape[0] // bsz
        feats = self.trunk_feats(x)
        mu0, lv0, h0 = self.aux_params(feats)
        mu0r = _bcast_rows(mu0, bsz, nz)
        lv0r = _bcast_rows(lv0, bsz, nz)
        z0 = _scaled_sample(mu0r, lv0r, eps0, noise_scale,
                            min_std=getattr(self, "z0_min_std", 0.0))
        feats_rows = _bcast_rows(feats.reshape(bsz, -1), bsz, nz) \
            if feats.ndim == 2 else feats
        mu, lv, h = self.main_params(feats_rows, z0)
        z = _scaled_sample(mu, lv, eps1, noise_scale)
        return z.reshape(bsz, nz, -1), (z0, mu0, lv0, mu, lv, h0, h)

    def sample_z(self, x, eps, noise_scale=None):
        z, _ = self._sample_all(x, eps, noise_scale)
        return z

    def hidden_feats(self, x, eps, noise_scale=None):
        """'hidden1a' context (reference forward_hidden; nz must be 1)."""
        _, (_, _, _, _, _, h0, h) = self._sample_all(x, eps, noise_scale)
        if self.hidden_mode == "cat":
            return jnp.concatenate([h0, h], axis=1)
        return h


class ToyAuxIPVAE(_AuxBase):
    """auxmlp (reference models/ivae/auxtoy.py:46-430)."""

    input_dim: int = 2
    noise_dim: int = 2
    h_dim: int = 64
    z_dim: int = 2
    nonlinearity: str = "tanh"
    num_hidden_layers: int = 1
    init_mode: str = "gaussian"
    clip_z0_logvar: Optional[str] = None
    clip_z_logvar: Optional[str] = None

    family: str = "aux"
    likelihood: str = "gaussian"
    center_input: bool = False
    hidden_mode: str = "cat"

    def setup(self):
        nhl = self.num_hidden_layers
        self.aux_main = MLP(hidden_dim=self.h_dim, output_dim=self.h_dim,
                            nonlinearity=self.nonlinearity,
                            num_hidden_layers=nhl - 1,
                            use_nonlinearity_output=True, name="aux_main")
        self.aux_reparam = NormalHead(self.noise_dim, clip=self.clip_z0_logvar,
                                      name="aux_reparam")
        self.enc_fc = MLP(hidden_dim=self.h_dim, output_dim=self.h_dim,
                          nonlinearity=self.nonlinearity,
                          num_hidden_layers=nhl - 1,
                          use_nonlinearity_output=True, name="enc_fc")
        self.enc_reparam = NormalHead(self.z_dim, clip=self.clip_z_logvar,
                                      name="enc_reparam")
        self.decode = ToyDecoder(input_dim=self.input_dim, h_dim=self.h_dim,
                                 nonlinearity=self.nonlinearity,
                                 num_hidden_layers=nhl,
                                 init_mode=self.init_mode, name="decode")

    def aux_params(self, x):
        h = self.aux_main(x.reshape(x.shape[0], -1))
        mu, lv = self.aux_reparam(h)
        return mu, lv, h

    def main_params(self, x_rows, z0):
        h = self.enc_fc(jnp.concatenate([x_rows, z0], axis=1))
        mu, lv = self.enc_reparam(h)
        return mu, lv, h

    def decode_params(self, z_flat):
        return self.decode(z_flat)

    def __call__(self, x, eps, noise_scale=None):
        z = self.sample_z(x, eps, noise_scale)
        return z, self.decode(z.reshape(-1, self.z_dim))


class MNISTAuxIPVAE(_AuxBase):
    """auxmnist (reference models/ivae/auxmnist.py:47-428); xavier init on
    every Linear (do_xavier=True default, :172-176)."""

    input_dim: int = 784
    noise_dim: int = 100
    h_dim: int = 300
    z_dim: int = 32
    nonlinearity: str = "softplus"
    num_hidden_layers: int = 2
    clip_z0_logvar: Optional[str] = None
    clip_z_logvar: Optional[str] = None
    do_xavier: bool = True

    family: str = "aux"
    likelihood: str = "bernoulli"
    center_input: bool = True
    hidden_mode: str = "cat"

    def setup(self):
        nhl = self.num_hidden_layers
        xav = self.do_xavier
        self.aux_main = MLP(hidden_dim=self.h_dim, output_dim=self.h_dim,
                            nonlinearity=self.nonlinearity,
                            num_hidden_layers=nhl - 1,
                            use_nonlinearity_output=True, xavier=xav,
                            name="aux_main")
        self.aux_reparam = NormalHead(self.noise_dim, clip=self.clip_z0_logvar,
                                      xavier=xav, name="aux_reparam")
        self.enc_fc = MLP(hidden_dim=self.h_dim, output_dim=self.h_dim,
                          nonlinearity=self.nonlinearity,
                          num_hidden_layers=nhl - 1,
                          use_nonlinearity_output=True, xavier=xav,
                          name="enc_fc")
        self.enc_reparam = NormalHead(self.z_dim, clip=self.clip_z_logvar,
                                      xavier=xav, name="enc_reparam")
        # decoder = models/vae/mnist.Decoder: main MLP has nhl-1 hidden layers
        self.decode = MNISTDecoder(input_dim=self.input_dim, h_dim=self.h_dim,
                                   nonlinearity=self.nonlinearity,
                                   num_hidden_layers=nhl - 1, name="decode")

    def trunk_feats(self, x):
        return 2.0 * x.reshape(x.shape[0], -1) - 1.0

    def aux_params(self, feats):
        h = self.aux_main(feats)
        mu, lv = self.aux_reparam(h)
        return mu, lv, h

    def main_params(self, feats_rows, z0):
        h = self.enc_fc(jnp.concatenate([feats_rows, z0], axis=1))
        mu, lv = self.enc_reparam(h)
        return mu, lv, h

    def decode_params(self, z_flat):
        return self.decode(z_flat)

    def __call__(self, x, eps, noise_scale=None):
        z = self.sample_z(x, eps, noise_scale)
        return z, self.decode(z.reshape(-1, self.z_dim))


class MNISTConvAuxIPVAE(_AuxBase):
    """auxconv (reference models/ivae/auxconv.py:50-423): two independent
    conv towers; hidden1a context = cat(h0, h) of the 800-d fc features."""

    input_height: int = 28
    input_channels: int = 1
    z0_dim: int = 100
    z_dim: int = 32
    nonlinearity: str = "softplus"
    do_xavier: bool = True

    family: str = "aux"
    likelihood: str = "bernoulli"
    center_input: bool = True
    hidden_mode: str = "cat"

    @property
    def noise_dim(self):  # aux API: z0 plays the noise role
        return self.z0_dim

    def setup(self):
        xav = self.do_xavier
        self.aux_trunk = ConvEncoderTrunk(self.input_height, self.input_channels,
                                          self.nonlinearity, xavier=xav,
                                          name="aux_trunk")
        self.aux_fc = Linear(800, **(dict(kernel_init=xavier_uniform_init,
                                          bias_init=zeros_init) if xav else {}),
                             name="aux_fc")
        self.aux_reparam = NormalHead(self.z0_dim, xavier=xav, name="aux_reparam")
        self.enc_trunk = ConvEncoderTrunk(self.input_height, self.input_channels,
                                          self.nonlinearity, xavier=xav,
                                          name="enc_trunk")
        self.enc_fc = Linear(800, **(dict(kernel_init=xavier_uniform_init,
                                          bias_init=zeros_init) if xav else {}),
                             name="enc_fc")
        self.enc_reparam = NormalHead(self.z_dim, xavier=xav, name="enc_reparam")
        self.decode = ConvDecoder(self.input_height, self.input_channels,
                                  self.nonlinearity, xavier=xav, name="decode")

    def _sample_all(self, x, eps, noise_scale):
        # override: the two towers each run their own trunk on x
        eps0, eps1 = eps
        afun = get_nonlinear_func(self.nonlinearity)
        bsz = x.shape[0]
        nz = eps0.shape[0] // bsz
        h0 = afun(self.aux_fc(self.aux_trunk(x)))  # (bsz, 800)
        mu0, lv0 = self.aux_reparam(h0)
        z0 = _scaled_sample(_bcast_rows(mu0, bsz, nz), _bcast_rows(lv0, bsz, nz),
                            eps0, noise_scale)
        trunk = self.enc_trunk(x)
        h = afun(self.enc_fc(jnp.concatenate(
            [_bcast_rows(trunk, bsz, nz), z0], axis=1)))  # (bsz*nz, 800)
        mu, lv = self.enc_reparam(h)
        z = _scaled_sample(mu, lv, eps1, noise_scale)
        return z.reshape(bsz, nz, -1), (z0, mu0, lv0, mu, lv, h0, h)

    def decode_params(self, z_flat):
        return self.decode(z_flat)

    def __call__(self, x, eps, noise_scale=None):
        z = self.sample_z(x, eps, noise_scale)
        return z, self.decode(z.reshape(-1, self.z_dim))


class MNISTResConvAuxIPVAE(_AuxBase):
    """auxresconv(ct) (reference models/ivae/auxresconv.py:48-411) and the
    -clip variant (auxresconv2.py: no spm4 clamp, z0 std floor +1).

    One SHARED resconv trunk feeds both heads; hidden1a context = the main
    head's c_dim feature h (reference :126-132)."""

    input_height: int = 28
    input_channels: int = 1
    z0_dim: int = 100
    z_dim: int = 32
    c_dim: int = 450
    nonlinearity: str = "elu"
    do_center: bool = False
    clipped: bool = False  # True -> auxresconv2 semantics

    family: str = "aux"
    likelihood: str = "bernoulli"
    center_input: bool = True
    hidden_mode: str = "h"

    @property
    def noise_dim(self):
        return self.z0_dim

    @property
    def z0_min_std(self):
        return 1.0 if self.clipped else 0.0

    def setup(self):
        clip = None if self.clipped else "spm4"
        self.trunk = ResConvTrunk(self.c_dim, self.nonlinearity, self.do_center,
                                  name="trunk")
        self.aux_reparam = NormalHead(self.z0_dim, clip=clip, name="aux_reparam")
        self.enc_fc = Linear(self.c_dim, name="enc_fc")
        self.enc_reparam = NormalHead(self.z_dim, clip=clip, name="enc_reparam")
        self.decode = ResConvDecoder(self.c_dim, self.nonlinearity, name="decode")

    def trunk_feats(self, x):
        return self.trunk(x)

    def aux_params(self, ctx):
        mu, lv = self.aux_reparam(ctx)
        return mu, lv, ctx

    def main_params(self, ctx_rows, z0):
        afun = get_nonlinear_func(self.nonlinearity)
        h = afun(self.enc_fc(jnp.concatenate([ctx_rows, z0], axis=1)))
        mu, lv = self.enc_reparam(h)
        return mu, lv, h

    def decode_params(self, z_flat):
        return self.decode(z_flat)

    def __call__(self, x, eps, noise_scale=None):
        z = self.sample_z(x, eps, noise_scale)
        return z, self.decode(z.reshape(-1, self.z_dim))


def MNISTResConvAuxIPVAEClipped(**kw):
    """auxresconv-clip / auxresconvct-clip (reference models/ivae/auxresconv2.py)."""
    return MNISTResConvAuxIPVAE(clipped=True, **kw)
