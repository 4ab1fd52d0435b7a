"""Hierarchical-aux baseline VAEs (Gaussian q(z0|x) -> q(z|x,z0), plus an
auxiliary decoder r(z0|x,z)).

ELBO (reference models/vae/auxmnist.py:313-335):
    loss = recon + beta * KL(q(z)||N(0,I)) + beta * KL(q(z0|x)||r(z0|x,z))
logprob = hierarchical IWAE with exact densities
(reference models/vae/auxmnist.py:381-451), vmapped: one ssz-wide pass.

Variants: ToyAuxVAE (models/vae/auxtoy.py), MNISTAuxVAE (auxmnist.py),
MNISTConvAuxVAE (auxconv.py), MNISTResConvAuxVAE (auxresconv.py).

Uniform API (family='aux_gaussian_posterior'):
  trunk_feats(x)                  shared carrier (raw/rescaled x, or resconv ctx)
  aux_params(feats)            -> (mu0, lv0)
  main_params(feats_rows, z0)  -> (mu, lv)
  auxdec_params(feats_rows, z) -> (mu_p0, lv_p0)
  decode_params(z_flat)        -> dist params
"""

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ardae_tpu.core.losses import (
    iwae_bound,
    loss_kld_gaussian,
    loss_kld_gaussian_vs_gaussian,
    loss_recon_bernoulli_with_logit,
    loss_recon_gaussian,
    reduce_batch,
)
from ardae_tpu.core.rng import sample_gaussian
from ardae_tpu.core.stats import logprob_gaussian
from ardae_tpu.nn.activations import get_nonlinear_func
from ardae_tpu.nn.heads import NormalHead
from ardae_tpu.nn.initializers import xavier_uniform_init, zeros_init
from ardae_tpu.nn.linear import Linear
from ardae_tpu.nn.mlp import MLP
from ardae_tpu.models.ivae.mnist import MNISTDecoder
from ardae_tpu.models.ivae.toy import ToyDecoder
from ardae_tpu.models.vae.conv import ConvDecoder, ConvEncoderTrunk
from ardae_tpu.models.vae.resconv import ResConvDecoder, ResConvTrunk


def _bcast_rows(t, bsz, nz):
    return jnp.broadcast_to(t[:, None, :], (bsz, nz, t.shape[-1])).reshape(bsz * nz, -1)


class _MLPAuxVAE(nn.Module):
    """Shared MLP-tower implementation for toy/mnist aux baselines."""

    input_dim: int = 784
    noise_dim: int = 100
    h_dim: int = 300
    z_dim: int = 32
    nonlinearity: str = "softplus"
    num_hidden_layers: int = 2
    clip_logvar: Optional[str] = None
    do_xavier: bool = False
    rescale_input: bool = True

    family: str = "aux_gaussian_posterior"
    likelihood: str = "bernoulli"
    center_input: bool = True

    def setup(self):
        nhl = self.num_hidden_layers
        xav = self.do_xavier
        clip = None if self.clip_logvar == "none" else self.clip_logvar
        self.aux_main = MLP(hidden_dim=self.h_dim, output_dim=self.h_dim,
                            nonlinearity=self.nonlinearity,
                            num_hidden_layers=nhl - 1,
                            use_nonlinearity_output=True, xavier=xav,
                            name="aux_main")
        self.aux_reparam = NormalHead(self.noise_dim, clip=clip, xavier=xav,
                                      name="aux_reparam")
        self.enc_fc = MLP(hidden_dim=self.h_dim, output_dim=self.h_dim,
                          nonlinearity=self.nonlinearity,
                          num_hidden_layers=nhl - 1,
                          use_nonlinearity_output=True, xavier=xav,
                          name="enc_fc")
        self.enc_reparam = NormalHead(self.z_dim, xavier=xav, name="enc_reparam")
        self.auxdec_fc = MLP(hidden_dim=self.h_dim, output_dim=self.h_dim,
                             nonlinearity=self.nonlinearity,
                             num_hidden_layers=nhl - 1,
                             use_nonlinearity_output=True, xavier=xav,
                             name="auxdec_fc")
        self.auxdec_reparam = NormalHead(self.noise_dim, xavier=xav,
                                         name="auxdec_reparam")
        self._make_decoder()

    def _make_decoder(self):
        self.decode = MNISTDecoder(input_dim=self.input_dim, h_dim=self.h_dim,
                                   nonlinearity=self.nonlinearity,
                                   num_hidden_layers=self.num_hidden_layers - 1,
                                   name="decode")

    def trunk_feats(self, x):
        x = x.reshape(x.shape[0], -1)
        return 2.0 * x - 1.0 if self.rescale_input else x

    def aux_params(self, feats):
        h = self.aux_main(feats)
        return self.aux_reparam(h)

    def main_params(self, feats, z0, nz=1):
        rows = _bcast_rows(feats, feats.shape[0], nz)
        h = self.enc_fc(jnp.concatenate([rows, z0], axis=1))
        return self.enc_reparam(h)

    def auxdec_params(self, feats, z, nz=1):
        rows = _bcast_rows(feats, feats.shape[0], nz)
        h = self.auxdec_fc(jnp.concatenate([rows, z], axis=1))
        return self.auxdec_reparam(h)

    def decode_params(self, z_flat):
        return self.decode(z_flat)

    def __call__(self, x):
        feats = self.trunk_feats(x)
        mu0, lv0 = self.aux_params(feats)
        mu, lv = self.main_params(feats, mu0)
        mup0, lvp0 = self.auxdec_params(feats, mu)
        return (mu0, lv0), (mu, lv), (mup0, lvp0), self.decode_params(mu)


class MNISTAuxVAE(_MLPAuxVAE):
    """auxmnist baseline (reference models/vae/auxmnist.py:268-451).

    NOTE: the vae.py driver passes do_xavier=False (vae.py:263-275)."""


class ToyAuxVAE(_MLPAuxVAE):
    """auxtoy baseline (reference models/vae/auxtoy.py): no input rescale,
    Gaussian decoder."""

    likelihood: str = "gaussian"
    center_input: bool = False
    rescale_input: bool = False
    init_mode: str = "gaussian"

    def _make_decoder(self):
        self.decode = ToyDecoder(input_dim=self.input_dim, h_dim=self.h_dim,
                                 nonlinearity=self.nonlinearity,
                                 num_hidden_layers=self.num_hidden_layers,
                                 init_mode=self.init_mode, name="decode")


class MNISTConvAuxVAE(nn.Module):
    """auxconv baseline (reference models/vae/auxconv.py:33-369): three conv
    trunks (aux enc, main enc, aux dec), all xavier by default."""

    input_height: int = 28
    input_channels: int = 1
    z0_dim: int = 100
    z_dim: int = 32
    nonlinearity: str = "softplus"
    do_xavier: bool = True
    do_m5bias: bool = False

    family: str = "aux_gaussian_posterior"
    likelihood: str = "bernoulli"
    center_input: bool = True

    @property
    def noise_dim(self):
        return self.z0_dim

    def setup(self):
        xav = self.do_xavier
        lin = dict(kernel_init=xavier_uniform_init, bias_init=zeros_init) if xav else {}
        self.aux_trunk = ConvEncoderTrunk(self.input_height, self.input_channels,
                                          self.nonlinearity, xavier=xav,
                                          name="aux_trunk")
        self.aux_fc = Linear(800, **lin, name="aux_fc")
        self.aux_reparam = NormalHead(self.z0_dim, xavier=xav, name="aux_reparam")
        self.enc_trunk = ConvEncoderTrunk(self.input_height, self.input_channels,
                                          self.nonlinearity, xavier=xav,
                                          name="enc_trunk")
        self.enc_fc = Linear(800, **lin, name="enc_fc")
        self.enc_reparam = NormalHead(self.z_dim, xavier=xav, name="enc_reparam")
        self.auxdec_trunk = ConvEncoderTrunk(self.input_height, self.input_channels,
                                             self.nonlinearity, xavier=xav,
                                             name="auxdec_trunk")
        self.auxdec_fc = Linear(800, **lin, name="auxdec_fc")
        self.auxdec_reparam = NormalHead(self.z0_dim, xavier=xav,
                                         name="auxdec_reparam")
        self.decode = ConvDecoder(self.input_height, self.input_channels,
                                  self.nonlinearity, xavier=xav,
                                  m5bias=self.do_m5bias, name="decode")

    # feats carrier: the raw image; each tower re-runs its own conv trunk.
    def trunk_feats(self, x):
        return x.reshape(x.shape[0], -1)

    def aux_params(self, feats):
        afun = get_nonlinear_func(self.nonlinearity)
        h = afun(self.aux_fc(self.aux_trunk(feats)))
        return self.aux_reparam(h)

    def main_params(self, feats, z0, nz=1):
        afun = get_nonlinear_func(self.nonlinearity)
        trunk = _bcast_rows(self.enc_trunk(feats), feats.shape[0], nz)
        h = afun(self.enc_fc(jnp.concatenate([trunk, z0], axis=1)))
        return self.enc_reparam(h)

    def auxdec_params(self, feats, z, nz=1):
        afun = get_nonlinear_func(self.nonlinearity)
        trunk = _bcast_rows(self.auxdec_trunk(feats), feats.shape[0], nz)
        h = afun(self.auxdec_fc(jnp.concatenate([trunk, z], axis=1)))
        return self.auxdec_reparam(h)

    def decode_params(self, z_flat):
        return self.decode(z_flat)

    def __call__(self, x):
        feats = self.trunk_feats(x)
        mu0, lv0 = self.aux_params(feats)
        mu, lv = self.main_params(feats, mu0)
        mup0, lvp0 = self.auxdec_params(feats, mu)
        return (mu0, lv0), (mu, lv), (mup0, lvp0), self.decode_params(mu)


class MNISTResConvAuxVAE(nn.Module):
    """auxresconv(ct) baseline (reference models/vae/auxresconv.py:26-461):
    one SHARED resconv trunk; aux/main/auxdec heads are linear over ctx."""

    input_height: int = 28
    input_channels: int = 1
    z0_dim: int = 100
    z_dim: int = 32
    c_dim: int = 450
    nonlinearity: str = "elu"
    do_center: bool = False
    clip_logvar: Optional[str] = "spm4"

    family: str = "aux_gaussian_posterior"
    likelihood: str = "bernoulli"
    center_input: bool = True

    @property
    def noise_dim(self):
        return self.z0_dim

    def setup(self):
        clip = None if self.clip_logvar == "none" else self.clip_logvar
        self.trunk = ResConvTrunk(self.c_dim, self.nonlinearity, self.do_center,
                                  name="trunk")
        self.aux_reparam = NormalHead(self.z0_dim, clip=clip, name="aux_reparam")
        self.enc_fc = Linear(self.c_dim, name="enc_fc")
        self.enc_reparam = NormalHead(self.z_dim, clip=clip, name="enc_reparam")
        self.auxdec_fc = Linear(self.c_dim, name="auxdec_fc")
        self.auxdec_reparam = NormalHead(self.z0_dim, name="auxdec_reparam")
        self.decode = ResConvDecoder(self.c_dim, self.nonlinearity, name="decode")

    def trunk_feats(self, x):
        return self.trunk(x)

    def aux_params(self, ctx):
        return self.aux_reparam(ctx)

    def main_params(self, ctx, z0, nz=1):
        afun = get_nonlinear_func(self.nonlinearity)
        rows = _bcast_rows(ctx, ctx.shape[0], nz)
        h = afun(self.enc_fc(jnp.concatenate([rows, z0], axis=1)))
        return self.enc_reparam(h)

    def auxdec_params(self, ctx, z, nz=1):
        afun = get_nonlinear_func(self.nonlinearity)
        rows = _bcast_rows(ctx, ctx.shape[0], nz)
        h = afun(self.auxdec_fc(jnp.concatenate([rows, z], axis=1)))
        return self.auxdec_reparam(h)

    def decode_params(self, z_flat):
        return self.decode(z_flat)

    def __call__(self, x):
        feats = self.trunk_feats(x)
        mu0, lv0 = self.aux_params(feats)
        mu, lv = self.main_params(feats, mu0)
        mup0, lvp0 = self.auxdec_params(feats, mu)
        return (mu0, lv0), (mu, lv), (mup0, lvp0), self.decode_params(mu)


# --------------------------- functional API ---------------------------------

def _recon(module, dist_params, target_flat):
    if module.likelihood == "bernoulli":
        (logit,) = dist_params
        return loss_recon_bernoulli_with_logit(
            logit, target_flat.reshape(logit.shape[0], -1), reduce="per_item"
        )
    mu, logvar = dist_params
    return loss_recon_gaussian(
        mu, logvar, target_flat.reshape(mu.shape[0], -1), reduce="per_item"
    )


def aux_vae_loss(module, params, key, x, beta=1.0, compute_dtype=None,
                 reduce="mean"):
    """recon + beta*KL(q(z)) + beta*KL(q(z0)||r(z0|x,z))
    (reference models/vae/auxmnist.py:313-361).

    ``compute_dtype='bfloat16'``: tower/decoder matmuls in bf16, Gaussian
    sampling and loss reductions fp32 (same recipe as vae_loss)."""
    if compute_dtype is not None:
        cd = jnp.dtype(compute_dtype)
        params_c = jax.tree.map(
            lambda a: a.astype(cd) if a.dtype == jnp.float32 else a, params
        )
        x_c = x.astype(cd)
    else:
        params_c, x_c = params, x
    f32 = lambda t: t.astype(jnp.float32)
    k0, k1 = jax.random.split(key)
    feats = module.apply(params_c, x_c, method=module.trunk_feats)
    mu0, lv0 = module.apply(params_c, feats, method=module.aux_params)
    mu0, lv0 = f32(mu0), f32(lv0)
    z0 = sample_gaussian(k0, mu0, lv0)
    mu, lv = module.apply(params_c, feats, z0.astype(x_c.dtype),
                          method=module.main_params)
    mu, lv = f32(mu), f32(lv)
    z = sample_gaussian(k1, mu, lv)
    mup0, lvp0 = module.apply(params_c, feats, z.astype(x_c.dtype),
                              method=module.auxdec_params)
    mup0, lvp0 = f32(mup0), f32(lvp0)
    dist_params = module.apply(params_c, z.astype(x_c.dtype),
                               method=module.decode_params)
    dist_params = jax.tree.map(f32, dist_params)

    recon = _recon(module, dist_params, x)
    kld = loss_kld_gaussian(mu, lv, reduce="per_item")
    aux_kld = loss_kld_gaussian_vs_gaussian(mu0, lv0, mup0, lvp0, reduce="per_item")
    per_item = recon + beta * kld + beta * aux_kld
    loss = reduce_batch(per_item, reduce)
    return loss, {
        "recon": jnp.mean(recon),
        "kld": jnp.mean(kld) + jnp.mean(aux_kld),  # logged combined (reference :361)
        "z": z,
    }


def aux_logprob_iwae(module, params, key, x, sample_size, reduce="mean"):
    """Hierarchical IWAE: logw = ll + log p(z) + log r(z0|x,z)
    - log q(z|x,z0) - log q(z0|x) (reference models/vae/auxmnist.py:381-451),
    with one vectorized pass over bsz*ssz rows."""
    bsz = x.shape[0]
    k0, k1 = jax.random.split(key)
    feats = module.apply(params, x, method=module.trunk_feats)
    mu0, lv0 = module.apply(params, feats, method=module.aux_params)

    mu0r = _bcast_rows(mu0, bsz, sample_size)
    lv0r = _bcast_rows(lv0, bsz, sample_size)
    z0 = sample_gaussian(k0, mu0r, lv0r)  # (bsz*ssz, z0)
    log_qz0 = jnp.sum(logprob_gaussian(mu0r, lv0r, z0), axis=-1)

    mu, lv = module.apply(params, feats, z0, sample_size, method=module.main_params)
    z = sample_gaussian(k1, mu, lv)  # (bsz*ssz, z)
    log_qz = jnp.sum(logprob_gaussian(mu, lv, z), axis=-1)

    mup0, lvp0 = module.apply(params, feats, z, sample_size, method=module.auxdec_params)
    log_pz0 = jnp.sum(logprob_gaussian(mup0, lvp0, z0), axis=-1)
    log_pz = jnp.sum(logprob_gaussian(0.0, 0.0, z), axis=-1)

    dist_params = module.apply(params, z, method=module.decode_params)
    target = _bcast_rows(x.reshape(bsz, -1), bsz, sample_size)
    ll = -_recon(module, dist_params, target)

    logw = (ll + log_pz + log_pz0 - log_qz - log_qz0).reshape(bsz, sample_size)
    per_item = iwae_bound(logw, axis=1)
    return reduce_batch(per_item, reduce)
