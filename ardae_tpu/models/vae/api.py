"""Functional API for Gaussian-posterior baseline VAEs.

Mirrors the implicit-model API (models/ivae/api.py) for the baseline zoo:
ELBO loss (reference models/vae/mnist.py:131-160), IWAE logprob with the
exact q density (reference :179-220), generation.
"""

import jax
import jax.numpy as jnp

from ardae_tpu.core.losses import (
    iwae_bound,
    loss_kld_gaussian,
    loss_recon_bernoulli_with_logit,
    loss_recon_gaussian,
    reduce_batch,
)
from ardae_tpu.core.stats import logprob_gaussian
from ardae_tpu.core.rng import sample_gaussian


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


def vae_loss(module, params, key, x, beta=1.0, compute_dtype=None,
             reduce="mean"):
    """mean(recon + beta * KLD). Returns (loss, terms); ``reduce='per_item'``
    returns the per-item loss vector instead of its mean (eval-tail masking).

    ``compute_dtype='bfloat16'`` runs encoder/decoder matmuls in bf16 (params
    cast inside, fp32 master params receive fp32 grads through the cast's
    transpose); Gaussian sampling and the loss reductions stay fp32 — the
    same recipe as models/ivae/api.ivae_loss."""
    if compute_dtype is not None:
        cd = jnp.dtype(compute_dtype)
        params_c = jax.tree.map(
            lambda a: a.astype(cd) if a.dtype == jnp.float32 else a, params
        )
        x_c = x.astype(cd)
    else:
        cd = None
        params_c, x_c = params, x
    if module.family == "flow_posterior":
        # MAF posterior (models/vae/maf.py): KLD term is the single-sample
        # Monte-Carlo E[log q(z|x) - log p(z)] — no closed form through the
        # flow. The flow itself runs fp32 (tiny nets; exactness of the
        # sequential inverse matters more than bandwidth).
        mu_z, logvar_z, ctx = module.apply(
            params_c, x_c, method=module.encode_ctx)
        mu_z = mu_z.astype(jnp.float32)
        logvar_z = logvar_z.astype(jnp.float32)
        z0 = sample_gaussian(key, mu_z, logvar_z)
        # flow always runs on the fp32 master params
        z, sum_a = module.apply(
            params, z0, ctx.astype(jnp.float32), method=module.flow_inverse)
        logq = jnp.sum(logprob_gaussian(mu_z, logvar_z, z0), axis=-1) - sum_a
        logp = jnp.sum(logprob_gaussian(0.0, 0.0, z), axis=-1)
        kld = logq - logp
    else:
        mu_z, logvar_z = module.apply(params_c, x_c, method=module.encode_params)
        mu_z = mu_z.astype(jnp.float32)
        logvar_z = logvar_z.astype(jnp.float32)
        z = sample_gaussian(key, mu_z, logvar_z)
        kld = loss_kld_gaussian(mu_z, logvar_z, reduce="per_item")
    dist_params = module.apply(
        params_c, z.astype(x_c.dtype), method=module.decode_params
    )
    dist_params = jax.tree.map(lambda d: d.astype(jnp.float32), dist_params)
    recon = _recon(module, dist_params, x)
    per_item = recon + beta * kld
    loss = reduce_batch(per_item, reduce)
    return loss, {"recon": jnp.mean(recon), "kld": jnp.mean(kld), "z": z}


def generate(module, params, key, batch_size):
    kz, kx = jax.random.split(key)
    z = jax.random.normal(kz, (batch_size, module.z_dim))
    dist_params = module.apply(params, z, method=module.decode_params)
    if module.likelihood == "bernoulli":
        (logit,) = dist_params
        probs = jax.nn.sigmoid(logit)
        return jax.random.bernoulli(kx, probs).astype(jnp.float32), probs, z
    mu, logvar = dist_params
    return sample_gaussian(kx, mu, logvar), mu, z


def reconstruct(module, params, key, x):
    """model(x) forward for visualization: (x_sample, x_mu_or_prob, z)
    (reference models/vae/mnist.py:131-160 returns these as its first
    outputs). Handles both flat and hierarchical-aux families."""
    k_enc, k_dec = jax.random.split(key)
    if module.family == "aux_gaussian_posterior":
        k0, k1 = jax.random.split(k_enc)
        feats = module.apply(params, x, method=module.trunk_feats)
        mu0, lv0 = module.apply(params, feats, method=module.aux_params)
        z0 = sample_gaussian(k0, mu0, lv0)
        mu_z, lv_z = module.apply(params, feats, z0, method=module.main_params)
        z = sample_gaussian(k1, mu_z, lv_z)
    elif module.family == "flow_posterior":
        mu_z, logvar_z, ctx = module.apply(params, x, method=module.encode_ctx)
        z0 = sample_gaussian(k_enc, mu_z, logvar_z)
        z, _ = module.apply(params, z0, ctx, method=module.flow_inverse)
    else:
        mu_z, logvar_z = module.apply(params, x, method=module.encode_params)
        z = sample_gaussian(k_enc, mu_z, logvar_z)
    dist_params = module.apply(params, z, method=module.decode_params)
    if module.likelihood == "bernoulli":
        (logit,) = dist_params
        probs = jax.nn.sigmoid(logit)
        return jax.random.bernoulli(k_dec, probs).astype(jnp.float32), probs, z
    mu, logvar = dist_params
    return sample_gaussian(k_dec, mu, logvar), mu, z


def logprob_iwae(module, params, key, x, sample_size, reduce="mean"):
    """IWAE bound with the exact Gaussian q (reference models/vae/mnist.py:179-220)."""
    bsz = x.shape[0]
    zdim = module.z_dim
    if module.family == "flow_posterior":
        mu_qz, logvar_qz, ctx = module.apply(params, x, method=module.encode_ctx)
        mu = jnp.broadcast_to(mu_qz[:, None, :], (bsz, sample_size, zdim))
        logvar = jnp.broadcast_to(logvar_qz[:, None, :], (bsz, sample_size, zdim))
        z0 = sample_gaussian(key, mu, logvar)
        ctx_rep = jnp.broadcast_to(
            ctx[:, None, :], (bsz, sample_size, ctx.shape[-1])
        ).reshape(bsz * sample_size, -1)
        z_flat, sum_a = module.apply(
            params, z0.reshape(bsz * sample_size, zdim), ctx_rep,
            method=module.flow_inverse)
        z = z_flat.reshape(bsz, sample_size, zdim)
        logposterior = (jnp.sum(logprob_gaussian(mu, logvar, z0), axis=-1)
                        - sum_a.reshape(bsz, sample_size))
    else:
        mu_qz, logvar_qz = module.apply(params, x, method=module.encode_params)
        mu = jnp.broadcast_to(mu_qz[:, None, :], (bsz, sample_size, zdim))
        logvar = jnp.broadcast_to(logvar_qz[:, None, :], (bsz, sample_size, zdim))
        z = sample_gaussian(key, mu, logvar)
        logposterior = jnp.sum(logprob_gaussian(mu, logvar, z), axis=-1)
    logprior = jnp.sum(logprob_gaussian(0.0, 0.0, z), axis=-1)

    dist_params = module.apply(
        params, z.reshape(bsz * sample_size, zdim), method=module.decode_params
    )
    x_flat = x.reshape(bsz, 1, -1)
    target = jnp.broadcast_to(x_flat, (bsz, sample_size, x_flat.shape[-1]))
    if module.likelihood == "bernoulli":
        (logit,) = dist_params
        logit = logit.reshape(bsz, sample_size, -1)
        ll = -(
            jnp.maximum(logit, 0.0)
            - logit * target
            + jnp.log1p(jnp.exp(-jnp.abs(logit)))
        )
        loglikelihood = jnp.sum(ll, axis=-1)
    else:
        mu_x, logvar_x = dist_params
        mu_x = mu_x.reshape(bsz, sample_size, -1)
        logvar_x = logvar_x.reshape(bsz, sample_size, -1)
        loglikelihood = jnp.sum(logprob_gaussian(mu_x, logvar_x, target), axis=-1)

    logw = loglikelihood + logprior - logposterior
    per_item = iwae_bound(logw, axis=1)
    return reduce_batch(per_item, reduce)
