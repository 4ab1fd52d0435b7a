"""Functional API shared by every implicit-posterior VAE.

The reference spreads this logic between model.forward / forward_hidden /
encode / generate / logprob methods (e.g. models/ivae/mnist.py:254-318) and
the driver; here it is a set of pure functions of (module, params, key, ...)
so the whole train step jits as one XLA computation.

Conventions:
  * ``noise_std=None`` means unit noise; a float scales the injected noise
    (reference encode(x, std=s) semantics). For aux models the scale applies
    to the posterior std (reference models/ivae/auxmnist.py:32-39).
  * z always comes back (bsz, nz, z_dim).
"""

import jax
import jax.numpy as jnp

from ardae_tpu.core.losses import (
    iwae_bound,
    loss_recon_bernoulli_with_logit,
    loss_recon_gaussian,
    reduce_batch,
)
from ardae_tpu.core.energy import normal_energy_func
from ardae_tpu.core.stats import covmat, logprob_gaussian, mvn_logprob


def make_eps(module, key, bsz, nz, noise_std=None):
    """Draw the encoder's noise inputs. Returns what module.sample_z expects."""
    scale = 1.0 if noise_std is None else noise_std
    if module.family == "aux":
        k0, k1 = jax.random.split(key)
        eps0 = jax.random.normal(k0, (bsz * nz, module.noise_dim))
        eps = jax.random.normal(k1, (bsz * nz, module.z_dim))
        return (eps0, eps)  # aux models scale by noise_std internally
    eps = jax.random.normal(key, (bsz * nz, module.noise_dim))
    return scale * eps


def sample_latents(module, params, key, x, nz, noise_std=None):
    """forward_hidden: z ~ q(z|x), (bsz, nz, z_dim). The noise inputs follow
    x's dtype so bf16 sampling passes stay bf16 end to end."""
    eps = make_eps(module, key, x.shape[0], nz, noise_std)
    eps = jax.tree.map(lambda e: e.astype(x.dtype), eps)
    if module.family == "aux":
        return module.apply(params, x, eps, noise_std, method=module.sample_z)
    return module.apply(params, x, eps, method=module.sample_z)


def encode_det(module, params, x):
    """encode(x, std=0): deterministic latent, (bsz, 1, z_dim)."""
    bsz = x.shape[0]
    if module.family == "aux":
        eps = (
            jnp.zeros((bsz, module.noise_dim)),
            jnp.zeros((bsz, module.z_dim)),
        )
        return module.apply(params, x, eps, 0.0, method=module.sample_z)
    eps = jnp.zeros((bsz, module.noise_dim))
    return module.apply(params, x, eps, method=module.sample_z)


def encode_hidden_feats(module, params, x):
    """'hidden1a' context features at std=0 (aux models only; the reference
    crashes for flat models too — ivae_ardae.py:738 calls a method that only
    aux encoders define)."""
    if module.family != "aux":
        raise NotImplementedError("hidden1a context requires an aux model")
    bsz = x.shape[0]
    eps = (jnp.zeros((bsz, module.noise_dim)), jnp.zeros((bsz, module.z_dim)))
    return module.apply(params, x, eps, 0.0, method=module.hidden_feats)


def recon_loss_fn(module, dist_params, target_flat):
    if module.likelihood == "bernoulli":
        (logit,) = dist_params
        return loss_recon_bernoulli_with_logit(
            logit, target_flat.reshape(logit.shape[0], -1), reduce="per_item"
        )
    mu, logvar = dist_params
    return loss_recon_gaussian(
        mu, logvar, target_flat.reshape(mu.shape[0], -1), reduce="per_item"
    )


def ivae_loss(module, params, key, x, nz, beta=1.0, noise_std=None,
              compute_dtype=None):
    """One model-forward pass: loss = mean(recon + beta * prior_energy).

    Matches the reference loss (e.g. models/ivae/mnist.py:240-249): the
    q-entropy term is deliberately absent — its gradient is injected by the
    CDAE (see train/step.py). Returns (loss, dict of terms).

    ``compute_dtype='bfloat16'`` runs the encoder/decoder matmuls in bf16
    (params cast inside, so fp32 master params receive fp32 grads through
    the cast's transpose) while the loss reductions — BCE/Gaussian sums
    over pixels and the prior energy — stay fp32.
    """
    bsz = x.shape[0]
    if compute_dtype is not None:
        cd = jnp.dtype(compute_dtype)
        params = jax.tree.map(
            lambda a: a.astype(cd) if a.dtype == jnp.float32 else a, params
        )
        x_c = x.astype(cd)
    else:
        x_c = x
    z = sample_latents(module, params, key, x_c, nz, noise_std)
    z = z.astype(jnp.float32)
    z_flat = z.reshape(bsz * nz, -1)
    dist_params = module.apply(
        params, z_flat.astype(x_c.dtype), method=module.decode_params
    )
    dist_params = jax.tree.map(lambda d: d.astype(jnp.float32), dist_params)
    x_flat = x.reshape(bsz, -1)
    target = jnp.broadcast_to(x_flat[:, None, :], (bsz, nz, x_flat.shape[-1]))
    recon = recon_loss_fn(module, dist_params, target.reshape(bsz * nz, -1))
    prior = normal_energy_func(z_flat)
    loss = jnp.mean(recon + beta * prior)
    return loss, {
        "z": z,
        "recon": jnp.mean(recon),
        "prior": jnp.mean(prior),
        "dist_params": dist_params,
    }


def generate(module, params, key, batch_size):
    """Sample z ~ N(0, I), decode (reference models/ivae/mnist.py:303-316)."""
    kz, kx = jax.random.split(key)
    z = jax.random.normal(kz, (batch_size, module.z_dim))
    dist_params = module.apply(params, z, method=module.decode_params)
    if module.likelihood == "bernoulli":
        (logit,) = dist_params
        probs = jax.nn.sigmoid(logit)
        sample = jax.random.bernoulli(kx, probs).astype(jnp.float32)
        return sample, probs, z
    mu, logvar = dist_params
    from ardae_tpu.core.rng import sample_gaussian

    return sample_gaussian(kx, mu, logvar), mu, z


def reconstruct(module, params, key, x):
    """model(x) with nz=1 for visualization: (x_sample, x_mu_or_prob, z_flat)
    (the reference forward's first three outputs, e.g.
    models/ivae/mnist.py:254-280)."""
    k_enc, k_dec = jax.random.split(key)
    z = sample_latents(module, params, k_enc, x, 1)
    z_flat = z.reshape(x.shape[0], -1)
    dist_params = module.apply(params, z_flat, method=module.decode_params)
    if module.likelihood == "bernoulli":
        (logit,) = dist_params
        probs = jax.nn.sigmoid(logit)
        sample = jax.random.bernoulli(k_dec, probs).astype(jnp.float32)
        return sample, probs, z_flat
    mu, logvar = dist_params
    from ardae_tpu.core.rng import sample_gaussian

    return sample_gaussian(k_dec, mu, logvar), mu, z_flat


def logprob_iws(module, params, key, x, sample_size, jitter=0.0, noise_std=None,
                reduce="mean"):
    """IWS log-likelihood with a covariance-Gaussian pseudo-posterior.

    Vmapped re-design of reference models/ivae/mnist.py:378-437 (flat) and
    models/ivae/auxmnist.py:297-357 (aux, jitter=1e-5): the per-item Python
    loops (covariance, MVN sample/logpdf, decode) become one batched
    Cholesky + triangular solve + a single decode over bsz*ssz rows.
    Requires sample_size >= 2*z_dim for a full-rank covariance.
    """
    k_enc, k_new = jax.random.split(key)

    # implicit posterior samples: (bsz, ssz, zdim)
    z = sample_latents(module, params, k_enc, x, sample_size, noise_std)
    per_item = cov_gaussian_iws_from_draws(module, params, x, z, k_new, jitter)
    return reduce_batch(per_item, reduce)


def cov_gaussian_iws_from_draws(module, params, x, z, key, jitter=0.0):
    """The cov-Gaussian pseudo-posterior bound given posterior draws
    z (bsz, ssz, zdim): fit N(mu, cov), re-sample, importance-weight.

    Factored out of :func:`logprob_iws` so the cross-law parity scripts
    (scoring a Gaussian baseline under the implicit side's estimator) apply
    the EXACT same fit/floor/reweight code path — any future tuning of the
    jitter floor or sampling changes both consumers together. Returns the
    per-item (bsz,) bound."""
    bsz, ssz, zdim = z.shape
    mu_qz = jnp.mean(z, axis=1)  # (bsz, zdim)
    cov = jax.vmap(covmat)(z) + jitter * jnp.eye(zdim)  # (bsz, zdim, zdim)
    # relative jitter floor: an early/collapsed posterior can make the sample
    # covariance numerically rank-deficient, where the reference's torch
    # MultivariateNormal hard-crashes and a raw Cholesky yields NaN. 1e-6 x
    # mean-diagonal inflates eigenvalues by a relative 1e-6 — far below the
    # 0.2-nat comparability budget — and keeps the bound finite.
    mean_diag = jnp.mean(jnp.diagonal(cov, axis1=-2, axis2=-1), axis=-1)
    cov = cov + (1e-6 * mean_diag + 1e-30)[:, None, None] * jnp.eye(zdim)
    chol = jnp.linalg.cholesky(cov)

    # newz ~ N(mu_qz, cov) and its log-density
    eps = jax.random.normal(key, (bsz, ssz, zdim))
    newz = mu_qz[:, None, :] + jnp.einsum("bij,bsj->bsi", chol, eps)
    logposterior = jax.vmap(mvn_logprob)(newz, mu_qz, chol)  # (bsz, ssz)

    loglikelihood, logprior = _loglik_and_prior(module, params, x, newz)
    logw = loglikelihood + logprior - logposterior  # (bsz, ssz)
    return iwae_bound(logw, axis=1)


def _loglik_and_prior(module, params, x, newz):
    """Shared tail of every logprob variant: log p(x|z) + log p(z)."""
    bsz, ssz, zdim = newz.shape
    logprior = jnp.sum(logprob_gaussian(0.0, 0.0, newz), axis=-1)
    dist_params = module.apply(
        params, newz.reshape(bsz * ssz, zdim), method=module.decode_params
    )
    x_flat = x.reshape(bsz, 1, -1)
    target = jnp.broadcast_to(x_flat, (bsz, ssz, x_flat.shape[-1]))
    if module.likelihood == "bernoulli":
        (logit,) = dist_params
        logit = logit.reshape(bsz, ssz, -1)
        ll = -(
            jnp.maximum(logit, 0.0)
            - logit * target
            + jnp.log1p(jnp.exp(-jnp.abs(logit)))
        )
        loglikelihood = jnp.sum(ll, axis=-1)
    else:
        mu, logvar = dist_params
        mu = mu.reshape(bsz, ssz, -1)
        logvar = logvar.reshape(bsz, ssz, -1)
        loglikelihood = jnp.sum(logprob_gaussian(mu, logvar, target), axis=-1)
    return loglikelihood, logprior


def logprob_kde(module, params, key, x, sample_size, noise_std=None):
    """IWS bound with a Gaussian-KDE pseudo-posterior built from implicit
    samples (reference models/ivae/mnist.py:321-376, which calls scipy's
    gaussian_kde per item in a Python loop) — here a jax-native KDE with
    Scott's-rule bandwidth, fully vmapped over the batch."""
    bsz = x.shape[0]
    zdim = module.z_dim
    k_enc, k_pick, k_noise = jax.random.split(key, 3)

    z = sample_latents(module, params, k_enc, x, sample_size, noise_std)
    # Scott factor: n^(-1/(d+4)); kernel cov = cov(z) * factor^2
    factor = sample_size ** (-1.0 / (zdim + 4))
    cov = jax.vmap(covmat)(z) * factor**2 + 1e-9 * jnp.eye(zdim)
    chol = jnp.linalg.cholesky(cov)

    # resample: random kernel center + kernel noise
    idx = jax.random.randint(k_pick, (bsz, sample_size), 0, sample_size)
    centers = jnp.take_along_axis(z, idx[:, :, None], axis=1)
    eps = jax.random.normal(k_noise, (bsz, sample_size, zdim))
    newz = centers + jnp.einsum("bij,bsj->bsi", chol, eps)

    # KDE log-density: logsumexp over kernels
    def kde_logpdf(pts, data, ch):
        diff = pts[:, None, :] - data[None, :, :]  # (ssz_new, ssz_data, d)
        import jax.scipy.linalg as jsl

        sol = jsl.solve_triangular(
            ch, diff.reshape(-1, zdim).T, lower=True
        ).T.reshape(diff.shape)
        maha = jnp.sum(sol**2, axis=-1)
        logdet = 2.0 * jnp.sum(jnp.log(jnp.diagonal(ch)))
        lognorm = 0.5 * (logdet + zdim * jnp.log(2.0 * jnp.pi))
        from jax.scipy.special import logsumexp

        return logsumexp(-0.5 * maha - lognorm, axis=1) - jnp.log(data.shape[0])

    logposterior = jax.vmap(kde_logpdf)(newz, z, chol)
    loglikelihood, logprior = _loglik_and_prior(module, params, x, newz)
    logw = loglikelihood + logprior - logposterior
    return jnp.mean(iwae_bound(logw, axis=1))


def logprob_diag(module, params, key, x, sample_size, noise_std=None):
    """IWS bound with a DIAGONAL Gaussian pseudo-posterior
    (reference models/ivae/mnist.py:439-486)."""
    bsz = x.shape[0]
    zdim = module.z_dim
    k_enc, k_new = jax.random.split(key)
    z = sample_latents(module, params, k_enc, x, sample_size, noise_std)
    mu = jnp.mean(z, axis=1, keepdims=True)
    logvar = jnp.log(jnp.var(z, axis=1, keepdims=True) + 1e-10)
    eps = jax.random.normal(k_new, (bsz, sample_size, zdim))
    newz = mu + jnp.exp(0.5 * logvar) * eps
    logposterior = jnp.sum(logprob_gaussian(mu, logvar, newz), axis=-1)
    loglikelihood, logprior = _loglik_and_prior(module, params, x, newz)
    logw = loglikelihood + logprior - logposterior
    return jnp.mean(iwae_bound(logw, axis=1))


def logprob_prior(module, params, key, x, sample_size, z=None):
    """Brute-force log p(x) ~= log mean_k p(x|z_k), z_k ~ N(0, I)
    (reference models/ivae/mnist.py:488-518)."""
    bsz = x.shape[0]
    if z is None:
        z = jax.random.normal(key, (bsz, sample_size, module.z_dim))
    loglikelihood, _ = _loglik_and_prior(module, params, x, z)
    return jnp.mean(iwae_bound(loglikelihood, axis=1))
