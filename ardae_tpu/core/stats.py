"""Probability / statistics helpers (pure jnp).

TPU-first equivalents of /root/reference/utils/stat.py:30-158. All functions
broadcast instead of unsqueezing, and `covmat` is written to vmap cleanly over
a batch axis (the reference loops in Python per item; see SURVEY.md 3.3).
"""

import math

import jax
import jax.numpy as jnp

_LOG_2PI = math.log(2.0 * math.pi)


def logprob_gaussian(mu, logvar, z):
    """Elementwise diagonal-Gaussian log-density (no reduction).

    Matches reference utils/stat.py:65-96 with do_unsqueeze=False,
    do_mean=False; reduce with jnp.sum(..., axis=-1) at call sites.
    """
    neglogprob = (z - mu) ** 2 / jnp.exp(logvar) + logvar + _LOG_2PI
    return -0.5 * neglogprob


def logprob_gaussian_w_fixed_var(mu, z, std: float = 1.0):
    """Elementwise Gaussian log-density with scalar fixed std
    (reference utils/stat.py:98-125)."""
    var = std**2
    logvar = math.log(var)
    neglogprob = (z - mu) ** 2 / var + logvar + _LOG_2PI
    return -0.5 * neglogprob


def prob_gaussian(mu, logvar, z, eps: float = 1e-6):
    """Elementwise Gaussian density (reference utils/stat.py:30-52)."""
    var = jnp.exp(logvar) + eps
    std = jnp.sqrt(var) + eps
    return jnp.exp(-0.5 * (z - mu) ** 2 / var) / std / math.sqrt(2.0 * math.pi)


def shuffle(key, z):
    """Independently permute each column of ``z`` across the batch
    (reference utils/stat.py:9-15; used to approximate the product of
    marginals). Explicit-PRNG-key version of the numpy permutation."""
    bsz, zdim = z.shape
    keys = jax.random.split(key, zdim)
    cols = [jax.random.permutation(keys[i], z[:, i]) for i in range(zdim)]
    return jnp.stack(cols, axis=1)


def loss_marginal_entropy_gaussian(mu, logvar, z, reduce: str = "sum"):
    """-log( mean_j N(z_i; mu_j, var_j) ) per element: entropy of the
    kernel-density marginal (reference utils/stat.py:54-63). mu/logvar are
    (b2, nz) kernel params, z is (b1, nz)."""
    p = prob_gaussian(mu[None, :, :], logvar[None, :, :], z[:, None, :])
    elem = -jnp.log(jnp.mean(p, axis=1))
    return jnp.sum(elem) if reduce == "sum" else elem


def loss_approx_marginal_entropy_gaussian(mu, logvar, z, reduce: str = "sum"):
    """Mean-of-logs approximation to the marginal entropy
    (reference utils/stat.py:87-96)."""
    lp = logprob_gaussian(mu[None, :, :], logvar[None, :, :], z[:, None, :])
    elem = -jnp.mean(lp, axis=1)
    return jnp.sum(elem) if reduce == "sum" else elem


def covmat(m):
    """Unbiased sample covariance of rows of ``m`` (n x d) -> (d x d).

    Matches reference utils/stat.py:127-158 (rowvar=False path). Written
    as one centered matmul so it maps onto the MXU and vmaps over batches.
    """
    n = m.shape[0]
    centered = m - jnp.mean(m, axis=0, keepdims=True)
    # highest precision: this feeds a Cholesky in the IWS evaluator
    gram = jnp.matmul(centered.T, centered, precision=jax.lax.Precision.HIGHEST)
    return gram / (n - 1)


def mvn_logprob(z, mu, chol):
    """Multivariate-normal log-density given a Cholesky factor of the cov.

    z: (..., d); mu: (d,); chol: (d, d) lower-triangular.
    Replaces torch.distributions.MultivariateNormal.log_prob in the IWS
    evaluator (reference models/ivae/mnist.py:399-401) with an explicit
    triangular solve that vmaps/jits cleanly.
    """
    import jax.scipy.linalg as jsl

    d = mu.shape[-1]
    diff = z - mu
    batch_shape = diff.shape[:-1]
    # flatten leading dims: one (d, n) triangular solve instead of a batched one
    flat = diff.reshape(-1, d).T
    sol = jsl.solve_triangular(chol, flat, lower=True)
    maha = jnp.sum(sol**2, axis=0).reshape(batch_shape)
    logdet = 2.0 * jnp.sum(jnp.log(jnp.diagonal(chol)))
    return -0.5 * (maha + logdet + d * _LOG_2PI)
