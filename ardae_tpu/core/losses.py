"""ELBO building blocks as pure jnp functions.

Re-designed TPU-first from the reference semantics in
/root/reference/utils/vae.py:21-114 and /root/reference/utils/stat.py:17-28.
Everything here is shape-polymorphic, jit/vmap-safe, and reduction is explicit:
``reduce='sum'`` sums over every element, ``reduce='per_item'`` sums all
non-batch axes (axis 0 is the batch), ``reduce='none'`` returns elementwise.
"""

import math

import jax
import jax.numpy as jnp

_LOG_2PI = math.log(2.0 * math.pi)


def _reduce(elem: jax.Array, reduce: str) -> jax.Array:
    if reduce == "none":
        return elem
    if reduce == "sum":
        return jnp.sum(elem)
    if reduce == "per_item":
        return jnp.sum(elem.reshape(elem.shape[0], -1), axis=1)
    raise ValueError(f"unknown reduce mode: {reduce}")


def reduce_batch(per_item: jax.Array, reduce: str) -> jax.Array:
    """Batch-level reduction for already-per-item losses/bounds:
    ``reduce='mean'`` -> scalar mean over the batch axis, ``'per_item'`` ->
    the (bsz,) vector unchanged (eval-tail masking). Fails fast on anything
    else — the elementwise vocabulary of :func:`_reduce` does not apply at
    this level."""
    if reduce == "mean":
        return jnp.mean(per_item)
    if reduce == "per_item":
        return per_item
    raise ValueError(f"reduce must be 'mean' or 'per_item', got {reduce!r}")


def loss_recon_bernoulli_with_logit(logit, x, reduce: str = "per_item"):
    """Bernoulli negative log-likelihood from logits.

    Numerically stable BCE-with-logits (matches reference
    utils/vae.py:21-29): max(l,0) - l*x + log(1+exp(-|l|)).
    """
    neg_ll = jnp.maximum(logit, 0.0) - logit * x + jnp.log1p(jnp.exp(-jnp.abs(logit)))
    return _reduce(neg_ll, reduce)


def loss_recon_bernoulli(p, x, eps: float = 1e-7):
    """Summed BCE given probabilities (not logits)
    (reference utils/vae.py:32-34: F.binary_cross_entropy, size_average=False)."""
    p = jnp.clip(p, eps, 1.0 - eps)
    return -jnp.sum(x * jnp.log(p) + (1.0 - x) * jnp.log(1.0 - p))


def loss_recon_gaussian(mu, logvar, x, const=None, reduce: str = "per_item"):
    """Gaussian negative log-likelihood (reference utils/vae.py:36-52)."""
    elem = logvar + (x - mu) ** 2 / jnp.exp(logvar) + _LOG_2PI
    if const is not None:
        elem = elem + const
    return 0.5 * _reduce(elem, reduce)


def loss_recon_gaussian_w_fixed_var(
    mu, x, std: float = 1.0, const=None, reduce: str = "per_item", add_logvar: bool = True
):
    """Gaussian NLL with fixed variance (reference utils/vae.py:54-76)."""
    var = std**2
    logvar = math.log(var)
    elem = (x - mu) ** 2 / var + _LOG_2PI
    if add_logvar:
        elem = elem + logvar
    if const is not None:
        elem = elem + const
    return 0.5 * _reduce(elem, reduce)


def loss_kld_gaussian(mu, logvar, reduce: str = "per_item"):
    """KL( N(mu, e^logvar) || N(0, I) )  (reference utils/vae.py:78-92)."""
    elem = 1.0 + logvar - mu**2 - jnp.exp(logvar)
    return -0.5 * _reduce(elem, reduce)


def loss_kld_gaussian_vs_gaussian(mu1, logvar1, mu2, logvar2, reduce: str = "per_item"):
    """KL( N(mu1, e^lv1) || N(mu2, e^lv2) )  (reference utils/vae.py:94-114)."""
    elem = -logvar2 + logvar1 - (jnp.exp(logvar1) + (mu1 - mu2) ** 2) / jnp.exp(logvar2) + 1.0
    return -0.5 * _reduce(elem, reduce)


def loss_entropy_gaussian(logvar, reduce: str = "per_item"):
    """Negative differential entropy terms of a diagonal Gaussian
    (reference utils/stat.py:17-28)."""
    elem = logvar + 1.0 + _LOG_2PI
    return 0.5 * _reduce(elem, reduce)


def iwae_bound(logw, axis: int = -1, eps: float = 1e-10):
    """log mean_k exp(logw_k) with the reference's exact max-shift + eps trick.

    Matches models/ivae/mnist.py:430-434: log(mean(exp(lw - max)) + 1e-10) + max.
    The +eps makes NLL numbers comparable with the reference to <0.2 nats.
    """
    logw_max = jax.lax.stop_gradient(jnp.max(logw, axis=axis, keepdims=True))
    rprob = jnp.exp(logw - logw_max)
    out = jnp.log(jnp.mean(rprob, axis=axis, keepdims=True) + eps) + logw_max
    return jnp.squeeze(out, axis=axis)
