"""Explicit PRNG plumbing.

The reference relies on torch's global RNG; here every source of randomness is
a jax.random key threaded through the step function, so a checkpoint of
(params, opt states, step, base_key) makes runs exactly resumable (SURVEY.md 5).
"""

import jax
import jax.numpy as jnp


def sample_gaussian(key, mu, logvar):
    """Reparameterized Gaussian sample (reference models/reparam.py:42-51)."""
    std = jnp.exp(0.5 * logvar)
    eps = jax.random.normal(key, jnp.shape(mu), dtype=jnp.result_type(mu))
    return mu + std * eps


def sample_laplace(key, shape, dtype=jnp.float32, loc=0.0, scale=1.0):
    """Laplace noise via inverse-CDF (reference utils/sample.py:3-12)."""
    eps = jnp.finfo(dtype).eps
    u = jax.random.uniform(key, shape, dtype=dtype, minval=eps - 1.0, maxval=1.0)
    return loc - scale * jnp.sign(u) * jnp.log1p(-jnp.abs(u))


def split_like_tree(key, tree):
    """One fresh key per leaf of a pytree."""
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    keys = jax.random.split(key, len(leaves))
    return jax.tree_util.tree_unflatten(treedef, list(keys))
