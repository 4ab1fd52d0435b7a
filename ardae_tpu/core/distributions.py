"""Extra distributions (reference utils/distributions.py).

The reference's HypersphericalUniform is unused by the drivers and its
helper sample_hypershperical_uniform_bsz_ssz contains dead/broken code
(references undefined names — utils/distributions.py:6-12); this is a
working implementation of the evident intent.
"""

import math

import jax
import jax.numpy as jnp
from jax.scipy.special import gammaln


def sample_hyperspherical_uniform(key, batch_size, sample_size, dim):
    """Uniform samples on S^{dim} embedded in R^{dim+1}:
    (batch_size, sample_size, dim+1)."""
    x = jax.random.normal(key, (batch_size, sample_size, dim + 1))
    return x / jnp.linalg.norm(x, axis=-1, keepdims=True)


def hyperspherical_uniform_entropy(dim):
    """log surface area of S^dim (= entropy of the uniform)."""
    d = dim + 1
    return (math.log(2.0) + (d / 2.0) * math.log(math.pi)
            - float(gammaln(d / 2.0)))


def hyperspherical_uniform_logprob(x, dim):
    """Constant -log area for points on the sphere (shape: x.shape[:-1])."""
    return jnp.full(x.shape[:-1], -hyperspherical_uniform_entropy(dim))
