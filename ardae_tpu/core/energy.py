"""Target energy functions (pure jnp).

TPU-first equivalents of /root/reference/utils/energy.py:7-103: the notebook
targets (ring, sine, two-arm mixtures) and the standard-normal prior energy
used as the IVAE prior loss.
"""

import math

import jax.numpy as jnp
from jax.nn import sigmoid, relu

EPS = 1e-9


def regularization_func(x):
    """Box penalty relu(|x|-6)^2 (reference utils/energy.py:7-8)."""
    return jnp.sum(relu(jnp.abs(x) - 6.0) ** 2, axis=-1, keepdims=True)


def _w1(z1):
    return jnp.sin(2.0 * math.pi * z1 / 4.0)


def _w2(z1):
    return 3.0 * jnp.exp(-0.5 * ((z1 - 1.0) / 0.6) ** 2)


def _w3(z1):
    return 3.0 * sigmoid((z1 - 1.0) / 0.3)


def energy_func1(x):
    """Ring with two bumps (reference utils/energy.py:19-31)."""
    x1 = x[:, :1]
    xnorm = jnp.linalg.norm(x, axis=1, keepdims=True)
    energy = 0.5 * ((xnorm - 2.0) / 0.4) ** 2 - jnp.log(
        jnp.exp(-0.5 * ((x1 - 2.0) / 0.6) ** 2)
        + jnp.exp(-0.5 * ((x1 + 2.0) / 0.6) ** 2)
        + EPS
    )
    return energy + regularization_func(x)


def energy_func2(x):
    """Sine ridge (reference utils/energy.py:33-41)."""
    x1, x2 = x[:, :1], x[:, 1:]
    energy = 0.5 * ((x2 - _w1(x1)) / 0.4) ** 2
    return energy + regularization_func(x)


def energy_func3(x):
    """Two sine arms via exp-bump split (reference utils/energy.py:43-53)."""
    x1, x2 = x[:, :1], x[:, 1:]
    energy = -jnp.log(
        jnp.exp(-0.5 * ((x2 - _w1(x1)) / 0.35) ** 2)
        + jnp.exp(-0.5 * ((x2 - _w1(x1) + _w2(x1)) / 0.35) ** 2)
        + EPS
    )
    return energy + regularization_func(x)


def energy_func4(x):
    """Two sine arms via sigmoid split (reference utils/energy.py:55-67)."""
    x1, x2 = x[:, :1], x[:, 1:]
    energy = -jnp.log(
        jnp.exp(-0.5 * ((x2 - _w1(x1)) / 0.4) ** 2)
        + jnp.exp(-0.5 * ((x2 - _w1(x1) + _w3(x1)) / 0.35) ** 2)
        + EPS
    )
    return energy + regularization_func(x)


def _normal_energy_elem(x, mu=0.0, logvar=0.0):
    return 0.5 * (logvar + (x - mu) ** 2 / math.exp(logvar) + math.log(2.0 * math.pi))


def normal_energy_func(x, mu=0.0, logvar=0.0):
    """-log N(x; mu, e^logvar) summed over features: the standard-normal
    prior loss of every IVAE (reference utils/energy.py:69-78)."""
    x = x.reshape(x.shape[0], -1)
    return jnp.sum(_normal_energy_elem(x, mu, logvar), axis=1)


def normal_prob(x, mu=0.0, std=1.0):
    """exp(-normal_energy) (reference utils/energy.py:94-103)."""
    var = std**2
    return jnp.exp(-normal_energy_func(x, mu, math.log(var)))
