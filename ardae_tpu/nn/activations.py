"""Nonlinearity registry (reference utils/models.py:14-32)."""

import jax
import jax.numpy as jnp


def _csoftplus(x):
    # the reference's hand-rolled softplus: log(exp(x) + 1), kept for parity
    return jnp.logaddexp(x, 0.0)


def _leaky_relu02(x):
    return jax.nn.leaky_relu(x, negative_slope=0.2)


def _swish(x):
    return x * jax.nn.sigmoid(x)


_NONLIN = {
    "relu": jax.nn.relu,
    "elu": jax.nn.elu,
    "tanh": jnp.tanh,
    "softplus": jax.nn.softplus,
    "csoftplus": _csoftplus,
    "leaky_relu": _leaky_relu02,
    "swish": _swish,
}


def get_nonlinear_func(name: str = "elu"):
    try:
        return _NONLIN[name]
    except KeyError:
        raise NotImplementedError(f"unknown nonlinearity: {name}")
