"""Distribution heads (reference models/reparam.py:12-203).

Heads return distribution parameters only; sampling is a pure function of an
explicit PRNG key (ardae_tpu.core.rng.sample_gaussian), keeping the modules
deterministic and jit/vmap-friendly.
"""

from typing import Callable, Optional

import flax.linen as nn
import jax.numpy as jnp

from ardae_tpu.nn.linear import Linear

MIN_LOGVAR = -4.0
MAX_LOGVAR = 2.0


def clip_logvar(logvar, mode: Optional[str]):
    """Logvar clipping modes (reference models/reparam.py:17-40)."""
    if mode is None or mode == "none":
        return logvar
    if mode == "hard":
        return jnp.clip(logvar, MIN_LOGVAR, MAX_LOGVAR)
    if mode == "softplus":
        return nn.softplus(logvar)
    if mode.startswith("spm"):
        c = float(mode[3:])
        return nn.softplus(logvar + c) - c
    if mode == "tanh":
        return jnp.tanh(logvar)
    if mode == "2tanh":
        return 2.0 * jnp.tanh(logvar)
    raise NotImplementedError(f"unknown logvar clip mode: {mode}")


class NormalHead(nn.Module):
    """Linear mean + linear (clipped) logvar (reference models/reparam.py:62-76)."""

    features: int
    clip: Optional[str] = None
    mean_kernel_init: Optional[Callable] = None
    xavier: bool = False

    @nn.compact
    def __call__(self, h):
        from ardae_tpu.nn.initializers import xavier_uniform_init, zeros_init

        xav = (
            dict(kernel_init=xavier_uniform_init, bias_init=zeros_init)
            if self.xavier
            else {}
        )
        mean_kwargs = dict(xav)
        if self.mean_kernel_init is not None:
            mean_kwargs["kernel_init"] = self.mean_kernel_init
        mu = Linear(self.features, **mean_kwargs, name="mean_fn")(h)
        logvar = clip_logvar(Linear(self.features, **xav, name="logvar_fn")(h), self.clip)
        return mu, logvar


class BernoulliHead(nn.Module):
    """Linear logits (reference models/reparam.py:163-176)."""

    features: int
    bias_const: Optional[float] = None

    @nn.compact
    def __call__(self, h):
        logit = Linear(self.features, name="logit_fn")(h)
        if self.bias_const is not None:
            # the reference's (-5)-bias init option is an additive constant on
            # the logit bias; modeled at init time by the caller instead.
            pass
        return logit


class CategoricalHead(nn.Module):
    """Linear class logits (reference models/reparam.py:264-278)."""

    num_class: int

    @nn.compact
    def __call__(self, h):
        return Linear(self.num_class, name="logit_fn")(h)


def sample_logistic_sigmoid(key, logits, temperature: float = 1.0, eps=1e-20):
    """Binary-Concrete relaxation sample (reference models/reparam.py:111-121):
    sigmoid((logits + log(u/(1-u) + eps)) / temperature), u ~ U(0,1)."""
    import jax

    noise = jax.random.uniform(key, jnp.shape(logits))
    logistic = jnp.log(noise / (1.0 - noise) + eps)
    return jax.nn.sigmoid((logits + logistic) / temperature)


def sample_gumbel_softmax(key, logits, temperature: float = 1.0, eps=1e-20):
    """Gumbel-Softmax relaxation sample (reference models/reparam.py:211-232)."""
    import jax

    noise = jax.random.uniform(key, jnp.shape(logits))
    gumbel = -jnp.log(-jnp.log(noise + eps) + eps)
    return jax.nn.softmax((logits + gumbel) / temperature, axis=-1)
