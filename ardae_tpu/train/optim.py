"""Optimizers with exact torch-1.2 update semantics.

The reference trains with a vendored torch Adam (utils/optim.py:9-110) and
torch.optim.RMSprop (ivae_ardae.py:546-556). Their numerics differ from the
optax defaults in where eps enters:
  torch Adam:    p -= lr*sqrt(bc2)/bc1 * m / (sqrt(v) + eps)
  optax adam:    p -= lr * (m/bc1) / (sqrt(v/bc2) + eps)
  torch RMSprop: avg = sqrt(sq) + eps (eps OUTSIDE the sqrt); with momentum,
                 buf = mu*buf + g/avg; p -= lr*buf.
These are implemented exactly so training curves are comparable (SURVEY.md
hard part 3).
"""

from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax


class _AdamState(NamedTuple):
    count: jnp.ndarray
    mu: optax.Updates
    nu: optax.Updates
    max_nu: optax.Updates  # only used by amsgrad


def step_lr(base_lr: float, step_size: int, gamma: float = 0.1,
            min_lr: float = 0.0):
    """StepLR schedule with a floor (reference utils/lr_scheduler.py:6-39):
    lr(t) = max(min_lr, base * gamma^(t // step_size)). Pass as the ``lr``
    of torch_adam/torch_rmsprop (they accept schedules)."""

    def sched(count):
        return jnp.maximum(min_lr, base_lr * gamma ** (count // step_size))

    return sched


def _as_sched(lr):
    return lr if callable(lr) else (lambda count: lr)


def torch_adam(lr, b1: float = 0.9, b2: float = 0.999, eps: float = 1e-8,
               weight_decay: float = 0.0, amsgrad: bool = False):
    """Exact replica of the reference's vendored Adam (utils/optim.py:50-110).
    ``lr`` may be a float or a schedule(count)->lr callable."""

    def init_fn(params):
        # independent buffers (not one aliased pytree): donation-safe.
        # max_nu is allocated even when amsgrad=False: a params-sized zeros
        # tree costs only MBs at this model scale, and keeping ONE state
        # structure keeps every saved checkpoint restorable across modes
        # (orbax restores by leaf position).
        return _AdamState(
            jnp.zeros([], jnp.int32),
            jax.tree.map(jnp.zeros_like, params),
            jax.tree.map(jnp.zeros_like, params),
            jax.tree.map(jnp.zeros_like, params),
        )

    def update_fn(updates, state, params=None):
        count = state.count + 1
        bc1 = 1.0 - b1 ** count.astype(jnp.float32)
        bc2 = 1.0 - b2 ** count.astype(jnp.float32)
        if weight_decay != 0.0:
            updates = jax.tree.map(lambda g, p: g + weight_decay * p, updates, params)
        mu = jax.tree.map(lambda m, g: b1 * m + (1 - b1) * g, state.mu, updates)
        nu = jax.tree.map(lambda v, g: b2 * v + (1 - b2) * g * g, state.nu, updates)
        if amsgrad:
            max_nu = jax.tree.map(jnp.maximum, state.max_nu, nu)
            denom_src = max_nu
        else:
            max_nu = state.max_nu
            denom_src = nu
        step_size = _as_sched(lr)(state.count) * jnp.sqrt(bc2) / bc1
        new_updates = jax.tree.map(
            lambda m, v: -step_size * m / (jnp.sqrt(v) + eps), mu, denom_src
        )
        return new_updates, _AdamState(count, mu, nu, max_nu)

    return optax.GradientTransformation(init_fn, update_fn)


def torch_adamw(lr, b1: float = 0.9, b2: float = 0.999, eps: float = 1e-8,
                weight_decay: float = 1e-2, amsgrad: bool = False):
    """Exact replica of the reference's vendored AdamW (utils/optim.py:111-215):
    decoupled stepweight decay p *= (1 - lr*wd) applied BEFORE the update,
    and eps added before the bias-correction division
    (denom = (sqrt(v)+eps)/sqrt(bc2)), unlike the vendored Adam."""

    def init_fn(params):
        return _AdamState(
            jnp.zeros([], jnp.int32),
            jax.tree.map(jnp.zeros_like, params),
            jax.tree.map(jnp.zeros_like, params),
            jax.tree.map(jnp.zeros_like, params),
        )

    def update_fn(updates, state, params=None):
        assert params is not None, "torch_adamw needs params (decoupled decay)"
        count = state.count + 1
        bc1 = 1.0 - b1 ** count.astype(jnp.float32)
        bc2 = 1.0 - b2 ** count.astype(jnp.float32)
        cur_lr = _as_sched(lr)(state.count)
        mu = jax.tree.map(lambda m, g: b1 * m + (1 - b1) * g, state.mu, updates)
        nu = jax.tree.map(lambda v, g: b2 * v + (1 - b2) * g * g, state.nu, updates)
        if amsgrad:
            max_nu = jax.tree.map(jnp.maximum, state.max_nu, nu)
            denom_src = max_nu
        else:
            max_nu = state.max_nu
            denom_src = nu
        step_size = cur_lr / bc1
        new_updates = jax.tree.map(
            lambda p, m, v: -cur_lr * weight_decay * p
            - step_size * m / ((jnp.sqrt(v) + eps) / jnp.sqrt(bc2)),
            params, mu, denom_src,
        )
        return new_updates, _AdamState(count, mu, nu, max_nu)

    return optax.GradientTransformation(init_fn, update_fn)


class _RMSPropStateC(NamedTuple):
    count: jnp.ndarray
    sq: optax.Updates
    buf: optax.Updates


def torch_rmsprop(lr, alpha: float = 0.99, eps: float = 1e-8,
                  momentum: float = 0.0):
    """torch.optim.RMSprop semantics (eps outside sqrt, momentum on update).
    ``lr`` may be a float or a schedule(count)->lr callable."""

    def init_fn(params):
        return _RMSPropStateC(
            jnp.zeros([], jnp.int32),
            jax.tree.map(jnp.zeros_like, params),
            jax.tree.map(jnp.zeros_like, params),
        )

    def update_fn(updates, state, params=None):
        cur_lr = _as_sched(lr)(state.count)
        sq = jax.tree.map(lambda s, g: alpha * s + (1 - alpha) * g * g, state.sq, updates)
        if momentum > 0.0:
            buf = jax.tree.map(
                lambda b, g, s: momentum * b + g / (jnp.sqrt(s) + eps),
                state.buf, updates, sq,
            )
            new_updates = jax.tree.map(lambda b: -cur_lr * b, buf)
        else:
            buf = state.buf
            new_updates = jax.tree.map(
                lambda g, s: -cur_lr * g / (jnp.sqrt(s) + eps), updates, sq
            )
        return new_updates, _RMSPropStateC(state.count + 1, sq, buf)

    return optax.GradientTransformation(init_fn, update_fn)


def torch_sgd(lr: float, momentum: float = 0.0):
    if momentum > 0.0:
        return optax.sgd(lr, momentum=momentum)
    return optax.sgd(lr)


def build_optimizer(name: str, lr: float, beta1: float = 0.5, momentum: float = 0.5):
    """Optimizer factory mirroring the driver flags
    (reference ivae_ardae.py:546-556, 618-629)."""
    if name == "sgd":
        # no momentum, deliberately: the reference constructs
        # optim.SGD(params, lr=...) with NO momentum argument
        # (ivae_ardae.py:548) even though --m-momentum exists
        return torch_sgd(lr)
    if name == "adam":
        return torch_adam(lr, b1=beta1, b2=0.999)
    if name == "amsgrad":
        return torch_adam(lr, b1=beta1, b2=0.999, amsgrad=True)
    if name == "rmsprop":
        return torch_rmsprop(lr, momentum=momentum)
    if name == "adamw":  # vendored by the reference (utils/optim.py:111)
        return torch_adamw(lr, b1=beta1, b2=0.999)
    raise NotImplementedError(f"unknown optimizer: {name}")
