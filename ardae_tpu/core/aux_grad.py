"""Gradient-injection surrogate (reference models/aux.py:9-37).

The reference defines a torch autograd.Function whose forward returns 0 and
whose backward emits a stored constant gradient — the "clean" way to inject
the AR-DAE entropy gradient into the encoder's backward pass (the driver
actually uses tensor.backward(gradient=...) instead, ivae_ardae.py:831-834;
both are the same contract).

In JAX the same contract is one differentiable expression:

    aux_loss_for_grad(x, g) = sum(stop_gradient(g) * x)

whose value is sum(g*x) (NOT zero — unlike the reference's forward — but the
value is never used) and whose gradient w.r.t. x is exactly g. The train
step (train/step.py model_update) uses this inline; this module provides the
named utility and its contract test for parity.
"""

import jax
import jax.numpy as jnp


def aux_loss_for_grad(x, grad):
    """A scalar whose d/dx equals ``grad`` exactly; ``grad`` gets no gradient."""
    return jnp.sum(jax.lax.stop_gradient(grad) * x)
