"""Conditional MADE: masked autoregressive conditioner for MAF flows.

The reference intended a ToyMAFVAE (vae.py:205-212) built on its vendored
torchkit flow plumbing (models/layers2.py SequentialFlow/ContextWrapper,
torchkit heritage = MAF/NAF), but never shipped the flow layers — selecting
``--model toy-maf`` crashes there. This module supplies the missing core as
a TPU-native primitive: one masked autoregressive net producing the shift
``m`` and log-scale ``a`` of a MAF block, conditioned on unmasked context
features (Germain et al. 2015 masks; Papamakarios et al. 2017 usage).

Autoregressive law (natural coordinate order): output slot ``i`` of both
heads depends only on inputs ``z_{<i}`` (strictly), plus the full context.
Output heads are zero-initialized so a fresh flow block is the identity
map — a ToyMAFVAE starts exactly at its Gaussian-posterior baseline.
"""

import numpy as np

import flax.linen as nn
import jax.numpy as jnp

from ardae_tpu.nn.activations import get_nonlinear_func
from ardae_tpu.nn.initializers import torch_bias_init, torch_kernel_init, zeros_init

# log-scale clamp: keeps exp(a) in [e^-5, e^5] so the sequential inverse
# stays well-conditioned (documented stabilization; the blocks start at
# identity and the toy targets never need more than ~e^2 of local scale)
A_CLAMP = 5.0


def _degrees(input_dim, hidden_dim):
    """(deg_in [d], deg_hidden [h]) MADE degree assignment."""
    deg_in = np.arange(1, input_dim + 1)
    deg_h = (np.arange(hidden_dim) % max(1, input_dim - 1)) + 1
    return deg_in, deg_h


class ConditionalMADE(nn.Module):
    """One-hidden-layer conditional MADE emitting (shift, log_scale).

    ``__call__(z [..., d], ctx [..., c]) -> (m [..., d], a [..., d])`` with
    ``m_i, a_i`` functions of ``z_{<i}`` and ``ctx`` only; ``a`` clamped to
    ±A_CLAMP.
    """

    input_dim: int
    hidden_dim: int
    nonlinearity: str = "relu"

    @nn.compact
    def __call__(self, z, ctx):
        d, h = self.input_dim, self.hidden_dim
        deg_in, deg_h = _degrees(d, h)
        mask_h = jnp.asarray((deg_h[None, :] >= deg_in[:, None]),
                             jnp.float32)  # [d, h]
        mask_o = jnp.asarray((deg_in[None, :] > deg_h[:, None]),
                             jnp.float32)  # [h, d] (strict: no self-loop)

        w_in = self.param("w_in", torch_kernel_init, (d, h))
        w_ctx = self.param("w_ctx", torch_kernel_init, (ctx.shape[-1], h))
        b_h = self.param("b_h", torch_bias_init(d + ctx.shape[-1]), (h,))
        hid = z @ (w_in * mask_h) + ctx @ w_ctx + b_h
        hid = get_nonlinear_func(self.nonlinearity)(hid)

        w_m = self.param("w_m", zeros_init, (h, d))
        b_m = self.param("b_m", zeros_init, (d,))
        w_a = self.param("w_a", zeros_init, (h, d))
        b_a = self.param("b_a", zeros_init, (d,))
        m = hid @ (w_m * mask_o) + b_m
        a = hid @ (w_a * mask_o) + b_a
        return m, jnp.clip(a, -A_CLAMP, A_CLAMP)
