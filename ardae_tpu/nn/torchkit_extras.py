"""Remaining torchkit-vendored primitives (reference models/layers2.py).

These complete the layer inventory (SURVEY.md 2.5): CWNlinear / CWNconv2d
(context scale+bias over a row-normalized weight), WNBilinear (weight-
normalized true bilinear form), GatingLinear (sigmoid-gated WN linear).
SequentialFlow / ContextWrapper / Slice / Lambda / Reshape are torch
Sequential plumbing with no JAX counterpart needed — flax composition and
jnp slicing express them directly.
"""

import math

import flax.linen as nn
import jax
import jax.numpy as jnp

from ardae_tpu.nn.initializers import normal_init, torch_bias_init
from ardae_tpu.nn.linear import Linear, WeightNormalizedLinear, _row_normalize


class CWNlinear(nn.Module):
    """(reference models/layers2.py:95-135): out = cscale(ctx) * (x @ W_norm)
    + cbias(ctx); direction ~ N(0, 0.001), cscale/cbias kernels ~ N(0, 0.001)."""

    features: int
    norm: bool = True

    @nn.compact
    def __call__(self, x, ctx):
        fan_in = x.shape[-1]
        direction = self.param("direction", normal_init(0.001),
                               (fan_in, self.features))
        w = _row_normalize(direction) if self.norm else direction
        scale = Linear(self.features, kernel_init=normal_init(0.001),
                       name="cscale")(ctx)
        bias = Linear(self.features, kernel_init=normal_init(0.001),
                      name="cbias")(ctx)
        return scale * (x @ w) + bias


class CWNconv2d(nn.Module):
    """(reference models/layers2.py:267-303): per-channel context scale+bias
    over a normalized conv. NHWC; ctx is (N, ctx_dim)."""

    features: int
    kernel_size: int
    stride: int = 1
    padding: int = 0
    norm: bool = True

    @nn.compact
    def __call__(self, x, ctx):
        from ardae_tpu.nn.initializers import torch_conv_kernel_init

        in_ch = x.shape[-1]
        k = self.kernel_size
        direction = self.param("direction", torch_conv_kernel_init,
                               (k, k, in_ch, self.features))
        if self.norm:
            nrm = jnp.sqrt(jnp.sum(direction**2, axis=(0, 1, 2), keepdims=True))
            weight = direction / nrm
        else:
            weight = direction
        pre = jax.lax.conv_general_dilated(
            x, weight, (self.stride, self.stride),
            [(self.padding, self.padding)] * 2,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        scale = Linear(self.features, name="cscale")(ctx)[:, None, None, :]
        bias = Linear(self.features, name="cbias")(ctx)[:, None, None, :]
        return pre * scale + bias


class WNBilinear(nn.Module):
    """True bilinear form with weight-normalized slices
    (reference models/layers2.py:139-173): out_o = scale_o *
    <x1, W_o x2> / ||W_o|| + bias_o."""

    features: int
    use_bias: bool = True

    @nn.compact
    def __call__(self, x1, x2):
        f1, f2 = x1.shape[-1], x2.shape[-1]
        bound = 1.0 / math.sqrt(f1)

        def dir_init(key, shape, dtype=jnp.float32):
            return jax.random.uniform(key, shape, dtype, -bound, bound)

        direction = self.param("direction", dir_init, (self.features, f1, f2))
        scale = self.param("scale", lambda k, s: jnp.ones(s), (self.features,))
        nrm = jnp.sqrt(jnp.sum(direction**2, axis=(1, 2), keepdims=True))
        weight = direction / nrm * scale[:, None, None]
        out = jnp.einsum("ni,oij,nj->no", x1, weight, x2)
        if self.use_bias:
            bias = self.param("bias", torch_bias_init(f1), (self.features,))
            out = out + bias
        return out


class GatingLinear(nn.Module):
    """sigmoid(gate(x)) * dot(x), both weight-normalized
    (reference models/layers2.py:355-369)."""

    features: int

    @nn.compact
    def __call__(self, x):
        h = WeightNormalizedLinear(self.features, name="dot")(x)
        s = jax.nn.sigmoid(WeightNormalizedLinear(self.features, name="gate")(x))
        return s * h


# ---------------------------------------------------------------------------
# torchkit Sequential plumbing (reference models/layers2.py:373-462).
# In JAX these are mostly expressible as plain composition, but working
# equivalents are provided so every layers2 export has a counterpart.
# ---------------------------------------------------------------------------


class Reshape(nn.Module):
    """(reference models/layers2.py:373-380): fixed-shape view."""

    shape: tuple

    def __call__(self, x):
        return x.reshape(self.shape)


class Slice(nn.Module):
    """(reference models/layers2.py:383-396): stored-slice indexing."""

    slc: tuple

    def __call__(self, x):
        return x[self.slc]


class _SliceFactory:
    def __getitem__(self, slc):
        return Slice(slc if isinstance(slc, tuple) else (slc,))


#: ``slicer[:, :, :-1, :-1]`` -> a Slice module (reference layers2.py:399)
slicer = _SliceFactory()


class Lambda(nn.Module):
    """(reference models/layers2.py:402-409): wrap a pure function."""

    function: callable

    def __call__(self, x):
        return self.function(x)


class ContextWrapper(nn.Module):
    """Thread a (input, context) pair through a context-free module
    (reference models/layers2.py:441-448)."""

    module: nn.Module

    def __call__(self, inputs):
        x, ctx = inputs
        return self.module(x), ctx


class SequentialFlow(nn.Module):
    """Chain of flow blocks over (x, logdet, context) triples with a
    prior-sampling entry point (reference models/layers2.py:412-438).

    Each block must map (x, logdet, context) -> (x, logdet, context).
    ``sample`` draws x ~ N(0, I) with logdet ~ U(0,1) seed values exactly
    like the reference (np.random.rand for lgd) and pushes the triple
    through the chain.
    """

    blocks: tuple
    dim: int = 2
    context_dim: int = 1

    def __call__(self, inputs):
        x, logdet, ctx = inputs
        for block in self.blocks:
            x, logdet, ctx = block((x, logdet, ctx))
        return x, logdet, ctx

    def sample(self, key, n: int = 1, context=None):
        k1, k2 = jax.random.split(key)
        x = jax.random.normal(k1, (n, self.dim))
        logdet = jax.random.uniform(k2, (n,))
        if context is None:
            context = jnp.zeros((n, self.context_dim))
        return self((x, logdet, context))
