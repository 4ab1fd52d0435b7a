"""Linear-family primitive layers.

TPU-first re-implementations of the reference layer zoo
(/root/reference/models/layers.py:25-473): plain/weight-normalized linears,
FiLM-style context linears (scale(ctx) * Wx + bias(ctx)), softplus-gated
variants, simplified bilinears, and residual linear blocks. All are single
fused matmuls or sums of matmuls — XLA tiles them straight onto the MXU; the
context "scale" paths are expressed as elementwise multiplies on the matmul
output so they fuse into the surrounding computation.
"""

from typing import Callable, Optional

import flax.linen as nn
import jax.numpy as jnp

from ardae_tpu.nn.initializers import (
    normal_init,
    torch_bias_init,
    torch_kernel_init,
    uniform_bound_init,
)


def _row_normalize(w):
    # w: (in, out); normalize each output row (torch stores (out, in) and
    # normalizes over in-features => normalize over axis 0 here.
    return w / jnp.sqrt(jnp.sum(w**2, axis=0, keepdims=True))


class Linear(nn.Module):
    """nn.Linear with torch-1.2 default init (kernel & bias U(+-1/sqrt(fan_in)))."""

    features: int
    use_bias: bool = True
    kernel_init: Optional[Callable] = None
    bias_init: Optional[Callable] = None

    @nn.compact
    def __call__(self, x):
        fan_in = x.shape[-1]
        kinit = self.kernel_init or torch_kernel_init
        kernel = self.param("kernel", kinit, (fan_in, self.features))
        y = x @ kernel
        if self.use_bias:
            binit = self.bias_init or torch_bias_init(fan_in)
            bias = self.param("bias", binit, (self.features,))
            y = y + bias
        return y


class WeightNormalizedLinear(nn.Module):
    """torchkit WNlinear (reference models/layers.py:25-63).

    weight = scale[:,None] * direction / ||direction||_row (norm=True)
           = scale[:,None] * direction                     (norm=False)
    Init: direction U(+-1/sqrt(fan_in)), scale = 1, bias U(+-1/sqrt(fan_in)).
    """

    features: int
    use_bias: bool = True
    norm: bool = True

    @nn.compact
    def __call__(self, x):
        fan_in = x.shape[-1]
        direction = self.param("direction", torch_kernel_init, (fan_in, self.features))
        scale = self.param("scale", lambda k, s: jnp.ones(s), (self.features,))
        w = _row_normalize(direction) if self.norm else direction
        y = (x @ w) * scale
        if self.use_bias:
            bias = self.param("bias", torch_bias_init(fan_in), (self.features,))
            y = y + bias
        return y


class ResLinear(nn.Module):
    """Residual linear block (reference models/layers.py:66-85).

    out = dot_h1(act(dot_0h(x))) + (x if same_dim else dot_01(x)).
    """

    features: int
    same_dim: bool = False
    use_bias: bool = True
    activation: Callable = nn.relu
    oper: str = "wnlinear"  # 'wnlinear' (norm=False) | 'linear'
    norm: bool = False

    def _make(self, name):
        if self.oper == "wnlinear":
            return WeightNormalizedLinear(
                self.features, use_bias=self.use_bias, norm=self.norm, name=name
            )
        if self.oper == "linear":
            return Linear(self.features, use_bias=self.use_bias, name=name)
        raise NotImplementedError(self.oper)

    @nn.compact
    def __call__(self, x):
        h = self.activation(self._make("dot_0h")(x))
        out = self._make("dot_h1")(h)
        skip = x if self.same_dim else self._make("dot_01")(x)
        return out + skip


class ContextResLinear(nn.Module):
    """Residual linear block with an additive context branch
    (reference models/layers.py:87-111)."""

    features: int
    same_dim: bool = False
    use_bias: bool = True
    activation: Callable = nn.relu
    norm: bool = False

    def _wn(self, name, norm=None):
        return WeightNormalizedLinear(
            self.features,
            use_bias=self.use_bias,
            norm=self.norm if norm is None else norm,
            name=name,
        )

    @nn.compact
    def __call__(self, x, ctx):
        h = self.activation(self._wn("dot_0h")(x))
        outi = self._wn("dot_h1")(h)
        c = self.activation(self._wn("dot_0c")(ctx))
        outc = self._wn("dot_c1")(c)
        skip = x if self.same_dim else self._wn("dot_01")(x)
        return outi + outc + skip


class ContextLinear(nn.Module):
    """FiLM linear: (1 + cscale(ctx)) * (x @ W) + cbias(ctx)
    (reference models/layers.py:115-144). cscale kernel ~ N(0, 0.005)."""

    features: int

    @nn.compact
    def __call__(self, x, ctx):
        fan_in = x.shape[-1]
        direction = self.param("direction", torch_kernel_init, (fan_in, self.features))
        scale = 1.0 + Linear(
            self.features, use_bias=False, kernel_init=normal_init(0.005), name="cscale"
        )(ctx)
        bias = Linear(self.features, name="cbias")(ctx)
        return scale * (x @ direction) + bias


class ContextWeightNormalizedLinear(nn.Module):
    """FiLM with a row-normalized context-scale path
    (reference models/layers.py:176-215)."""

    features: int
    in_norm: bool = False
    ctx_norm: bool = True
    ctx_scale: float = 0.1

    @nn.compact
    def __call__(self, x, ctx):
        fan_in = x.shape[-1]
        ctx_in = ctx.shape[-1]
        direction = self.param("direction", torch_kernel_init, (fan_in, self.features))
        cscale = self.param("cscale", normal_init(0.005), (ctx_in, self.features))
        bias = Linear(self.features, name="cbias")(ctx)
        if self.ctx_norm:
            scale = 1.0 + self.ctx_scale * (ctx @ _row_normalize(cscale))
        else:
            scale = 1.0 + ctx @ cscale
        w = _row_normalize(direction) if self.in_norm else direction
        return scale * (x @ w) + bias


class ContextSoftPlusLinear(nn.Module):
    """softplus(cscale(ctx)) * (x @ W) + cbias(ctx)
    (reference models/layers.py:219-251)."""

    features: int

    @nn.compact
    def __call__(self, x, ctx):
        fan_in = x.shape[-1]
        direction = self.param("direction", torch_kernel_init, (fan_in, self.features))
        scale = nn.softplus(
            Linear(self.features, kernel_init=normal_init(0.005), name="cscale")(ctx)
        )
        bias = Linear(self.features, name="cbias")(ctx)
        return scale * (x @ direction) + bias


class ContextSoftPlusWeightNormalizedLinear(nn.Module):
    """softplus-gated FiLM with row-normalized N(0,1) context scale
    (reference models/layers.py:286-328)."""

    features: int
    in_norm: bool = False
    ctx_norm: bool = True

    @nn.compact
    def __call__(self, x, ctx):
        fan_in = x.shape[-1]
        ctx_in = ctx.shape[-1]
        direction = self.param("direction", torch_kernel_init, (fan_in, self.features))
        cscale = self.param("cscale", normal_init(1.0), (ctx_in, self.features))
        cscalebias = self.param(
            "cscalebias", uniform_bound_init(1.0 / max(ctx_in, 1) ** 0.5), (self.features,)
        )
        bias = Linear(self.features, name="cbias")(ctx)
        w_ctx = _row_normalize(cscale) if self.ctx_norm else cscale
        scale = nn.softplus(ctx @ w_ctx + cscalebias)
        w = _row_normalize(direction) if self.in_norm else direction
        return scale * (x @ w) + bias


class SimplifiedBilinear(nn.Module):
    """path1(x1) + path2(x2) (reference models/layers.py:398-413)."""

    features: int
    use_bias: bool = True

    @nn.compact
    def __call__(self, x1, x2):
        y1 = Linear(self.features, use_bias=self.use_bias, name="path1")(x1)
        y2 = Linear(self.features, use_bias=False, name="path2")(x2)
        return y1 + y2


class WeightNormalizedSimplifiedBilinear(nn.Module):
    """Bilinear sum with optional per-path row normalization
    (reference models/layers.py:415-455; defaults in1_norm=False, in2_norm=True)."""

    features: int
    use_bias: bool = True
    in1_norm: bool = False
    in2_norm: bool = True

    @nn.compact
    def __call__(self, x1, x2):
        f1, f2 = x1.shape[-1], x2.shape[-1]
        path1 = self.param("path1", torch_kernel_init, (f1, self.features))
        path2 = self.param("path2", torch_kernel_init, (f2, self.features))
        w1 = _row_normalize(path1) if self.in1_norm else path1
        w2 = _row_normalize(path2) if self.in2_norm else path2
        y = x1 @ w1 + x2 @ w2
        if self.use_bias:
            bias = self.param("bias", torch_bias_init(f1), (self.features,))
            y = y + bias
        return y


class StackedWeightNormalizedSimplifiedBilinear(nn.Module):
    """fc(act(WNSimplifiedBilinear(x1, x2))) (reference models/layers.py:457-473).

    Note: the reference constructor passes a nonexistent ``norm=`` kwarg to
    WeightNormalizedSimplifiedBilinear and would raise TypeError if used; we
    implement the evident intent (default norm flags) instead.
    """

    hid_features: int
    features: int
    use_bias: bool = True
    activation: Callable = nn.relu
    fc_kernel_init: Optional[Callable] = None

    @nn.compact
    def __call__(self, x1, x2):
        hid = self.activation(
            WeightNormalizedSimplifiedBilinear(
                self.hid_features, use_bias=self.use_bias, name="main"
            )(x1, x2)
        )
        return Linear(self.features, kernel_init=self.fc_kernel_init, name="fc")(hid)
