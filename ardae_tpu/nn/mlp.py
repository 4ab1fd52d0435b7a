"""MLP-family modules (reference models/layers.py:477-1101).

Shared shape law: ``num_hidden_layers`` hidden layers of width ``hidden_dim``
followed by one output layer ``fc``; ``use_nonlinearity_output`` applies the
activation after fc. ``num_hidden_layers == 0`` means a single input->output
layer. Context variants re-inject the context at every layer.

``gaussian_out_init=True`` reproduces the reference models' reset_parameters
pattern of drawing the *final layer kernel(s)* from N(0,1) while leaving
biases at the torch default (e.g. models/ivae/toy.py:146-147).
"""

import flax.linen as nn
import jax.numpy as jnp

from ardae_tpu.nn.activations import get_nonlinear_func
from ardae_tpu.nn.initializers import normal_init
from ardae_tpu.nn.linear import (
    ContextLinear,
    ContextResLinear,
    ContextSoftPlusLinear,
    ContextSoftPlusWeightNormalizedLinear,
    ContextWeightNormalizedLinear,
    Linear,
    ResLinear,
    SimplifiedBilinear,
    StackedWeightNormalizedSimplifiedBilinear,
    WeightNormalizedLinear,
    WeightNormalizedSimplifiedBilinear,
)

_N01 = normal_init(1.0)


class MLP(nn.Module):
    """xavier=True switches every layer to xavier-uniform kernels + zero
    biases (the reference's weight_init, models/ivae/mnist.py:20-25)."""

    hidden_dim: int
    output_dim: int
    nonlinearity: str = "relu"
    num_hidden_layers: int = 1
    use_nonlinearity_output: bool = False
    gaussian_out_init: bool = False
    xavier: bool = False

    @nn.compact
    def __call__(self, x):
        from ardae_tpu.nn.initializers import xavier_uniform_init, zeros_init

        afun = get_nonlinear_func(self.nonlinearity)
        xav = (
            dict(kernel_init=xavier_uniform_init, bias_init=zeros_init)
            if self.xavier
            else {}
        )
        x = x.reshape(x.shape[0], -1)
        h = x
        for i in range(self.num_hidden_layers):
            h = afun(Linear(self.hidden_dim, **xav, name=f"layers_{i}")(h))
        out_kwargs = dict(xav)
        if self.gaussian_out_init:
            out_kwargs["kernel_init"] = _N01
        out = Linear(self.output_dim, **out_kwargs, name="fc")(h)
        if self.use_nonlinearity_output:
            out = afun(out)
        return out


class WNMLP(nn.Module):
    hidden_dim: int
    output_dim: int
    nonlinearity: str = "relu"
    num_hidden_layers: int = 1
    use_nonlinearity_output: bool = False
    use_norm_output: bool = False

    @nn.compact
    def __call__(self, x):
        afun = get_nonlinear_func(self.nonlinearity)
        x = x.reshape(x.shape[0], -1)
        h = x
        for i in range(self.num_hidden_layers):
            h = afun(WeightNormalizedLinear(self.hidden_dim, name=f"layers_{i}")(h))
        out = WeightNormalizedLinear(self.output_dim, norm=self.use_norm_output, name="fc")(h)
        if self.use_nonlinearity_output:
            out = afun(out)
        return out


class ResMLP(nn.Module):
    hidden_dim: int
    output_dim: int
    nonlinearity: str = "relu"
    num_hidden_layers: int = 1
    use_nonlinearity_output: bool = False
    layer: str = "wnlinear"
    use_norm: bool = False
    use_norm_output: bool = False

    @nn.compact
    def __call__(self, x):
        afun = get_nonlinear_func(self.nonlinearity)
        x = x.reshape(x.shape[0], -1)
        h = x
        prev_dim = x.shape[-1]
        for i in range(self.num_hidden_layers):
            h = afun(
                ResLinear(
                    self.hidden_dim,
                    same_dim=prev_dim == self.hidden_dim,
                    oper=self.layer,
                    norm=self.use_norm,
                    name=f"layers_{i}",
                )(h)
            )
            prev_dim = self.hidden_dim
        out = ResLinear(
            self.output_dim,
            same_dim=prev_dim == self.output_dim,
            oper=self.layer,
            norm=self.use_norm_output,
            name="fc",
        )(h)
        if self.use_nonlinearity_output:
            out = afun(out)
        return out


class ContextConcatMLP(nn.Module):
    """Concat the context onto every layer input (reference models/layers.py:681-724)."""

    hidden_dim: int
    output_dim: int
    nonlinearity: str = "relu"
    num_hidden_layers: int = 1
    use_nonlinearity_output: bool = False
    gaussian_out_init: bool = False

    @nn.compact
    def __call__(self, x, ctx):
        afun = get_nonlinear_func(self.nonlinearity)
        x = x.reshape(x.shape[0], -1)
        ctx = ctx.reshape(ctx.shape[0], -1)
        h = x
        for i in range(self.num_hidden_layers):
            h = afun(Linear(self.hidden_dim, name=f"layers_{i}")(jnp.concatenate([h, ctx], axis=1)))
        out = Linear(
            self.output_dim,
            kernel_init=_N01 if self.gaussian_out_init else None,
            name="fc",
        )(jnp.concatenate([h, ctx], axis=1))
        if self.use_nonlinearity_output:
            out = afun(out)
        return out


class ContextResMLP(nn.Module):
    hidden_dim: int
    output_dim: int
    nonlinearity: str = "relu"
    num_hidden_layers: int = 1
    use_nonlinearity_output: bool = False
    use_norm: bool = False
    use_norm_output: bool = False

    @nn.compact
    def __call__(self, x, ctx):
        afun = get_nonlinear_func(self.nonlinearity)
        x = x.reshape(x.shape[0], -1)
        ctx = ctx.reshape(ctx.shape[0], -1)
        h = x
        prev_dim = x.shape[-1]
        for i in range(self.num_hidden_layers):
            h = afun(
                ContextResLinear(
                    self.hidden_dim,
                    same_dim=prev_dim == self.hidden_dim,
                    norm=self.use_norm,
                    name=f"layers_{i}",
                )(h, ctx)
            )
            prev_dim = self.hidden_dim
        out = ContextResLinear(
            self.output_dim,
            same_dim=prev_dim == self.output_dim,
            norm=self.use_norm_output,
            name="fc",
        )(h, ctx)
        if self.use_nonlinearity_output:
            out = afun(out)
        return out


class _ContextLayerMLP(nn.Module):
    """Shared driver for the Context{Scale,WNScale,SPScale,SPWNScale}MLPs."""

    hidden_dim: int
    output_dim: int
    nonlinearity: str = "relu"
    num_hidden_layers: int = 3
    use_nonlinearity_output: bool = False
    gaussian_out_init: bool = False

    def _layer(self, features, name, is_out):
        raise NotImplementedError

    @nn.compact
    def __call__(self, x, ctx):
        afun = get_nonlinear_func(self.nonlinearity)
        x = x.reshape(x.shape[0], -1)
        ctx = ctx.reshape(ctx.shape[0], -1)
        h = x
        for i in range(self.num_hidden_layers):
            h = afun(self._layer(self.hidden_dim, f"layers_{i}", False)(h, ctx))
        out = self._layer(self.output_dim, "fc", True)(h, ctx)
        if self.use_nonlinearity_output:
            out = afun(out)
        return out


class ContextScaleMLP(_ContextLayerMLP):
    """FiLM at every layer (reference models/layers.py:726-778).

    gaussian_out_init reproduces models/ivae/toy.py:233-237: the output
    layer's cbias kernel and direction drawn from N(0,1).
    """

    def _layer(self, features, name, is_out):
        if is_out and self.gaussian_out_init:

            class _GaussOutContextLinear(nn.Module):
                features: int

                @nn.compact
                def __call__(self, x, ctx):
                    fan_in = x.shape[-1]
                    direction = self.param("direction", _N01, (fan_in, self.features))
                    scale = 1.0 + Linear(
                        self.features,
                        use_bias=False,
                        kernel_init=normal_init(0.005),
                        name="cscale",
                    )(ctx)
                    bias = Linear(self.features, kernel_init=_N01, name="cbias")(ctx)
                    return scale * (x @ direction) + bias

            return _GaussOutContextLinear(features, name=name)
        return ContextLinear(features, name=name)


class ContextWNScaleMLP(_ContextLayerMLP):
    def _layer(self, features, name, is_out):
        return ContextWeightNormalizedLinear(features, name=name)


class ContextSPScaleMLP(_ContextLayerMLP):
    def _layer(self, features, name, is_out):
        return ContextSoftPlusLinear(features, name=name)


class ContextSPWNScaleMLP(_ContextLayerMLP):
    def _layer(self, features, name, is_out):
        return ContextSoftPlusWeightNormalizedLinear(features, name=name)


class ContextBilinearMLP(_ContextLayerMLP):
    """SimplifiedBilinear at every layer (reference models/layers.py:932-986)."""

    def _layer(self, features, name, is_out):
        if is_out and self.gaussian_out_init:

            class _GaussOutBilinear(nn.Module):
                features: int

                @nn.compact
                def __call__(self, x1, x2):
                    y1 = Linear(self.features, kernel_init=_N01, name="path1")(x1)
                    y2 = Linear(self.features, use_bias=False, kernel_init=_N01, name="path2")(x2)
                    return y1 + y2

            return _GaussOutBilinear(features, name=name)
        return SimplifiedBilinear(features, name=name)


class ContextWNBilinearMLP(_ContextLayerMLP):
    def _layer(self, features, name, is_out):
        if is_out and self.gaussian_out_init:

            class _GaussOutWNBilinear(nn.Module):
                features: int

                @nn.compact
                def __call__(self, x1, x2):
                    f1, f2 = x1.shape[-1], x2.shape[-1]
                    path1 = self.param("path1", _N01, (f1, self.features))
                    path2 = self.param("path2", _N01, (f2, self.features))
                    from ardae_tpu.nn.linear import _row_normalize
                    from ardae_tpu.nn.initializers import torch_bias_init

                    bias = self.param("bias", torch_bias_init(f1), (self.features,))
                    return x1 @ path1 + x2 @ _row_normalize(path2) + bias

            return _GaussOutWNBilinear(features, name=name)
        return WeightNormalizedSimplifiedBilinear(features, name=name)


class ContextSWNBilinearMLP(_ContextLayerMLP):
    def _layer(self, features, name, is_out):
        return StackedWeightNormalizedSimplifiedBilinear(
            hid_features=self.hidden_dim,
            features=features,
            fc_kernel_init=_N01 if (is_out and self.gaussian_out_init) else None,
            name=name,
        )
