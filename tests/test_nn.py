"""Shape/semantics tests for the nn layer zoo."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ardae_tpu.nn import (
    MLP,
    WNMLP,
    ResMLP,
    ContextBilinearMLP,
    ContextConcatMLP,
    ContextResMLP,
    ContextScaleMLP,
    ContextSPScaleMLP,
    ContextSPWNScaleMLP,
    ContextSWNBilinearMLP,
    ContextWNBilinearMLP,
    ContextWNScaleMLP,
    Linear,
    WeightNormalizedLinear,
    NormalHead,
    BernoulliHead,
    clip_logvar,
    get_nonlinear_func,
)

KEY = jax.random.PRNGKey(0)


def _init_apply(module, *args):
    params = module.init(KEY, *args)
    return module.apply(params, *args), params


def test_linear_init_stats():
    x = jnp.ones((2, 64))
    mod = Linear(32)
    params = mod.init(KEY, x)
    k = params["params"]["kernel"]
    bound = 1.0 / np.sqrt(64)
    assert float(jnp.max(jnp.abs(k))) <= bound + 1e-6
    assert k.shape == (64, 32)


def test_weightnorm_linear_norm_rows():
    x = jax.random.normal(KEY, (4, 8))
    mod = WeightNormalizedLinear(6, norm=True)
    y, params = _init_apply(mod, x)
    assert y.shape == (4, 6)
    # scale starts at 1 -> output equals x @ normalized_direction + bias
    d = params["params"]["direction"]
    b = params["params"]["bias"]
    dn = d / jnp.sqrt(jnp.sum(d**2, axis=0, keepdims=True))
    np.testing.assert_allclose(y, x @ dn + b, rtol=1e-5)


@pytest.mark.parametrize("nhl", [0, 1, 3])
def test_mlp_shapes(nhl):
    x = jnp.ones((5, 7))
    y, _ = _init_apply(MLP(hidden_dim=16, output_dim=3, num_hidden_layers=nhl), x)
    assert y.shape == (5, 3)


def test_mlp_gaussian_out_init():
    x = jnp.ones((5, 7))
    mod = MLP(hidden_dim=16, output_dim=3, num_hidden_layers=1, gaussian_out_init=True)
    params = mod.init(KEY, x)
    fc_kernel = params["params"]["fc"]["kernel"]
    assert float(jnp.std(fc_kernel)) > 0.5  # N(0,1), not U(+-1/4)


@pytest.mark.parametrize(
    "cls",
    [
        ContextConcatMLP,
        ContextResMLP,
        ContextScaleMLP,
        ContextWNScaleMLP,
        ContextSPScaleMLP,
        ContextSPWNScaleMLP,
        ContextBilinearMLP,
        ContextWNBilinearMLP,
        ContextSWNBilinearMLP,
    ],
)
def test_context_mlps(cls):
    x = jax.random.normal(KEY, (5, 4))
    ctx = jax.random.normal(jax.random.PRNGKey(1), (5, 3))
    mod = cls(hidden_dim=8, output_dim=2, num_hidden_layers=2)
    y, _ = _init_apply(mod, x, ctx)
    assert y.shape == (5, 2)
    assert bool(jnp.all(jnp.isfinite(y)))


@pytest.mark.parametrize("cls", [WNMLP, ResMLP])
def test_other_mlps(cls):
    x = jax.random.normal(KEY, (5, 4))
    y, _ = _init_apply(cls(hidden_dim=8, output_dim=2, num_hidden_layers=2), x)
    assert y.shape == (5, 2)


def test_normal_head():
    h = jax.random.normal(KEY, (3, 10))
    (mu, logvar), _ = _init_apply(NormalHead(4), h)
    assert mu.shape == (3, 4) and logvar.shape == (3, 4)


def test_bernoulli_head():
    h = jax.random.normal(KEY, (3, 10))
    logit, _ = _init_apply(BernoulliHead(4), h)
    assert logit.shape == (3, 4)


def test_clip_logvar_modes():
    lv = jnp.array([-10.0, 0.0, 10.0])
    np.testing.assert_allclose(clip_logvar(lv, "hard"), [-4.0, 0.0, 2.0])
    spm4 = clip_logvar(lv, "spm4")
    assert float(spm4[0]) > -4.1 and float(spm4[0]) < -3.9
    assert abs(float(clip_logvar(lv, "tanh")[2]) - 1.0) < 1e-4
    np.testing.assert_allclose(clip_logvar(lv, "none"), lv)


def test_nonlinearities():
    x = jnp.array([-1.0, 0.0, 1.0])
    for name in ["relu", "elu", "tanh", "softplus", "csoftplus", "leaky_relu", "swish"]:
        y = get_nonlinear_func(name)(x)
        assert y.shape == x.shape
    np.testing.assert_allclose(
        get_nonlinear_func("leaky_relu")(jnp.array([-1.0])), [-0.2], rtol=1e-6
    )
