"""Pallas fused DSM kernel vs the XLA reference path (interpret mode on CPU):
loss values and ALL parameter gradients must match."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ardae_tpu.models.cdae import MLPResCARDAE, cdae_loss
from ardae_tpu.ops.fused_dsm import fused_cdae_dsm_loss, supports_fused_dsm

KEY = jax.random.PRNGKey(0)


def _setup(h=32, L=3, bsz=4, ssz=64, zdim=8, ctx_dim=6, nonlin="softplus"):
    module = MLPResCARDAE(input_dim=zdim, context_dim=ctx_dim, h_dim=h,
                          num_hidden_layers=L, nonlinearity=nonlin)
    params = module.init(KEY, jnp.zeros((4, zdim)), jnp.zeros((4, ctx_dim)),
                         jnp.zeros((4, 1)))
    latent = jax.random.normal(jax.random.PRNGKey(1), (bsz, ssz, zdim))
    ctx = jax.random.normal(jax.random.PRNGKey(2), (bsz, ctx_dim))
    std = 0.3 * jnp.abs(jax.random.normal(jax.random.PRNGKey(3), (bsz, ssz, 1)))
    return module, params, latent, ctx, std


@pytest.mark.slow
@pytest.mark.parametrize("nonlin", ["softplus", "relu", "tanh"])
def test_fused_matches_xla_loss_and_grads(nonlin):
    module, params, latent, ctx, std = _setup(nonlin=nonlin)
    n = latent.shape[0] * latent.shape[1]
    assert supports_fused_dsm(module, n, tile=64)
    key = jax.random.PRNGKey(7)

    def loss_xla(p):
        return cdae_loss(module, p, key, latent, ctx, std)

    def loss_fused(p):
        return fused_cdae_dsm_loss(module, p, key, latent, ctx, std,
                                   tile=64, interpret=True)

    l1, g1 = jax.value_and_grad(loss_xla)(params)
    l2, g2 = jax.value_and_grad(loss_fused)(params)
    # identical RNG key -> identical noise -> identical loss
    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-5)
    flat1 = jax.tree_util.tree_leaves_with_path(g1)
    flat2 = {jax.tree_util.keystr(kp): v
             for kp, v in jax.tree_util.tree_leaves_with_path(g2)}
    for kp, v1 in flat1:
        k = jax.tree_util.keystr(kp)
        v2 = flat2[k]
        np.testing.assert_allclose(np.asarray(v1), np.asarray(v2),
                                   rtol=2e-4, atol=1e-6, err_msg=k)


@pytest.mark.slow
def test_fused_larger_config():
    """Shapes from the sbmnist headline config, scaled down tile-wise."""
    module, params, latent, ctx, std = _setup(h=128, L=5, bsz=8, ssz=128,
                                              zdim=32, ctx_dim=32)
    key = jax.random.PRNGKey(11)
    l1 = float(cdae_loss(module, params, key, latent, ctx, std))
    l2 = float(fused_cdae_dsm_loss(module, params, key, latent, ctx, std,
                                   tile=256, interpret=True))
    np.testing.assert_allclose(l1, l2, rtol=1e-5)


def test_supports_predicate():
    from ardae_tpu.models.cdae import MLPGradCARDAE

    grad_mod = MLPGradCARDAE(input_dim=4, context_dim=4)
    assert not supports_fused_dsm(grad_mod, 512)
    res_mod = MLPResCARDAE(input_dim=4, context_dim=4)
    assert supports_fused_dsm(res_mod, 512)
    assert not supports_fused_dsm(res_mod, 500)  # not tile-divisible


# ---------------------- grad-style fused kernel ----------------------------

from ardae_tpu.models.cdae import MLPGradCARDAE
from ardae_tpu.ops.fused_dsm_grad import (
    fused_cdae_dsm_grad_loss,
    supports_fused_dsm_grad,
)


def _setup_grad(h=32, L=3, bsz=4, ssz=64, zdim=8, ctx_dim=6, nonlin="softplus"):
    module = MLPGradCARDAE(input_dim=zdim, context_dim=ctx_dim, h_dim=h,
                           num_hidden_layers=L, nonlinearity=nonlin)
    params = module.init(KEY, jnp.zeros((4, zdim)), jnp.zeros((4, ctx_dim)),
                         jnp.zeros((4, 1)))
    latent = jax.random.normal(jax.random.PRNGKey(1), (bsz, ssz, zdim))
    ctx = jax.random.normal(jax.random.PRNGKey(2), (bsz, ctx_dim))
    std = 0.3 * jnp.abs(jax.random.normal(jax.random.PRNGKey(3), (bsz, ssz, 1)))
    return module, params, latent, ctx, std


@pytest.mark.parametrize("nonlin", ["softplus", "tanh"])
def test_fused_grad_style_matches_xla(nonlin):
    """Second-order kernel: loss AND every parameter gradient (incl. the
    ctx-encoder path through d/d(ctx_rows)) must match jax.grad of the XLA
    double-backward in fp32."""
    module, params, latent, ctx, std = _setup_grad(nonlin=nonlin)
    n = latent.shape[0] * latent.shape[1]
    assert supports_fused_dsm_grad(module, n, tile=64)
    key = jax.random.PRNGKey(7)

    def loss_xla(p):
        return cdae_loss(module, p, key, latent, ctx, std)

    def loss_fused(p):
        return fused_cdae_dsm_grad_loss(module, p, key, latent, ctx, std,
                                        tile=64, interpret=True,
                                        compute_dtype="float32")

    l1, g1 = jax.value_and_grad(loss_xla)(params)
    l2, g2 = jax.value_and_grad(loss_fused)(params)
    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-5)
    flat1 = jax.tree_util.tree_leaves_with_path(g1)
    flat2 = {jax.tree_util.keystr(kp): v
             for kp, v in jax.tree_util.tree_leaves_with_path(g2)}
    for kp, v1 in flat1:
        k = jax.tree_util.keystr(kp)
        np.testing.assert_allclose(np.asarray(v1), np.asarray(flat2[k]),
                                   rtol=5e-4, atol=1e-6, err_msg=k)


def test_fused_grad_style_relu_second_derivative_zero():
    """relu: phi''=0 — the tangent coupling vanishes; still must match."""
    module, params, latent, ctx, std = _setup_grad(nonlin="relu")
    key = jax.random.PRNGKey(9)
    l1, g1 = jax.value_and_grad(
        lambda p: cdae_loss(module, p, key, latent, ctx, std))(params)
    l2, g2 = jax.value_and_grad(
        lambda p: fused_cdae_dsm_grad_loss(module, p, key, latent, ctx, std,
                                           tile=64, interpret=True,
                                           compute_dtype="float32"))(params)
    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-5)
    for (kp, v1), v2 in zip(jax.tree_util.tree_leaves_with_path(g1),
                            jax.tree.leaves(g2)):
        np.testing.assert_allclose(np.asarray(v1), np.asarray(v2),
                                   rtol=5e-4, atol=1e-6,
                                   err_msg=jax.tree_util.keystr(kp))


@pytest.mark.slow
def test_fused_grad_style_bf16_close():
    """bf16 compute: loss within ~1%, grads correlated (mixed-precision
    training tolerance, same recipe as the XLA bf16 path)."""
    module, params, latent, ctx, std = _setup_grad(h=64, L=5, zdim=16,
                                                   ctx_dim=16)
    key = jax.random.PRNGKey(13)
    l1 = float(cdae_loss(module, params, key, latent, ctx, std))
    l2 = float(fused_cdae_dsm_grad_loss(module, params, key, latent, ctx, std,
                                        tile=64, interpret=True,
                                        compute_dtype="bfloat16"))
    assert abs(l1 - l2) < 0.02 * (1.0 + abs(l1))


# ---------------------- grad-style fused kernel, v2 ------------------------

from ardae_tpu.ops.fused_dsm_grad2 import (
    fused_cdae_dsm_grad_loss2,
    supports_fused_dsm_grad2,
)


@pytest.mark.parametrize("nonlin", ["softplus", "tanh", "relu"])
def test_fused_grad2_matches_xla(nonlin):
    """v2 (item-aligned grid, scratch-chained) second-order kernel: loss and
    every parameter gradient must match jax.grad of the XLA path in fp32."""
    module, params, latent, ctx, std = _setup_grad(nonlin=nonlin)
    key = jax.random.PRNGKey(7)
    l1, g1 = jax.value_and_grad(
        lambda p: cdae_loss(module, p, key, latent, ctx, std))(params)
    l2, g2 = jax.value_and_grad(
        lambda p: fused_cdae_dsm_grad_loss2(module, p, key, latent, ctx, std,
                                            interpret=True,
                                            compute_dtype="float32",
                                            tile=32))(params)
    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-5)
    flat2 = {jax.tree_util.keystr(kp): v
             for kp, v in jax.tree_util.tree_leaves_with_path(g2)}
    for kp, v1 in jax.tree_util.tree_leaves_with_path(g1):
        k = jax.tree_util.keystr(kp)
        np.testing.assert_allclose(np.asarray(v1), np.asarray(flat2[k]),
                                   rtol=5e-4, atol=1e-6, err_msg=k)


@pytest.mark.slow
def test_fused_grad2_sample_axis_padding():
    """ssz not a tile multiple: zero-valued padding rows must be exact no-ops
    for the loss AND every parameter gradient (the At adjoint chain is
    nonzero on padding rows; only its tangent factors vanish)."""
    module, params, latent, ctx, std = _setup_grad(ssz=50)
    key = jax.random.PRNGKey(8)
    l1, g1 = jax.value_and_grad(
        lambda p: cdae_loss(module, p, key, latent, ctx, std))(params)
    l2, g2 = jax.value_and_grad(
        lambda p: fused_cdae_dsm_grad_loss2(module, p, key, latent, ctx, std,
                                            interpret=True,
                                            compute_dtype="float32",
                                            tile=32))(params)
    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-5)
    flat2 = {jax.tree_util.keystr(kp): v
             for kp, v in jax.tree_util.tree_leaves_with_path(g2)}
    for kp, v1 in jax.tree_util.tree_leaves_with_path(g1):
        k = jax.tree_util.keystr(kp)
        np.testing.assert_allclose(np.asarray(v1), np.asarray(flat2[k]),
                                   rtol=5e-4, atol=1e-6, err_msg=k)


def test_supports_fused_grad2_predicate():
    grad_mod = MLPGradCARDAE(input_dim=4, context_dim=4, h_dim=256)
    assert supports_fused_dsm_grad2(grad_mod, 128, 625)
    res_mod = MLPResCARDAE(input_dim=4, context_dim=4, h_dim=256)
    assert not supports_fused_dsm_grad2(res_mod, 128, 625)
    big = MLPGradCARDAE(input_dim=4, context_dim=4, h_dim=1024)
    assert not supports_fused_dsm_grad2(big, 128, 625)
