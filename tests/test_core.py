"""Closed-form unit tests for core losses/stats/energies (SURVEY.md 4a)."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import ardae_tpu.core as core
from ardae_tpu.core import (
    annealing_func,
    covmat,
    energy_func4,
    iwae_bound,
    logprob_gaussian,
    loss_entropy_gaussian,
    loss_kld_gaussian,
    loss_kld_gaussian_vs_gaussian,
    loss_recon_bernoulli_with_logit,
    loss_recon_gaussian,
    normal_energy_func,
)
from ardae_tpu.core.stats import mvn_logprob
from ardae_tpu.core.rng import sample_gaussian, sample_laplace

_LOG_2PI = math.log(2.0 * math.pi)


def test_kld_unit_gaussian_is_zero():
    mu = jnp.zeros((4, 3))
    logvar = jnp.zeros((4, 3))
    np.testing.assert_allclose(loss_kld_gaussian(mu, logvar), np.zeros(4), atol=1e-7)


def test_kld_closed_form():
    mu = jnp.array([[1.0, -2.0]])
    logvar = jnp.array([[0.5, -0.3]])
    expected = -0.5 * np.sum(1 + np.array(logvar) - np.array(mu) ** 2 - np.exp(logvar))
    np.testing.assert_allclose(loss_kld_gaussian(mu, logvar)[0], expected, rtol=1e-6)


def test_kld_vs_gaussian_self_is_zero():
    mu = jnp.array([[0.3, -1.2]])
    logvar = jnp.array([[0.1, 0.7]])
    out = loss_kld_gaussian_vs_gaussian(mu, logvar, mu, logvar)
    np.testing.assert_allclose(out, np.zeros(1), atol=1e-7)


def test_kld_vs_standard_matches_kld():
    mu = jnp.array([[0.3, -1.2]])
    logvar = jnp.array([[0.1, 0.7]])
    zero = jnp.zeros_like(mu)
    np.testing.assert_allclose(
        loss_kld_gaussian_vs_gaussian(mu, logvar, zero, zero),
        loss_kld_gaussian(mu, logvar),
        rtol=1e-6,
    )


def test_recon_bernoulli_matches_manual_bce():
    logit = jnp.array([[0.5, -1.0, 3.0]])
    x = jnp.array([[1.0, 0.0, 0.5]])
    p = jax.nn.sigmoid(logit)
    expected = -np.sum(np.array(x) * np.log(np.array(p)) + (1 - np.array(x)) * np.log(1 - np.array(p)))
    np.testing.assert_allclose(loss_recon_bernoulli_with_logit(logit, x)[0], expected, rtol=1e-5)


def test_recon_gaussian_is_neg_logpdf():
    mu = jnp.array([[0.5]])
    logvar = jnp.array([[0.3]])
    x = jnp.array([[1.7]])
    expected = -float(logprob_gaussian(mu, logvar, x)[0, 0])
    np.testing.assert_allclose(loss_recon_gaussian(mu, logvar, x)[0], expected, rtol=1e-6)


def test_logprob_gaussian_standard_normal_at_zero():
    val = logprob_gaussian(jnp.zeros(()), jnp.zeros(()), jnp.zeros(()))
    np.testing.assert_allclose(val, -0.5 * _LOG_2PI, rtol=1e-6)


def test_normal_energy_is_neg_standard_logpdf():
    x = jnp.array([[0.7, -0.3]])
    expected = -np.sum(np.array(logprob_gaussian(jnp.zeros((1, 2)), jnp.zeros((1, 2)), x)))
    np.testing.assert_allclose(normal_energy_func(x)[0], expected, rtol=1e-6)


def test_entropy_gaussian_unit():
    logvar = jnp.zeros((2, 3))
    expected = 3 * 0.5 * (1 + _LOG_2PI)
    np.testing.assert_allclose(loss_entropy_gaussian(logvar), np.full(2, expected), rtol=1e-6)


def test_covmat_matches_numpy():
    rng = np.random.default_rng(0)
    m = rng.normal(size=(200, 5)).astype(np.float32)
    np.testing.assert_allclose(covmat(jnp.asarray(m)), np.cov(m, rowvar=False), rtol=1e-4)


def test_mvn_logprob_matches_diag_case():
    mu = jnp.array([0.5, -1.0])
    cov = jnp.diag(jnp.array([2.0, 0.5]))
    chol = jnp.linalg.cholesky(cov)
    z = jnp.array([[1.0, 0.0], [0.0, 1.0]])
    expected = np.sum(
        np.array(logprob_gaussian(mu, jnp.log(jnp.diagonal(cov)), z)), axis=-1
    )
    np.testing.assert_allclose(mvn_logprob(z, mu, chol), expected, rtol=1e-5)


def test_iwae_bound_exact_on_constant_weights():
    logw = jnp.full((3, 16), -2.0)
    np.testing.assert_allclose(iwae_bound(logw), np.full(3, -2.0), rtol=1e-5)


def test_iwae_bound_linear_gaussian_converges():
    # x = z + eps with z,eps ~ N(0,1): log p(x) = log N(x; 0, 2).
    key = jax.random.PRNGKey(0)
    x = 1.3
    n = 200_000
    z = jax.random.normal(key, (1, n))
    loglik = logprob_gaussian(z, jnp.zeros(()), jnp.full((1, n), x))
    bound = float(iwae_bound(loglik)[0])
    exact = float(logprob_gaussian(jnp.zeros(()), jnp.log(jnp.asarray(2.0)), jnp.asarray(x)))
    assert abs(bound - exact) < 0.02


def test_annealing_func():
    assert annealing_func(0.0, 1.0, 100, 0) == pytest.approx(0.0)
    assert annealing_func(0.0, 1.0, 100, 50) == pytest.approx(0.5)
    assert float(annealing_func(0.0, 1.0, 100, 200)) == pytest.approx(1.0)
    assert annealing_func(0.0, 1.0, None, 3) == pytest.approx(1.0)


def test_energy_func4_shape_and_box_penalty():
    x = jnp.array([[0.0, 0.0], [10.0, 0.0]])
    e = energy_func4(x)
    assert e.shape == (2, 1)
    assert float(e[1, 0]) > float(e[0, 0]) + 10.0  # box penalty kicks in


def test_sample_gaussian_moments():
    key = jax.random.PRNGKey(1)
    mu = jnp.full((100_000,), 2.0)
    logvar = jnp.full((100_000,), math.log(4.0))
    s = sample_gaussian(key, mu, logvar)
    assert abs(float(jnp.mean(s)) - 2.0) < 0.05
    assert abs(float(jnp.std(s)) - 2.0) < 0.05


def test_sample_laplace_moments():
    key = jax.random.PRNGKey(2)
    s = sample_laplace(key, (200_000,))
    assert abs(float(jnp.mean(s))) < 0.02
    assert abs(float(jnp.var(s)) - 2.0) < 0.1  # Var of unit Laplace = 2b^2 = 2


def test_aux_loss_for_grad_contract():
    """d/dx aux_loss_for_grad(x, g) == g exactly; no gradient to g
    (reference models/aux.py:42-58 smoke test equivalent)."""
    from ardae_tpu.core.aux_grad import aux_loss_for_grad

    x = jnp.array([[1.0, -2.0], [0.5, 3.0]])
    g = jnp.array([[0.1, 0.2], [-0.3, 0.4]])
    dx = jax.grad(lambda xx: aux_loss_for_grad(xx, g))(x)
    np.testing.assert_allclose(dx, g)
    dg = jax.grad(lambda gg: aux_loss_for_grad(x, gg))(g)
    np.testing.assert_allclose(dg, np.zeros_like(g))


def test_shuffle_permutes_columns_independently():
    """Each column is a permutation of the original (reference utils/stat.py:9)."""
    key = jax.random.PRNGKey(3)
    z = jnp.arange(24.0).reshape(8, 3)
    out = core.shuffle(key, z)
    for i in range(3):
        assert sorted(np.asarray(out[:, i]).tolist()) == \
            sorted(np.asarray(z[:, i]).tolist())
    assert not np.allclose(np.asarray(out), np.asarray(z))


def test_marginal_entropy_gaussian_single_kernel():
    """With one kernel the marginal reduces to the plain Gaussian logprob
    (reference utils/stat.py:54-63, 87-96)."""
    mu = jnp.zeros((1, 2))
    logvar = jnp.zeros((1, 2))
    z = jnp.asarray([[0.5, -1.0], [2.0, 0.0]])
    exact = -core.logprob_gaussian(jnp.zeros(2), jnp.zeros(2), z)
    got = core.loss_marginal_entropy_gaussian(mu, logvar, z, reduce="none")
    np.testing.assert_allclose(np.asarray(got), np.asarray(exact), rtol=1e-4)
    got2 = core.loss_approx_marginal_entropy_gaussian(mu, logvar, z, reduce="none")
    np.testing.assert_allclose(np.asarray(got2), np.asarray(exact), rtol=1e-5)


def test_loss_recon_bernoulli_matches_logit_version():
    key = jax.random.PRNGKey(5)
    logit = jax.random.normal(key, (4, 7))
    x = jax.random.bernoulli(jax.random.PRNGKey(6), 0.5, (4, 7)).astype(jnp.float32)
    via_logit = jnp.sum(core.loss_recon_bernoulli_with_logit(logit, x))
    via_prob = core.loss_recon_bernoulli(jax.nn.sigmoid(logit), x)
    np.testing.assert_allclose(float(via_prob), float(via_logit), rtol=1e-4)
