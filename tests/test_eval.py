"""IWS evaluator tests (SURVEY.md hard part 5)."""

import jax
import jax.numpy as jnp
import numpy as np

from ardae_tpu.core.losses import iwae_bound
from ardae_tpu.core.stats import logprob_gaussian
from ardae_tpu.models.ivae import api as ivae_api
from ardae_tpu.models.ivae.toy import ToyIPVAE
from ardae_tpu.models.vae.api import logprob_iwae, vae_loss
from ardae_tpu.models.vae.toy import ToyVAE

KEY = jax.random.PRNGKey(0)


def _toy_ipvae():
    model = ToyIPVAE(input_dim=2, noise_dim=2, h_dim=16, z_dim=2,
                     nonlinearity="tanh", num_hidden_layers=2, enc_type="concat")
    x = jax.random.normal(KEY, (3, 2))
    params = model.init(KEY, x, jnp.zeros((3, 2)))
    return model, params, x


def test_logprob_iws_finite_and_scalar():
    model, params, x = _toy_ipvae()
    lp = ivae_api.logprob_iws(model, params, KEY, x, sample_size=64)
    assert lp.shape == ()
    assert bool(jnp.isfinite(lp))


def test_logprob_iws_matches_prior_sampling_estimate():
    """Both the cov-Gaussian IWS bound and brute-force prior sampling estimate
    log p(x); with many samples on a 2-D latent they must agree closely."""
    model, params, x = _toy_ipvae()
    ssz = 4096
    lp_iws = float(ivae_api.logprob_iws(model, params, KEY, x, sample_size=ssz))

    # brute force: log p(x) ~= log mean_k p(x | z_k), z_k ~ N(0, I)
    k = jax.random.PRNGKey(9)
    bsz = x.shape[0]
    z = jax.random.normal(k, (bsz, ssz, 2))
    mu, logvar = model.apply(params, z.reshape(-1, 2), method=model.decode_params)
    mu = mu.reshape(bsz, ssz, 2)
    logvar = logvar.reshape(bsz, ssz, 2)
    ll = jnp.sum(logprob_gaussian(mu, logvar, x[:, None, :]), axis=-1)
    lp_prior = float(jnp.mean(iwae_bound(ll, axis=1)))

    assert abs(lp_iws - lp_prior) < 0.25, (lp_iws, lp_prior)


def test_vae_iwae_logprob_close_to_neg_elbo():
    """For a Gaussian-posterior VAE, IWAE_k >= ELBO (monotone in k)."""
    model = ToyVAE(input_dim=2, h_dim=16, z_dim=2, num_hidden_layers=2)
    x = jax.random.normal(KEY, (8, 2))
    params = model.init(KEY, x)
    loss, terms = vae_loss(model, params, KEY, x)
    neg_elbo = float(terms["recon"] + terms["kld"])
    lp64 = float(logprob_iwae(model, params, KEY, x, 64))
    lp1024 = float(logprob_iwae(model, params, jax.random.PRNGKey(5), x, 1024))
    # IWAE bound must beat (or match) the single-sample ELBO, and improve with k
    assert lp64 > -neg_elbo - 0.5
    assert lp1024 >= lp64 - 0.05


def test_ivae_generate_shapes():
    model, params, _ = _toy_ipvae()
    sample, mu, z = ivae_api.generate(model, params, KEY, 7)
    assert sample.shape == (7, 2) and mu.shape == (7, 2) and z.shape == (7, 2)
