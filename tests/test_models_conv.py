"""Shape + loss tests for the conv / resconv model families."""

import jax
import jax.numpy as jnp
import pytest

from ardae_tpu.models.ivae import api as ivae_api
from ardae_tpu.models.ivae.conv import ConvIPVAE
from ardae_tpu.models.ivae.resconv import FC_TYPES, ResConvIPVAE
from ardae_tpu.models.vae.api import logprob_iwae, vae_loss
from ardae_tpu.models.vae.conv import MNISTConvVAE
from ardae_tpu.models.vae.resconv import MNISTResConvVAE

KEY = jax.random.PRNGKey(0)
X = jax.random.bernoulli(KEY, 0.3, (2, 784)).astype(jnp.float32)


def test_conv_vae_loss_and_iwae():
    model = MNISTConvVAE(z_dim=8)
    params = model.init(KEY, X)
    loss, terms = vae_loss(model, params, KEY, X)
    assert jnp.isfinite(loss)
    lp = logprob_iwae(model, params, KEY, X, 16)
    assert jnp.isfinite(lp)


def test_conv_ipvae_forward_and_iws():
    model = ConvIPVAE(z_dim=8, noise_dim=16)
    eps = jnp.zeros((2 * 3, 16))
    params = model.init(KEY, X, eps)
    loss, terms = ivae_api.ivae_loss(model, params, KEY, X, nz=3)
    assert jnp.isfinite(loss)
    assert terms["z"].shape == (2, 3, 8)
    lp = ivae_api.logprob_iws(model, params, KEY, X, sample_size=16)
    assert jnp.isfinite(lp)


def test_resconv_vae_loss():
    model = MNISTResConvVAE(z_dim=8, c_dim=64)
    params = model.init(KEY, X)
    loss, terms = vae_loss(model, params, KEY, X)
    assert jnp.isfinite(loss)
    (logit,) = model.apply(params, jnp.zeros((2, 8)), method=model.decode_params)
    assert logit.shape == (2, 784)


@pytest.mark.slow
@pytest.mark.parametrize("fc_type", FC_TYPES)
def test_resconv_ipvae_all_fc_types(fc_type):
    model = ResConvIPVAE(z_dim=4, noise_dim=8, c_dim=32, h_dim=16,
                         num_hidden_layers=2, enc_type=fc_type)
    eps = jnp.zeros((2 * 2, 8))
    params = model.init(KEY, X, eps)
    loss, terms = ivae_api.ivae_loss(model, params, KEY, X, nz=2)
    assert jnp.isfinite(loss)
    assert terms["z"].shape == (2, 2, 4)


def test_resconv_decoder_output_28():
    model = MNISTResConvVAE(z_dim=8, c_dim=32, do_m5bias=True)
    params = model.init(KEY, X)
    (logit,) = model.apply(params, jnp.zeros((1, 8)), method=model.decode_params)
    assert logit.shape == (1, 784)
    # m5bias shifts logits strongly negative on average
    assert float(jnp.mean(logit)) < -1.0


@pytest.mark.slow
def test_every_toy_encoder_fusion_trains_one_step():
    """All 13 toy encoder fusion variants (reference models/ivae/toy.py:111-791
    dispatch): init, implicit sampling shape law, finite ivae loss + grads."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from ardae_tpu.models.ivae import api as ivae_api
    from ardae_tpu.models.ivae.toy import ENC_TYPES, ToyIPVAE

    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (8, 2))
    for et in ENC_TYPES:
        model = ToyIPVAE(input_dim=2, noise_dim=2, h_dim=8, z_dim=2,
                         nonlinearity="tanh", num_hidden_layers=2, enc_type=et)
        params = model.init(key, x, jnp.zeros((8, 2)))
        z = ivae_api.sample_latents(model, params, key, x, nz=5)
        assert z.shape == (8, 5, 2), et

        def loss_f(p):
            loss, _ = ivae_api.ivae_loss(model, p, key, x, nz=3, beta=1.0)
            return loss

        loss, grads = jax.value_and_grad(loss_f)(params)
        assert np.isfinite(float(loss)), et
        gnorm = sum(float(jnp.sum(g * g)) for g in jax.tree.leaves(grads))
        assert np.isfinite(gnorm) and gnorm > 0, et
