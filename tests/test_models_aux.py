"""Aux (hierarchical) model tests: IVAE variants + baseline VAEs + registry."""

import jax
import jax.numpy as jnp
import pytest

from ardae_tpu.models.ivae import api as ivae_api
from ardae_tpu.models.ivae.aux import (
    MNISTAuxIPVAE,
    MNISTConvAuxIPVAE,
    MNISTResConvAuxIPVAE,
    ToyAuxIPVAE,
)
from ardae_tpu.models.registry import (
    IVAE_MODELS,
    build_cdae,
    build_ivae_model,
    build_vae_model,
    context_dim_for,
)
from ardae_tpu.models.vae.aux import (
    MNISTAuxVAE,
    MNISTConvAuxVAE,
    MNISTResConvAuxVAE,
    ToyAuxVAE,
    aux_logprob_iwae,
    aux_vae_loss,
)

KEY = jax.random.PRNGKey(0)
XI = jax.random.bernoulli(KEY, 0.3, (2, 784)).astype(jnp.float32)
XT = jax.random.normal(KEY, (2, 2))


def _init_aux_ivae(model, x):
    eps = (jnp.zeros((x.shape[0], model.noise_dim)),
           jnp.zeros((x.shape[0], model.z_dim)))
    return model.init(KEY, x, eps)


@pytest.mark.parametrize("ctor,x,nd", [
    (lambda: ToyAuxIPVAE(input_dim=2, noise_dim=2, h_dim=16, z_dim=2,
                         num_hidden_layers=2), XT, 2),
    (lambda: MNISTAuxIPVAE(input_dim=784, noise_dim=8, h_dim=32, z_dim=4,
                           num_hidden_layers=2), XI, 8),
    (lambda: MNISTConvAuxIPVAE(z0_dim=8, z_dim=4), XI, 8),
    (lambda: MNISTResConvAuxIPVAE(z0_dim=8, z_dim=4, c_dim=32), XI, 8),
    (lambda: MNISTResConvAuxIPVAE(z0_dim=8, z_dim=4, c_dim=32, clipped=True), XI, 8),
])
@pytest.mark.slow
def test_aux_ivae_forward_hidden_iws(ctor, x, nd):
    model = ctor()
    params = _init_aux_ivae(model, x)

    loss, terms = ivae_api.ivae_loss(model, params, KEY, x, nz=3)
    assert jnp.isfinite(loss)
    assert terms["z"].shape == (2, 3, model.z_dim)

    # deterministic encode must be noise-free
    z1 = ivae_api.encode_det(model, params, x)
    z2 = ivae_api.encode_det(model, params, x)
    assert jnp.allclose(z1, z2)

    # hidden1a features
    h = ivae_api.encode_hidden_feats(model, params, x)
    assert h.shape[0] == 2 and h.ndim == 2

    lp = ivae_api.logprob_iws(model, params, KEY, x, sample_size=8, jitter=1e-5)
    assert jnp.isfinite(lp)


def test_aux_hidden_dims_match_registry():
    for name, nd, expected in [("auxmnist", 8, 2 * 32), ("auxconv", 8, 1600)]:
        model = build_ivae_model(name, nchannels=1, nheight=28, z_dim=4,
                                 h_dim=32, n_dim=nd, n_layers=2, nonlin="softplus")
        params = _init_aux_ivae(model, XI)
        h = ivae_api.encode_hidden_feats(model, params, XI)
        if name == "auxmnist":
            assert h.shape == (2, expected)
        else:
            assert h.shape == (2, expected)


@pytest.mark.parametrize("ctor,x", [
    (lambda: ToyAuxVAE(input_dim=2, noise_dim=2, h_dim=16, z_dim=2,
                       num_hidden_layers=2), XT),
    (lambda: MNISTAuxVAE(input_dim=784, noise_dim=8, h_dim=32, z_dim=4,
                         num_hidden_layers=2), XI),
    (lambda: MNISTConvAuxVAE(z0_dim=8, z_dim=4), XI),
    (lambda: MNISTResConvAuxVAE(z0_dim=8, z_dim=4, c_dim=32), XI),
])
def test_aux_vae_loss_and_iwae(ctor, x):
    model = ctor()
    params = model.init(KEY, x)
    loss, terms = aux_vae_loss(model, params, KEY, x)
    assert jnp.isfinite(loss)
    lp = aux_logprob_iwae(model, params, KEY, x, sample_size=8)
    assert jnp.isfinite(lp)


def test_registry_builds_every_ivae_name():
    for name in IVAE_MODELS:
        is_image = name != "mlp-concat" and name != "auxmlp"
        kw = dict(nchannels=1, nheight=28, z_dim=4, h_dim=16, n_dim=8,
                  n_layers=2, nonlin="elu" if "resconv" in name else "softplus")
        if not is_image:
            kw.update(nchannels=2, nheight=1, nonlin="relu")
        model = build_ivae_model(name, **kw)
        assert model is not None


def test_registry_vae_names_and_toy_maf():
    for name in ("toy", "toy-maf", "mnist", "conv", "resconv", "resconvct",
                 "auxtoy", "auxmnist", "auxconv", "auxresconv", "auxresconvct"):
        kw = dict(nchannels=1, nheight=28, z_dim=4, h_dim=16, n_dim=8,
                  n_layers=2, nonlin="elu" if "resconv" in name else "softplus")
        if name in ("toy", "toy-maf", "auxtoy"):
            kw.update(nchannels=2, nheight=1)
        assert build_vae_model(name, **kw) is not None
    # toy-maf is unregistered/broken in the reference; ours is a working
    # conditional-MAF model (models/vae/maf.py, documented extension)


def test_context_dims():
    assert context_dim_for("data", model_name="mnist-conv", nchannels=1,
                           nheight=28, z_dim=32, h_dim=300) == 784
    assert context_dim_for("lt0", model_name="mnist-conv", nchannels=1,
                           nheight=28, z_dim=32, h_dim=300) == 32
    assert context_dim_for("hidden1a", model_name="auxmnist", nchannels=1,
                           nheight=28, z_dim=32, h_dim=300) == 600
    assert context_dim_for("hidden1a", model_name="auxresconv", nchannels=1,
                           nheight=28, z_dim=32, h_dim=300) == 450
    assert context_dim_for("hidden1a", model_name="auxconv", nchannels=1,
                           nheight=28, z_dim=32, h_dim=300) == 1600


def test_build_cdae():
    for name in ("mlp-res", "mlp-grad"):
        assert build_cdae(name, input_dim=4, context_dim=6) is not None
