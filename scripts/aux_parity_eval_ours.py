"""Reference-law IWS eval of an ardae_tpu auxmlp checkpoint.

Companion to scripts/ref_parity_aux_toy.py: evaluates a CLI-trained auxmlp
experiment with the REFERENCE toy-aux evaluator's exact law
(models/ivae/auxtoy.py:295-361): the pseudo-posterior covariance is
estimated from sample_size**2 implicit draws (the toy-aux quirk; our
api.logprob_iws uses sample_size draws), jitter 1e-5*I, sample_size newz
draws, log-mean-exp with the reference's +1e-10 floor. This makes the two
sides of the aux head-to-head share one yardstick.

Usage:
  python scripts/aux_parity_eval_ours.py <experiment_dir> [checkpoint|
      best-checkpoint] [--seed N]
"""
import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from ardae_tpu.core.stats import covmat, logprob_gaussian, mvn_logprob
from ardae_tpu.io.checkpoint import load_checkpoint
from ardae_tpu.models import registry
from ardae_tpu.models.ivae import api as ivae_api
from ardae_tpu.train.optim import build_optimizer
from ardae_tpu.train.state import create_train_state

# must match the harness flags (ref_parity_aux_toy.py)
Z_DIM, H_MODEL, NOISE_DIM, NHL = 2, 64, 10, 2
H_CDAE, CDAE_NHL = 64, 3
SS = 64  # iws samples


def gen25(n, rng):
    lin = np.linspace(-4.0, 4.0, 5)
    xv, yv = np.meshgrid(lin, lin)
    mu = np.stack([xv.ravel(), yv.ravel()], 1)
    lab = rng.integers(0, 25, n)
    return (mu[lab] + math.sqrt(0.1) * rng.normal(size=(n, 2))).astype(np.float32)


def logprob_reference_law(model, params, key, x, ss):
    """auxtoy.py logprob_w_cov_gaussian_posterior, vectorized over items."""
    bsz = x.shape[0]
    zdim = model.z_dim
    k_enc, k_new = jax.random.split(key)
    # cov estimated from ss^2 implicit draws (the reference passes
    # nz=sample_size into the toy-aux encoder, which returns nz^2 samples)
    z = ivae_api.sample_latents(model, params, k_enc, x, ss * ss)
    mu_qz = jnp.mean(z, axis=1)
    cov = jax.vmap(covmat)(z) + 1e-5 * jnp.eye(zdim)
    chol = jnp.linalg.cholesky(cov)
    eps = jax.random.normal(k_new, (bsz, ss, zdim))
    newz = mu_qz[:, None, :] + jnp.einsum("bij,bsj->bsi", chol, eps)
    logposterior = jax.vmap(mvn_logprob)(newz, mu_qz, chol)
    logprior = jnp.sum(logprob_gaussian(0.0, 0.0, newz), axis=-1)
    mu_x, logvar_x = model.apply(params, newz.reshape(bsz * ss, zdim),
                                 method=model.decode_params)
    mu_x = mu_x.reshape(bsz, ss, -1)
    logvar_x = logvar_x.reshape(bsz, ss, -1)
    target = jnp.broadcast_to(x.reshape(bsz, 1, -1), mu_x.shape)
    loglik = jnp.sum(logprob_gaussian(mu_x, logvar_x, target), axis=-1)
    logw = loglik + logprior - logposterior
    m = jnp.max(logw, axis=1, keepdims=True)
    lp = jnp.log(jnp.mean(jnp.exp(logw - m), axis=1, keepdims=True) + 1e-10) + m
    return jnp.mean(lp)


def main():
    exp_dir = sys.argv[1]
    flavor = sys.argv[2] if len(sys.argv) > 2 and not sys.argv[2].startswith("--") \
        else "checkpoint"
    seed = 0
    if "--seed" in sys.argv:
        seed = int(sys.argv[sys.argv.index("--seed") + 1])

    model = registry.build_ivae_model(
        "auxmlp", nchannels=2, nheight=1, z_dim=Z_DIM, h_dim=H_MODEL,
        n_dim=NOISE_DIM, n_layers=NHL, nonlin="softplus")
    ctx_dim = registry.context_dim_for(
        "hidden1a", model_name="auxmlp", nchannels=2, nheight=1,
        z_dim=Z_DIM, h_dim=H_MODEL)
    cdae = registry.build_cdae("mlp-res", input_dim=Z_DIM, context_dim=ctx_dim,
                               h_dim=H_CDAE, n_layers=CDAE_NHL,
                               nonlin="softplus")
    key = jax.random.PRNGKey(seed)
    x0 = jnp.zeros((4, 2), jnp.float32)
    eps0 = ivae_api.make_eps(model, key, 4, 1)
    params_model = model.init(key, x0, eps0, None)
    params_cdae = cdae.init(key, jnp.zeros((4, Z_DIM)),
                            jnp.zeros((4, ctx_dim)), jnp.zeros((4, 1)))
    opt_m = build_optimizer("adam", 1e-3, beta1=0.9)
    opt_d = build_optimizer("rmsprop", 1e-4, momentum=0.9)
    state = create_train_state(params_model, opt_m, params_cdae, opt_d)
    restored = load_checkpoint(state, exp_dir, flavor)
    if restored is None:
        sys.exit(f"no {flavor} under {exp_dir}")
    state, meta = restored
    print(f"loaded {flavor} at i_ep={meta['i_ep']}")
    params_eval = (state.params_model if state.avg_params_model is None
                   else state.avg_params_model)

    rng = np.random.default_rng(7)
    _ = gen25(200_000, rng)  # advance the rng exactly like training data gen
    test = jnp.asarray(gen25(500, rng))

    fn = jax.jit(lambda p, x, k: logprob_reference_law(model, p, x=x, key=k,
                                                       ss=SS))
    tot = 0.0
    k = jax.random.PRNGKey(seed + 100)
    for lo in range(0, test.shape[0], 100):
        k, sub = jax.random.split(k)
        chunk = test[lo:lo + 100]
        tot += float(fn(params_eval, chunk, sub)) * chunk.shape[0]
    print(f"OURS aux test IWS-64 (reference law, seed {seed}):",
          tot / test.shape[0])


if __name__ == "__main__":
    main()
