"""Gaussian-baseline side of the image-scale aux pair, on the SAME items.

Companion to scripts/aux_parity_eval_ours_mnist.py: evaluates a cli.vae
auxmnist (Gaussian hierarchical posterior) experiment with its exact-density
hierarchical IWAE logprob (models/vae/aux.py:aux_logprob_iwae — the law the
reference's vae.py evaluator applies to this model, reference
models/vae/auxmnist.py:381-451) on the SAME eval set the implicit
head-to-head scores: the first 500 v3-surrogate val items binarized once
with numpy rng(1234). This removes the item-set/binarization confound when
comparing the implicit rows (reference-law cov-Gaussian eval) against the
Gaussian baseline rows: same 500 binary images, same sample count.

`--law cov` additionally scores the SAME checkpoint under the IMPLICIT
side's estimator (the reference's cov-Gaussian pseudo-posterior law,
auxmnist.py:297-358: fit N(mu,cov) to 64 posterior z draws, re-sample,
importance-weight) so the cross-law estimator gap of the pair table is
itself measured rather than assumed small.

Usage:
  python scripts/aux_parity_eval_baseline_mnist.py <experiment_dir> \
      [checkpoint|best-checkpoint] [--seed N] [--lr LR] [--law exact|cov]
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from ardae_tpu.data.mnist import get_mnist
from ardae_tpu.io.checkpoint import load_checkpoint
from ardae_tpu.models.registry import build_vae_model
from ardae_tpu.models.vae.aux import aux_logprob_iwae
from ardae_tpu.train.optim import build_optimizer
from ardae_tpu.train.state import TrainState

# must match the queue2 baseline flags (cli.vae auxmnist head-to-head runs)
Z_DIM, H_MODEL, NOISE_DIM, NHL = 32, 300, 100, 2
N_EVAL_ITEMS, SS = 500, 64


def main():
    exp_dir = sys.argv[1]
    flavor = sys.argv[2] if len(sys.argv) > 2 and not sys.argv[2].startswith("--") \
        else "checkpoint"
    seed = 0
    if "--seed" in sys.argv:
        seed = int(sys.argv[sys.argv.index("--seed") + 1])
    lr = 1e-4
    if "--lr" in sys.argv:
        lr = float(sys.argv[sys.argv.index("--lr") + 1])
    law = "exact"
    if "--law" in sys.argv:
        law = sys.argv[sys.argv.index("--law") + 1]

    model = build_vae_model(
        "auxmnist", nchannels=1, nheight=28, z_dim=Z_DIM, h_dim=H_MODEL,
        n_dim=NOISE_DIM, n_layers=NHL, nonlin="softplus", clip_logvar="none")
    key = jax.random.PRNGKey(seed)
    x0 = jnp.zeros((4, 784), jnp.float32)
    params = model.init(key, x0)
    tx = build_optimizer("adam", lr, beta1=0.5)
    state = TrainState(
        step=jnp.zeros([], jnp.int32), params_model=params,
        opt_model=tx.init(params), params_cdae={}, opt_cdae=(),
        avg_params_model=None, avg_count=None)
    restored = load_checkpoint(state, exp_dir, flavor)
    if restored is None:
        sys.exit(f"no {flavor} under {exp_dir}")
    state, meta = restored
    print(f"loaded {flavor} at i_ep={meta['i_ep']}")
    params_eval = (state.params_model if state.avg_params_model is None
                   else state.avg_params_model)

    data = get_mnist("dbmnist-val5k", root="data")
    val_probs = np.asarray(data["val"][:N_EVAL_ITEMS], np.float32)
    val_bin = jnp.asarray(
        (np.random.default_rng(1234).random(val_probs.shape) < val_probs)
        .astype(np.float32))

    if law == "cov":
        # the implicit side's estimator applied to the Gaussian baseline:
        # draw SS hierarchical posterior samples, then hand them to the SAME
        # fit-N(mu,cov)/floor/reweight code path the implicit rows are scored
        # with (models/ivae/api.cov_gaussian_iws_from_draws; jitter=1e-5 is
        # the aux-family value, reference auxmnist.py:297-358)
        from ardae_tpu.core.rng import sample_gaussian
        from ardae_tpu.models.ivae.api import cov_gaussian_iws_from_draws

        def cov_law(p, x, k):
            bsz = x.shape[0]
            k0, k1, k_new = jax.random.split(k, 3)
            feats = model.apply(p, x, method=model.trunk_feats)
            mu0, lv0 = model.apply(p, feats, method=model.aux_params)
            mu0r = jnp.repeat(mu0, SS, axis=0)
            lv0r = jnp.repeat(lv0, SS, axis=0)
            z0 = sample_gaussian(k0, mu0r, lv0r)
            mu, lv = model.apply(p, feats, z0, SS, method=model.main_params)
            z = sample_gaussian(k1, mu, lv).reshape(bsz, SS, Z_DIM)
            return jnp.mean(
                cov_gaussian_iws_from_draws(model, p, x, z, k_new, jitter=1e-5))

        fn = jax.jit(cov_law)
        label = "cov-Gaussian (implicit-side) law"
    else:
        fn = jax.jit(lambda p, x, k: aux_logprob_iwae(model, p, k, x, SS))
        label = "exact-q hierarchical law"
    tot = 0.0
    k = jax.random.PRNGKey(seed + 100)
    for lo in range(0, val_bin.shape[0], 50):
        k, sub = jax.random.split(k)
        chunk = val_bin[lo:lo + 50]
        tot += float(fn(params_eval, chunk, sub)) * chunk.shape[0]
    print(f"BASELINE auxmnist val IWS-{SS} ({label}, "
          f"seed {seed}): {tot / val_bin.shape[0]:.4f}")


if __name__ == "__main__":
    main()
