"""Reference-law IWS eval of an ardae_tpu auxmnist checkpoint (image scale).

Companion to scripts/ref_auxmnist_dbmnist.py: evaluates a CLI-trained
auxmnist experiment with the reference MNIST-aux evaluator's law
(/root/reference/models/ivae/auxmnist.py:297-358 — cov from sample_size
implicit draws, 1e-5 jitter, Bernoulli loglik, +1e-10 floor; our
api.logprob_iws implements exactly this at jitter=1e-5, plus a relative
1e-6·mean-diag floor that is far below the comparability budget) on the SAME
eval set the reference harness scores: the first 500 v3-surrogate val items
binarized once with numpy rng(1234).

Usage:
  python scripts/aux_parity_eval_ours_mnist.py <experiment_dir> \
      [checkpoint|best-checkpoint] [--seed N]
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
from ardae_tpu.models import registry
from ardae_tpu.models.ivae import api as ivae_api
from ardae_tpu.train.optim import build_optimizer
from ardae_tpu.train.state import create_train_state

# must match the harness flags (ref_auxmnist_dbmnist.py)
Z_DIM, H_MODEL, NOISE_DIM, NHL = 32, 300, 100, 2
H_CDAE, CDAE_NHL = 256, 5
N_EVAL_ITEMS, SS = 500, 64


def main():
    exp_dir = sys.argv[1]
    flavor = sys.argv[2] if len(sys.argv) > 2 and not sys.argv[2].startswith("--") \
        else "checkpoint"
    seed = 0
    if "--seed" in sys.argv:
        seed = int(sys.argv[sys.argv.index("--seed") + 1])

    model = registry.build_ivae_model(
        "auxmnist", nchannels=1, nheight=28, z_dim=Z_DIM, h_dim=H_MODEL,
        n_dim=NOISE_DIM, n_layers=NHL, nonlin="softplus")
    ctx_dim = registry.context_dim_for(
        "hidden1a", model_name="auxmnist", nchannels=1, nheight=28,
        z_dim=Z_DIM, h_dim=H_MODEL)
    cdae = registry.build_cdae("mlp-grad", input_dim=Z_DIM, context_dim=ctx_dim,
                               h_dim=H_CDAE, n_layers=CDAE_NHL,
                               nonlin="softplus")
    key = jax.random.PRNGKey(seed)
    x0 = jnp.zeros((4, 784), jnp.float32)
    eps0 = ivae_api.make_eps(model, key, 4, 1)
    params_model = model.init(key, x0, eps0, None)
    params_cdae = cdae.init(key, jnp.zeros((4, Z_DIM)),
                            jnp.zeros((4, ctx_dim)), jnp.zeros((4, 1)))
    opt_m = build_optimizer("adam", 1e-4, beta1=0.5)
    opt_d = build_optimizer("rmsprop", 1e-4, momentum=0.5)
    state = create_train_state(params_model, opt_m, params_cdae, opt_d)
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

    fn = jax.jit(lambda p, x, k: ivae_api.logprob_iws(
        model, p, k, x, SS, jitter=1e-5))
    tot = 0.0
    k = jax.random.PRNGKey(seed + 100)
    for lo in range(0, val_bin.shape[0], 50):
        k, sub = jax.random.split(k)
        chunk = val_bin[lo:lo + 50]
        tot += float(fn(params_eval, chunk, sub)) * chunk.shape[0]
    print(f"OURS auxmnist val IWS-{SS} (reference law, seed {seed}): "
          f"{tot / val_bin.shape[0]:.4f}")


if __name__ == "__main__":
    main()
