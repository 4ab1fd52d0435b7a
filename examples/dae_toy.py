"""Swiss-roll DAE score matching (reference notebooks/dae_toy.ipynb).

Trains an unconditional (fixed-sigma, annealed max->min) DAE on swiss-roll
samples and visualizes the learned score field as a quiver plot. The whole
annealed training loop runs as one jitted lax.scan.

Run: python examples/dae_toy.py [--score-type grad|res] [--iterations N]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def swissroll_sampler(key, n, noise=0.5):
    """make_swiss_roll(...)[:, [0, 2]] / 3 (notebook cell 2), jax-native."""
    k1, k2 = jax.random.split(key)
    t = 1.5 * jnp.pi * (1.0 + 2.0 * jax.random.uniform(k1, (n,)))
    pts = jnp.stack([t * jnp.cos(t), t * jnp.sin(t)], axis=1)
    return (pts + noise * jax.random.normal(k2, (n, 2))) / 3.0


def train(score_type="grad", iterations=5000, batch_size=256, num_sigma=10,
          hidden_dim=128, lr=0.005, sigma_max=5.0, sigma_min=0.05,
          sigma_annealing=4000, log_interval=500, seed=0, log=print):
    from ardae_tpu.models.cdae import MLPGradDAE, MLPResDAE
    from ardae_tpu.models.cdae.cardae import dae_loss
    from ardae_tpu.train.optim import torch_adam

    ctor = MLPGradDAE if score_type == "grad" else MLPResDAE
    dae = ctor(input_dim=2, h_dim=hidden_dim, num_hidden_layers=3,
               nonlinearity="softplus")
    key = jax.random.PRNGKey(seed)
    params = dae.init(key, jnp.zeros((4, 2)), None, jnp.zeros((4, 1)))
    tx = torch_adam(lr, b1=0.9)
    opt = tx.init(params)

    def body(carry, i_ep):
        params, opt = carry
        k = jax.random.fold_in(key, i_ep)
        k1, k2 = jax.random.split(k)
        x = swissroll_sampler(k1, batch_size)
        perc = jnp.minimum((i_ep + 1) / float(sigma_annealing), 1.0)
        sigma = sigma_max * (1 - perc) + sigma_min * perc
        xr = jnp.broadcast_to(x[:, None, :], (batch_size, num_sigma, 2))
        xr = xr.reshape(batch_size * num_sigma, 2)
        loss, grads = jax.value_and_grad(
            lambda p: dae_loss(dae, p, k2, xr, sigma)
        )(params)
        updates, opt = tx.update(grads, opt, params)
        params = jax.tree.map(lambda p, u: p + u, params, updates)
        return (params, opt), (loss, sigma)

    @jax.jit
    def run_chunk(params, opt, steps):
        return jax.lax.scan(body, (params, opt), steps)

    losses = []
    for start in range(0, iterations, log_interval):
        steps = jnp.arange(start, min(start + log_interval, iterations))
        (params, opt), (ls, sg) = run_chunk(params, opt, steps)
        losses.append(float(ls[-1]))
        log(f"| {int(steps[-1])+1:5d}/{iterations} | sigma {float(sg[-1]):5.3f} "
            f"| loss (dae) {losses[-1]:5.3f}")
    return dae, params, losses


def score_field(dae, params, val=5.0, nbins=41, sigma=0.0):
    from ardae_tpu.models.cdae.cardae import dae_score

    lin = np.linspace(-val, val, nbins)
    xs, ys = np.meshgrid(lin, lin)
    pts = jnp.asarray(np.stack([xs.ravel(), ys.ravel()], 1), jnp.float32)
    grad = np.asarray(dae_score(dae, params, pts, sigma))
    return grad, xs, ys


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--score-type", default="grad", choices=["grad", "res"])
    ap.add_argument("--iterations", type=int, default=5000)
    ap.add_argument("--out", default="dae_toy_quiver.png")
    args = ap.parse_args()
    dae, params, _ = train(score_type=args.score_type,
                           iterations=args.iterations)
    grad, xs, ys = score_field(dae, params)
    from ardae_tpu.utils.visualization import get_quiver_plot

    img = get_quiver_plot(grad, xs, ys, xlim=5, ylim=5)
    import matplotlib.image

    matplotlib.image.imsave(args.out, img)
    print(f"score-field quiver saved to {args.out}")


if __name__ == "__main__":
    main()
