"""Swiss-roll AR-DAE score matching (reference notebooks/ardae_toy.ipynb).

Same as dae_toy but sigma-conditioned: sigma ~ delta*N(0,1) per row, the DAE
receives sigma as an input, and the learned field can be queried at any
noise level (including sigma=0: the data score).
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from examples.dae_toy import score_field, swissroll_sampler


def train(score_type="grad", iterations=5000, batch_size=256, num_sigma=10,
          hidden_dim=128, lr=0.005, delta=1.0, log_interval=500, seed=0,
          log=print):
    from ardae_tpu.models.cdae import MLPGradARDAE, MLPResARDAE
    from ardae_tpu.models.cdae.cardae import dae_loss
    from ardae_tpu.train.optim import torch_adam

    ctor = MLPGradARDAE if score_type == "grad" else MLPResARDAE
    dae = ctor(input_dim=2, h_dim=hidden_dim, num_hidden_layers=3,
               nonlinearity="softplus")
    key = jax.random.PRNGKey(seed)
    params = dae.init(key, jnp.zeros((4, 2)), None, jnp.zeros((4, 1)))
    tx = torch_adam(lr, b1=0.9)
    opt = tx.init(params)
    n = batch_size * num_sigma

    def body(carry, i_ep):
        params, opt = carry
        k = jax.random.fold_in(key, i_ep)
        k1, k2, k3 = jax.random.split(k, 3)
        x = swissroll_sampler(k1, batch_size)
        sigma = delta * jax.random.normal(k2, (n, 1))
        xr = jnp.broadcast_to(x[:, None, :], (batch_size, num_sigma, 2))
        xr = xr.reshape(n, 2)
        loss, grads = jax.value_and_grad(
            lambda p: dae_loss(dae, p, k3, xr, sigma)
        )(params)
        updates, opt = tx.update(grads, opt, params)
        params = jax.tree.map(lambda p, u: p + u, params, updates)
        return (params, opt), loss

    @jax.jit
    def run_chunk(params, opt, steps):
        return jax.lax.scan(body, (params, opt), steps)

    losses = []
    for start in range(0, iterations, log_interval):
        steps = jnp.arange(start, min(start + log_interval, iterations))
        (params, opt), ls = run_chunk(params, opt, steps)
        losses.append(float(ls[-1]))
        log(f"| {int(steps[-1])+1:5d}/{iterations} | delta {delta:5.3f} "
            f"| loss (dae) {losses[-1]:5.3f}")
    return dae, params, losses


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--score-type", default="grad", choices=["grad", "res"])
    ap.add_argument("--iterations", type=int, default=5000)
    ap.add_argument("--out-prefix", default="ardae_toy_quiver")
    args = ap.parse_args()
    dae, params, _ = train(score_type=args.score_type,
                           iterations=args.iterations)
    from ardae_tpu.utils.visualization import get_quiver_plot
    import matplotlib.image

    # the notebook plots the field at sigma=0 and sigma=delta (cell 8)
    for sigma in (0.0, 1.0):
        grad, xs, ys = score_field(dae, params, sigma=sigma)
        img = get_quiver_plot(grad, xs, ys, xlim=5, ylim=5)
        out = f"{args.out_prefix}_s{sigma}.png"
        matplotlib.image.imsave(out, img)
        print(f"score field at sigma={sigma} saved to {out}")


if __name__ == "__main__":
    main()
