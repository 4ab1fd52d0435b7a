"""Energy-function fitting with an implicit sampler + AR-DAE entropy gradient
(reference notebooks/ardae_fit.ipynb) — the third workload family.

An implicit generator g(z), z~N(0,I), is trained to match the density
exp(-energy_func4): the loss is alpha * E[energy(x)] minus the (intractable)
entropy, whose gradient is injected via a res-ARDAE trained by denoising
score matching on generator samples. Alternation: num_dae_updates DSM steps
then one generator step with the stop-gradient entropy surrogate; adam +
StepLR(5000, 0.5) for the generator, rmsprop(momentum=0.5) for the DAE —
notebook cells 6-10 exactly. One jitted lax.scan per log interval.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def train(iterations=50000, batch_size=1024, num_dae_updates=2, num_sigma=10,
          z_dim=10, hidden_dim=256, lr=0.001, delta=0.1,
          alpha_annealing=20000, log_interval=5000, seed=0, log=print,
          energy=None):
    import flax.linen as nn

    from ardae_tpu.core.annealing import annealing_func
    from ardae_tpu.core.energy import energy_func4
    from ardae_tpu.models.cdae import MLPResARDAE
    from ardae_tpu.models.cdae.cardae import dae_loss, dae_score
    from ardae_tpu.nn.mlp import MLP
    from ardae_tpu.train.optim import step_lr, torch_adam, torch_rmsprop

    energy_func = energy or energy_func4

    class Generator(nn.Module):
        """z -> x sampler MLP (notebook cell 4)."""

        @nn.compact
        def __call__(self, z):
            return MLP(hidden_dim=hidden_dim, output_dim=2,
                       nonlinearity="relu", num_hidden_layers=3, name="main")(z)

    gen = Generator()
    dae = MLPResARDAE(input_dim=2, h_dim=hidden_dim, num_hidden_layers=3,
                      nonlinearity="softplus")
    key = jax.random.PRNGKey(seed)
    pg = gen.init(key, jnp.zeros((4, z_dim)))
    pd = dae.init(key, jnp.zeros((4, 2)), None, jnp.zeros((4, 1)))

    tx_g = torch_adam(step_lr(lr, 5000, 0.5, min_lr=1e-10), b1=0.5)
    tx_d = torch_rmsprop(lr, momentum=0.5)
    og, od = tx_g.init(pg), tx_d.init(pd)

    def body(carry, i_ep):
        pg, og, pd, od = carry
        k = jax.random.fold_in(key, i_ep)
        alpha = annealing_func(0.01, 1.0, alpha_annealing, i_ep)

        # PHASE A: num_dae_updates DSM steps on fresh generator samples
        def dae_step(i, val):
            pd, od = val
            kk = jax.random.fold_in(k, i)
            k1, k2, k3 = jax.random.split(kk, 3)
            x = gen.apply(pg, jax.random.normal(k1, (batch_size, z_dim)))
            x = jax.lax.stop_gradient(x)
            sigma = delta * jax.random.normal(k2, (batch_size * num_sigma, 1))
            xr = jnp.broadcast_to(
                x[:, None, :], (batch_size, num_sigma, 2)
            ).reshape(batch_size * num_sigma, 2)
            dloss, grads = jax.value_and_grad(
                lambda p: dae_loss(dae, p, k3, xr, sigma)
            )(pd)
            updates, od2 = tx_d.update(grads, od, pd)
            return jax.tree.map(lambda p, u: p + u, pd, updates), od2

        pd, od = jax.lax.fori_loop(0, num_dae_updates, dae_step, (pd, od))
        # recompute the last dae loss for logging
        k1, k2, k3 = jax.random.split(jax.random.fold_in(k, 777), 3)
        x_log = jax.lax.stop_gradient(
            gen.apply(pg, jax.random.normal(k1, (batch_size, z_dim))))
        sigma_log = delta * jax.random.normal(k2, (batch_size * num_sigma, 1))
        xr = jnp.broadcast_to(x_log[:, None, :], (batch_size, num_sigma, 2))
        dae_loss_val = dae_loss(dae, pd, k3, xr.reshape(-1, 2), sigma_log)

        # PHASE B: generator step with entropy-grad surrogate
        kg = jax.random.fold_in(k, 999)

        def loss_fn(pg):
            x = gen.apply(pg, jax.random.normal(kg, (batch_size, z_dim)))
            model_loss = jnp.mean(energy_func(x))
            score = jax.lax.stop_gradient(
                dae_score(dae, pd, jax.lax.stop_gradient(x), 0.0))
            aux = jnp.sum(score * x) / batch_size
            return alpha * model_loss + aux, model_loss

        (_, model_loss), grads = jax.value_and_grad(loss_fn, has_aux=True)(pg)
        updates, og2 = tx_g.update(grads, og, pg)
        pg = jax.tree.map(lambda p, u: p + u, pg, updates)
        return (pg, og2, pd, od), (model_loss, dae_loss_val, alpha)

    @jax.jit
    def run_chunk(carry, steps):
        return jax.lax.scan(body, carry, steps)

    carry = (pg, og, pd, od)
    losses = []
    for start in range(0, iterations, log_interval):
        steps = jnp.arange(start, min(start + log_interval, iterations))
        carry, (ml, dl, al) = run_chunk(carry, steps)
        losses.append((float(ml[-1]), float(dl[-1])))
        log(f"| {int(steps[-1])+1:5d}/{iterations} | delta {delta:5.3f} "
            f"| alpha {float(al[-1]):5.3f} | loss (model) {losses[-1][0]:5.3f} "
            f"| loss (dae) {losses[-1][1]:5.3f}")
    pg, og, pd, od = carry
    return gen, pg, dae, pd, losses


def sample(gen, pg, n, z_dim=10, seed=1):
    k = jax.random.PRNGKey(seed)
    out = []
    for i in range(0, n, 65536):
        kk = jax.random.fold_in(k, i)
        m = min(65536, n - i)
        out.append(np.asarray(gen.apply(pg, jax.random.normal(kk, (m, z_dim)))))
    return np.concatenate(out)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iterations", type=int, default=50000)
    ap.add_argument("--out", default="ardae_fit_hist.png")
    args = ap.parse_args()
    gen, pg, dae, pd, _ = train(iterations=args.iterations)
    xs = sample(gen, pg, 1_000_000)
    from ardae_tpu.utils.visualization import get_2d_histogram_plot
    import matplotlib.image

    img = get_2d_histogram_plot(xs, val=4, num=256)
    matplotlib.image.imsave(args.out, img)
    print(f"sample histogram saved to {args.out}")


if __name__ == "__main__":
    main()
