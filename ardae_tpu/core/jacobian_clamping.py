"""Finite-difference Jacobian-clamping penalty (Odena et al. 2018).

TPU-first equivalent of /root/reference/utils/jacobian_clamping.py:9-114.
Penalizes directional squared-Jacobian norms of a sampler that fall below
eta_min: loss = mean(minrelu(|f(z+EPS*u)-f(z)|^2/(EPS^2 |u|^2) - eta_min)^2).

The reference plumbs this through every model's --lmbd-* flags but leaves
each model's jac_clamping_loss raising NotImplementedError (e.g.
models/ivae/conv.py:181-182) — dormant there; fully functional here.
"""

import jax
import jax.numpy as jnp


def minrelu(x):
    """(reference :9-10)"""
    return -jax.nn.relu(-x)


def _penalty(x_diff, perturb, eps, eta_min):
    numel = x_diff.shape[0]
    unjac_l2sq = jnp.sum(x_diff.reshape(numel, -1) ** 2, axis=1) / (eps**2)
    per_l2sq = jnp.sum(perturb.reshape(numel, -1) ** 2, axis=1)
    jac_l2sq = unjac_l2sq / per_l2sq
    return jnp.mean(minrelu(jac_l2sq - eta_min) ** 2)


def jac_clamping_loss(forward, key, x, z, num_pert_samples, eta_min,
                      eps=0.01, postprocessing=None):
    """Unconditional variant (reference :12-62).

    forward: f(z_rows) -> x_rows; x: (bsz, x_dim) = f(z); z: (bsz, z_dim).
    """
    bsz, zdim = z.shape
    numel = bsz * num_pert_samples
    perturb = jax.random.normal(key, (bsz, num_pert_samples, zdim))
    z_bar = (z[:, None, :] + eps * perturb).reshape(numel, zdim)
    x_rep = jnp.broadcast_to(x[:, None, :], (bsz, num_pert_samples, x.shape[-1]))
    x_rep = x_rep.reshape(numel, -1)
    x_bar = forward(z_bar)
    if postprocessing is not None:
        x_rep, x_bar = postprocessing(x_rep), postprocessing(x_bar)
    return _penalty(x_bar - x_rep, perturb, eps, eta_min)


def cond_jac_clamping_loss(forward, key, x, ctx, z, num_z_samples,
                           num_pert_samples, eta_min, eps=0.01,
                           postprocessing=None):
    """Conditional variant (reference :64-114).

    forward: f(ctx, z_rows, num_z_samples, num_pert_samples) -> x_rows;
    x, z: (bsz*num_z_samples, dim); ctx: (bsz, ctx_dim).
    """
    bsz = ctx.shape[0]
    zdim = z.shape[-1]
    rows = bsz * num_z_samples
    numel = rows * num_pert_samples
    perturb = jax.random.normal(key, (rows, num_pert_samples, zdim))
    z_bar = (z[:, None, :] + eps * perturb).reshape(numel, zdim)
    x_rep = jnp.broadcast_to(x[:, None, :], (rows, num_pert_samples, x.shape[-1]))
    x_rep = x_rep.reshape(numel, -1)
    x_bar = forward(ctx, z_bar, num_z_samples, num_pert_samples)
    if postprocessing is not None:
        x_rep, x_bar = postprocessing(x_rep), postprocessing(x_bar)
    return _penalty(x_bar - x_rep, perturb, eps, eta_min)
