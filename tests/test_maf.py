"""ToyMAFVAE / ConditionalMADE: flow correctness + VAE integration.

The reference's toy-maf is unregistered/broken (vae.py:205-212 vs
models/__init__.py); ours is a working conditional-MAF-posterior model
(models/vae/maf.py). These tests pin the flow math: strict autoregressive
masks, exact invertibility with consistent log-dets, identity-at-init, and
the api/CLI integration paths.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ardae_tpu.models.registry import build_vae_model
from ardae_tpu.models.vae import api as vae_api
from ardae_tpu.nn.made import ConditionalMADE


def _rand_params(module, key, *shapes):
    return module.init(key, *(jnp.zeros(s) for s in shapes))


def _perturb(params, key, scale=0.5):
    leaves, treedef = jax.tree.flatten(params)
    keys = jax.random.split(key, len(leaves))
    return jax.tree.unflatten(
        treedef,
        [l + scale * jax.random.normal(k, l.shape) for l, k in zip(leaves, keys)],
    )


def test_made_autoregressive_masks():
    """Jacobian of (m, a) w.r.t. z must be strictly lower-triangular."""
    d, h, c = 4, 16, 6
    made = ConditionalMADE(input_dim=d, hidden_dim=h, nonlinearity="tanh")
    key = jax.random.PRNGKey(0)
    params = made.init(key, jnp.zeros((d,)), jnp.zeros((c,)))
    params = _perturb(params, jax.random.PRNGKey(1))  # break zero-init heads
    ctx = jax.random.normal(jax.random.PRNGKey(2), (c,))

    for out_idx in range(2):
        jac = jax.jacfwd(
            lambda z: made.apply(params, z, ctx)[out_idx]
        )(jax.random.normal(jax.random.PRNGKey(3), (d,)))
        upper = jnp.triu(jac)  # includes diagonal: must ALL be zero (strict)
        assert float(jnp.abs(upper).max()) == 0.0


def test_flow_inverse_forward_roundtrip():
    model = build_vae_model("toy-maf", nchannels=2, nheight=1, z_dim=3,
                            h_dim=16, n_layers=2, nonlin="softplus")
    key = jax.random.PRNGKey(0)
    params = _rand_params(model, key, (5, 2))
    params = _perturb(params, jax.random.PRNGKey(1), scale=0.3)
    ctx = jax.random.normal(jax.random.PRNGKey(2), (5, 16))
    z0 = jax.random.normal(jax.random.PRNGKey(3), (5, 3))

    z, sum_a_inv = model.apply(params, z0, ctx, method=model.flow_inverse)
    z0_back, sum_a_fwd = model.apply(params, z, ctx, method=model.flow_forward)
    np.testing.assert_allclose(np.asarray(z0_back), np.asarray(z0),
                               rtol=1e-5, atol=1e-5)
    # both directions must report the same sum of log-scales
    np.testing.assert_allclose(np.asarray(sum_a_fwd), np.asarray(sum_a_inv),
                               rtol=1e-5, atol=1e-5)


def test_identity_at_init_matches_toyvae_loss():
    """Zero-init heads => each block is the identity; the net flow at init
    is just the inter-block reverse permutation (logdet 0), so q(z|x) is
    still an exact diagonal Gaussian — the model starts at its
    Gaussian-posterior baseline."""
    model = build_vae_model("toy-maf", nchannels=2, nheight=1, z_dim=2,
                            h_dim=16, n_layers=2, nonlin="softplus")
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(jax.random.PRNGKey(1), (7, 2))
    params = model.init(key, x)

    mu, lv, ctx = model.apply(params, x, method=model.encode_ctx)
    z0 = jax.random.normal(jax.random.PRNGKey(2), (7, 2))
    z, sum_a = model.apply(params, z0, ctx, method=model.flow_inverse)
    np.testing.assert_allclose(np.asarray(z), np.asarray(z0[..., ::-1]),
                               atol=1e-7)
    assert float(jnp.abs(sum_a).max()) == 0.0

    loss, terms = vae_api.vae_loss(model, params, jax.random.PRNGKey(3), x)
    assert np.isfinite(float(loss))
    assert np.isfinite(float(terms["kld"]))


def test_flow_density_is_normalized():
    """After perturbing the flow, q(z|x) must still integrate to 1 —
    checked by importance sampling log E_{z0~N(mu,s)}[1] == 0 identity via
    the IWAE bound on a model whose decoder is ignored: directly verify
    sum_a consistency by Monte-Carlo integral of exp(logq) over a grid."""
    model = build_vae_model("toy-maf", nchannels=2, nheight=1, z_dim=2,
                            h_dim=16, n_layers=2, nonlin="softplus")
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 2))
    params = model.init(jax.random.PRNGKey(0), x)
    params = _perturb(params, jax.random.PRNGKey(4), scale=0.3)

    mu, lv, ctx = model.apply(params, x, method=model.encode_ctx)
    # grid integration of q(z|x) over [-8, 8]^2
    n = 241
    axis = jnp.linspace(-8.0, 8.0, n)
    zz = jnp.stack(jnp.meshgrid(axis, axis, indexing="ij"), -1).reshape(-1, 2)
    ctx_rep = jnp.broadcast_to(ctx, (zz.shape[0], ctx.shape[-1]))
    z0, sum_a = model.apply(params, zz, ctx_rep, method=model.flow_forward)
    from ardae_tpu.core.stats import logprob_gaussian

    logq = (jnp.sum(logprob_gaussian(mu, lv, z0), axis=-1) - sum_a)
    dz = float(axis[1] - axis[0]) ** 2
    integral = float(jnp.sum(jnp.exp(logq)) * dz)
    assert abs(integral - 1.0) < 2e-2, integral


def test_vae_loss_and_iwae_run_after_training_steps():
    """toy-maf end-to-end: a few optimizer steps reduce the loss; IWAE
    logprob is finite and >= the single-sample ELBO estimate in
    expectation (spot check, generous tolerance)."""
    from ardae_tpu.train.optim import build_optimizer
    from ardae_tpu.train.state import TrainState
    from ardae_tpu.train.vae_step import VAEStepConfig, build_vae_train_step

    model = build_vae_model("toy-maf", nchannels=2, nheight=1, z_dim=2,
                            h_dim=32, n_layers=2, nonlin="softplus")
    key = jax.random.PRNGKey(0)
    # two-mode 2-D data
    k1, k2 = jax.random.split(jax.random.PRNGKey(1))
    x = jnp.concatenate([
        jax.random.normal(k1, (128, 2)) * 0.3 + jnp.array([2.0, 0.0]),
        jax.random.normal(k2, (128, 2)) * 0.3 - jnp.array([2.0, 0.0]),
    ])
    params = model.init(key, x)
    opt = build_optimizer("adam", 1e-3, beta1=0.9)
    state = TrainState(step=jnp.zeros([], jnp.int32), params_model=params,
                       opt_model=opt.init(params), params_cdae={}, opt_cdae=(),
                       avg_params_model=None, avg_count=None)
    step = build_vae_train_step(model, opt, VAEStepConfig(loss_scale=0.5))

    losses = []
    for i in range(60):
        state, m = step(state, x, jax.random.fold_in(key, i), 1.0)
        losses.append(float(m["loss"]))
    assert losses[-1] < losses[0]
    assert np.isfinite(losses[-1])

    lp = vae_api.logprob_iwae(model, state.params_model,
                              jax.random.PRNGKey(9), x[:16], 64)
    assert np.isfinite(float(lp))

    # reconstruct + generate integration (the two CLI vis entry points)
    out, mu_x, z = vae_api.reconstruct(model, state.params_model,
                                       jax.random.PRNGKey(10), x[:4])
    assert out.shape == (4, 2) and z.shape == (4, 2)
    gen, _, _ = vae_api.generate(model, state.params_model,
                                 jax.random.PRNGKey(11), 6)
    assert gen.shape == (6, 2)


@pytest.mark.slow
def test_cli_toy_maf_one_run(tmp_path):
    """The reference's crashing `--model toy-maf` line works end to end."""
    import subprocess
    import sys
    import os

    repo = os.path.join(os.path.dirname(__file__), "..")
    out = subprocess.run(
        [sys.executable, "-m", "ardae_tpu.cli.vae", "--no-cuda",
         "--dataset", "25gaussians", "--nheight", "1", "--nchannels", "2",
         "--model", "toy-maf", "--model-z-dim", "2", "--model-h-dim", "32",
         "--model-n-layers", "2", "--model-nonlin", "softplus",
         "--train-batch-size", "64", "--epochs", "1", "--max-iters", "8",
         "--toy-train-size", "1000", "--iws-samples", "8",
         "--eval-iws-interval", "4", "--vis-interval", "100000",
         "--cache", str(tmp_path), "--seed", "1", "--no-resume"],
        cwd=repo, capture_output=True, text=True, timeout=900,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert "logprob (iws)" in out.stdout
