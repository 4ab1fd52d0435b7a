"""Joint train-step tests: entropy-grad surrogate correctness + a tiny
end-to-end 25-gaussians run reaching a sane loss band (SURVEY.md 4d)."""

import pytest
import jax
import jax.numpy as jnp
import numpy as np

from ardae_tpu.models.cdae import MLPGradCARDAE, cdae_score
from ardae_tpu.models.ivae import api as ivae_api
from ardae_tpu.models.ivae.toy import ToyIPVAE
from ardae_tpu.train.optim import build_optimizer
from ardae_tpu.train.state import create_train_state
from ardae_tpu.train.step import StepConfig, build_train_step, compute_context

KEY = jax.random.PRNGKey(0)


def _build(bsz=32):
    model = ToyIPVAE(input_dim=2, noise_dim=2, h_dim=32, z_dim=2,
                     nonlinearity="relu", num_hidden_layers=2, enc_type="concat")
    cdae = MLPGradCARDAE(input_dim=2, context_dim=2, h_dim=32, num_hidden_layers=2,
                         nonlinearity="relu")
    x = jax.random.normal(KEY, (bsz, 2))
    params_model = model.init(KEY, x, jnp.zeros((bsz, 2)))
    params_cdae = cdae.init(KEY, jnp.zeros((4, 2)), jnp.zeros((4, 2)), jnp.zeros((4, 1)))
    return model, cdae, params_model, params_cdae, x


def test_entropy_grad_surrogate_matches_manual_injection():
    """d/dz of the aux term must equal beta*score/(bsz*nz)*std_scale —
    the exact contract of reference ivae_ardae.py:834 / models/aux.py:9-37."""
    model, cdae, params_model, params_cdae, x = _build(bsz=8)
    std_scale, beta, nz = 100.0, 0.7, 3
    bsz = x.shape[0]

    z = ivae_api.sample_latents(model, params_model, KEY, x, nz)
    latent_mean = ivae_api.encode_det(model, params_model, x)
    ctx = compute_context(model, params_model, x, "data")
    lsm_det = std_scale * (z - latent_mean)
    score = cdae_score(cdae, params_cdae, lsm_det, ctx, 0.0)

    def aux_term(zz):
        return beta * jnp.sum(jax.lax.stop_gradient(score) * (std_scale * (zz - jax.lax.stop_gradient(latent_mean)))) / (bsz * nz)

    g = jax.grad(aux_term)(z)
    expected = beta * score * std_scale / (bsz * nz)
    np.testing.assert_allclose(g, expected, rtol=1e-5)


@pytest.mark.slow
def test_train_step_runs_and_updates():
    model, cdae, params_model, params_cdae, x = _build()
    cfg = StepConfig(std_scale=10.0, delta=0.1, num_cdae_updates=2,
                     train_nz_cdae=16, train_nz_model=1, ctx_type="data")
    opt_m = build_optimizer("adam", 1e-4, beta1=0.5)
    opt_d = build_optimizer("rmsprop", 1e-4, momentum=0.5)
    state = create_train_state(params_model, opt_m, params_cdae, opt_d)
    step = build_train_step(model, cdae, opt_m, opt_d, cfg)

    cdae_batches = jnp.stack([x, x], axis=0)
    state2, metrics = step(state, cdae_batches, x, KEY, 1.0)
    assert int(state2.step) == 1
    for k, v in metrics.items():
        assert jnp.isfinite(v), f"{k} not finite"
    # params actually moved
    moved = jax.tree.map(lambda a, b: float(jnp.max(jnp.abs(a - b))),
                         state.params_model, state2.params_model)
    assert max(jax.tree.leaves(moved)) > 0


@pytest.mark.slow
def test_lt0_context_and_nstd():
    model, cdae, params_model, params_cdae, x = _build()
    cfg = StepConfig(std_scale=1.0, delta=0.1, num_cdae_updates=1,
                     train_nz_cdae=4, train_nstd_cdae=3, train_nz_model=2,
                     ctx_type="lt0")
    opt_m = build_optimizer("adam", 1e-4)
    opt_d = build_optimizer("adam", 1e-4)
    state = create_train_state(params_model, opt_m, params_cdae, opt_d)
    step = build_train_step(model, cdae, opt_m, opt_d, cfg)
    state2, metrics = step(state, x[None], x, KEY, 1.0)
    assert jnp.isfinite(metrics["cdae_loss"])


@pytest.mark.slow
def test_toy_e2e_loss_decreases():
    """300 joint steps on 25-gaussians-like data: model loss must drop."""
    from ardae_tpu.data.toy import _exp4

    rng = np.random.default_rng(0)
    data, _ = _exp4(rng, 5000)
    data = jnp.asarray(data)

    model, cdae, params_model, params_cdae, _ = _build(bsz=128)
    cfg = StepConfig(std_scale=1.0, delta=0.1, num_cdae_updates=1,
                     train_nz_cdae=32, train_nz_model=1, ctx_type="data")
    opt_m = build_optimizer("adam", 1e-3, beta1=0.5)
    opt_d = build_optimizer("rmsprop", 1e-3, momentum=0.5)
    state = create_train_state(params_model, opt_m, params_cdae, opt_d)
    step = build_train_step(model, cdae, opt_m, opt_d, cfg)

    key = jax.random.PRNGKey(3)
    losses = []
    for i in range(300):
        key, k1, k2 = jax.random.split(key, 3)
        idx1 = jax.random.randint(k1, (128,), 0, data.shape[0])
        idx2 = jax.random.randint(k2, (128,), 0, data.shape[0])
        state, metrics = step(state, data[idx1][None], data[idx2], key, 1.0)
        losses.append(float(metrics["model_loss"]))
    first, last = np.mean(losses[:20]), np.mean(losses[-20:])
    assert last < first, f"no learning: first={first:.3f} last={last:.3f}"
    assert np.isfinite(last)


@pytest.mark.slow
def test_model_compute_dtype_bf16_step():
    """PHASE-B bf16: master params stay fp32, one joint step is finite and
    close to the fp32 step (loss reductions are fp32 by construction)."""
    model, cdae, params_model, params_cdae, x = _build()
    opt_m = build_optimizer("adam", 1e-4, beta1=0.5)
    opt_d = build_optimizer("rmsprop", 1e-4, momentum=0.5)

    outs = {}
    for dt in ("float32", "bfloat16"):
        cfg = StepConfig(std_scale=10.0, delta=0.1, num_cdae_updates=1,
                         train_nz_cdae=16, train_nz_model=2, ctx_type="lt0",
                         model_compute_dtype=dt)
        state = create_train_state(params_model, opt_m, params_cdae, opt_d)
        step = build_train_step(model, cdae, opt_m, opt_d, cfg)
        state2, metrics = step(state, x[None], x, KEY, 1.0)
        assert all(a.dtype == jnp.float32
                   for a in jax.tree.leaves(state2.params_model))
        assert jnp.isfinite(metrics["model_loss"])
        outs[dt] = (float(metrics["model_loss"]), state2.params_model)
    # bf16 forward wobbles the loss only slightly on a tiny model
    assert abs(outs["float32"][0] - outs["bfloat16"][0]) < 0.05 * (
        1.0 + abs(outs["float32"][0]))
    diffs = jax.tree.map(lambda a, b: float(jnp.max(jnp.abs(a - b))),
                         outs["float32"][1], outs["bfloat16"][1])
    assert max(jax.tree.leaves(diffs)) < 1e-3  # one optimizer step apart at most
