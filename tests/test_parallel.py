"""Multi-chip (virtual 8-device CPU mesh) tests: the SURVEY.md 4f fake-backend
replacement. Verifies the sharded joint step equals the single-device step."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from ardae_tpu.models.cdae import MLPGradCARDAE
from ardae_tpu.models.ivae.toy import ToyIPVAE
from ardae_tpu.parallel.mesh import batch_sharding, make_mesh, replicated
from ardae_tpu.train.optim import build_optimizer
from ardae_tpu.train.state import create_train_state
from ardae_tpu.train.step import StepConfig, build_train_step

KEY = jax.random.PRNGKey(0)


@pytest.fixture(scope="module")
def setup():
    assert jax.device_count() >= 8, "conftest must provide 8 virtual devices"
    model = ToyIPVAE(input_dim=2, noise_dim=2, h_dim=16, z_dim=2,
                     nonlinearity="relu", num_hidden_layers=2, enc_type="concat")
    cdae = MLPGradCARDAE(input_dim=2, context_dim=2, h_dim=16,
                         num_hidden_layers=2, nonlinearity="relu")
    bsz = 32
    x = jax.random.normal(KEY, (bsz, 2))
    pm = model.init(KEY, x, jnp.zeros((bsz, 2)))
    pc = cdae.init(KEY, jnp.zeros((4, 2)), jnp.zeros((4, 2)), jnp.zeros((4, 1)))
    cfg = StepConfig(std_scale=10.0, delta=0.1, num_cdae_updates=1,
                     train_nz_cdae=8, train_nz_model=2, ctx_type="data")
    opt_m = build_optimizer("adam", 1e-3, beta1=0.5)
    opt_d = build_optimizer("rmsprop", 1e-3, momentum=0.5)
    state = create_train_state(pm, opt_m, pc, opt_d)
    step = build_train_step(model, cdae, opt_m, opt_d, cfg)
    return model, cdae, state, step, x


def test_sharded_step_runs_on_8_device_mesh(setup):
    _, _, state, step, x = setup
    mesh = make_mesh(8)
    xs = jax.device_put(x, batch_sharding(mesh))
    cb = jax.device_put(x[None], NamedSharding(mesh, P(None, "data")))
    st = jax.device_put(state, replicated(mesh))
    with mesh:
        st2, metrics = step(st, cb, xs, KEY, 1.0)
    assert int(st2.step) == 1
    for k, v in metrics.items():
        assert np.isfinite(float(v)), k
    # params stay replicated across the mesh
    leaf = jax.tree.leaves(st2.params_model)[0]
    assert leaf.sharding.is_fully_replicated


def test_sample_axis_sharding(setup):
    """The nz sample axis is this workload's long-context analogue
    (SURVEY.md 5): shard the (bsz, nz, zdim) latents over a 2-D
    (data, sample) mesh and verify the DSM loss matches unsharded."""
    from ardae_tpu.models.cdae import MLPGradCARDAE, cdae_loss
    from ardae_tpu.parallel.mesh import sample_parallel_mesh

    cdae = MLPGradCARDAE(input_dim=2, context_dim=2, h_dim=16,
                         num_hidden_layers=2, nonlinearity="relu")
    params = cdae.init(KEY, jnp.zeros((4, 2)), jnp.zeros((4, 2)),
                       jnp.zeros((4, 1)))
    latent = jax.random.normal(KEY, (8, 16, 2))
    ctx = jax.random.normal(KEY, (8, 2))
    std = 0.2 * jnp.abs(jax.random.normal(KEY, (8, 16, 1)))

    loss_ref = jax.jit(lambda p: cdae_loss(cdae, p, KEY, latent, ctx, std))(params)

    mesh = sample_parallel_mesh(2, 4)
    lat_s = jax.device_put(latent, NamedSharding(mesh, P("data", "sample")))
    std_s = jax.device_put(std, NamedSharding(mesh, P("data", "sample")))
    ctx_s = jax.device_put(ctx, NamedSharding(mesh, P("data")))
    params_s = jax.device_put(params, NamedSharding(mesh, P()))
    with mesh:
        loss_sh = jax.jit(
            lambda p, l, c, s: cdae_loss(cdae, p, KEY, l, c, s)
        )(params_s, lat_s, ctx_s, std_s)
    np.testing.assert_allclose(float(loss_ref), float(loss_sh), rtol=1e-5)


def test_sharded_matches_single_device(setup):
    """Same inputs, same seed: the 8-way sharded step must produce the same
    updated params as the unsharded step (XLA psum == serial sum), up to
    reduction-order epsilon."""
    _, _, state, step, x = setup
    st_single, m_single = step(state, x[None], x, KEY, 1.0)

    mesh = make_mesh(8)
    xs = jax.device_put(x, batch_sharding(mesh))
    cb = jax.device_put(x[None], NamedSharding(mesh, P(None, "data")))
    st = jax.device_put(state, replicated(mesh))
    with mesh:
        st_shard, m_shard = step(st, cb, xs, KEY, 1.0)

    for a, b in zip(jax.tree.leaves(st_single.params_model),
                    jax.tree.leaves(st_shard.params_model)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-6)
    assert abs(float(m_single["model_loss"]) - float(m_shard["model_loss"])) < 1e-3


def test_full_step_sample_parallel_matches_single_device(setup):
    """FULL joint step over a 2-D (data=2, sample=4) mesh with
    cfg.shard_samples: the nz_cdae latent/noise tensors are sharded over the
    sample axis (sigma stats and the DSM mean become cross-device
    reductions), and the resulting parameter trajectory must match the
    unsharded step."""
    from ardae_tpu.parallel.mesh import sample_parallel_mesh

    model, cdae, state, step, x = setup
    st_single, m_single = step(state, x[None], x, KEY, 1.0)

    cfg_sp = StepConfig(std_scale=10.0, delta=0.1, num_cdae_updates=1,
                        train_nz_cdae=8, train_nz_model=2, ctx_type="data",
                        shard_samples=True)
    opt_m = build_optimizer("adam", 1e-3, beta1=0.5)
    opt_d = build_optimizer("rmsprop", 1e-3, momentum=0.5)
    step_sp = build_train_step(model, cdae, opt_m, opt_d, cfg_sp)

    mesh = sample_parallel_mesh(2, 4)
    xs = jax.device_put(x, NamedSharding(mesh, P("data")))
    cb = jax.device_put(x[None], NamedSharding(mesh, P(None, "data")))
    st = jax.device_put(state, NamedSharding(mesh, P()))
    with mesh:
        st_sp, m_sp = step_sp(st, cb, xs, KEY, 1.0)

    for a, b in zip(jax.tree.leaves(st_single.params_model),
                    jax.tree.leaves(st_sp.params_model)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-6)
    for a, b in zip(jax.tree.leaves(st_single.params_cdae),
                    jax.tree.leaves(st_sp.params_cdae)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-6)
    assert abs(float(m_single["cdae_loss"]) - float(m_sp["cdae_loss"])) < 1e-4
