"""One joint train step for EVERY canonical script configuration
(run_vae_25gaussians.sh, run_vae_dbmnist.sh, run_vae_sbmnist.sh), scaled to
test sizes: proves each model x cdae x ctx-type combination wires end to end.
"""

import jax
import jax.numpy as jnp
import pytest

from ardae_tpu.models.registry import build_cdae, build_ivae_model, context_dim_for
from ardae_tpu.models.ivae import api as ivae_api
from ardae_tpu.train.optim import build_optimizer
from ardae_tpu.train.state import create_train_state
from ardae_tpu.train.step import StepConfig, build_train_step

KEY = jax.random.PRNGKey(0)

# (script, model, cdae, ctx_type, m_opt, d_opt, std_scale, num_updates)
CANONICAL = [
    ("25gaussians", "mlp-concat", "mlp-grad", "lt0", "adam", "rmsprop", 10000.0, 1),
    ("dbmnist", "resconvct-res", "mlp-res", "lt0", "adam", "rmsprop", 100.0, 2),
    ("dbmnist", "auxresconvct", "mlp-res", "hidden1a", "adam", "rmsprop", 100.0, 2),
    ("dbmnist", "mnist-conv", "mlp-grad", "lt0", "adam", "rmsprop", 10000.0, 1),
    ("dbmnist", "auxconv", "mlp-grad", "hidden1a", "adam", "rmsprop", 10000.0, 1),
    ("dbmnist", "mnist-concat", "mlp-grad", "lt0", "adam", "rmsprop", 10000.0, 1),
    ("dbmnist", "auxmnist", "mlp-grad", "hidden1a", "adam", "rmsprop", 10000.0, 1),
    ("sbmnist", "resconvct-res", "mlp-res", "lt0", "adam", "rmsprop", 100.0, 2),
]


@pytest.mark.slow
@pytest.mark.parametrize("ds,model_name,cdae_name,ctx,mo,do,ssc,nup", CANONICAL)
def test_canonical_config_one_step(ds, model_name, cdae_name, ctx, mo, do, ssc, nup):
    toy = ds == "25gaussians"
    nch, nh = (2, 1) if toy else (1, 28)
    h_dim = 16 if model_name in ("mlp-concat", "mnist-concat", "auxmnist") else (
        32 if "resconv" in model_name and "aux" not in model_name else 0)
    nonlin = "elu" if "resconv" in model_name else ("relu" if toy else "softplus")
    z_dim, n_dim = (2, 4) if toy else (8, 16)
    n_layers = 2 if h_dim else 0
    # aux MLP variants need h_dim>0
    if model_name in ("auxmnist",):
        h_dim, n_layers = 16, 2

    model = build_ivae_model(model_name, nchannels=nch, nheight=nh, z_dim=z_dim,
                             h_dim=h_dim, n_dim=n_dim, n_layers=max(n_layers, 1),
                             nonlin=nonlin)
    ctx_dim = context_dim_for(ctx, model_name=model_name, nchannels=nch,
                              nheight=nh, z_dim=z_dim, h_dim=h_dim)
    cdae = build_cdae(cdae_name, input_dim=z_dim, context_dim=ctx_dim,
                      h_dim=16, n_layers=2, nonlin="softplus")

    bsz = 8
    x = jax.random.uniform(KEY, (bsz, nch * nh * nh)).round() if not toy \
        else jax.random.normal(KEY, (bsz, 2))
    eps = ivae_api.make_eps(model, KEY, bsz, 1)
    if model.family == "aux":
        pm = model.init(KEY, x, eps, None)
    else:
        pm = model.init(KEY, x, eps)
    pc = cdae.init(KEY, jnp.zeros((4, z_dim)), jnp.zeros((4, ctx_dim)),
                   jnp.zeros((4, 1)))
    cfg = StepConfig(std_scale=ssc, delta=0.1, num_cdae_updates=nup,
                     train_nz_cdae=6, train_nz_model=1, ctx_type=ctx)
    opt_m = build_optimizer(mo, 1e-4, beta1=0.5)
    opt_d = build_optimizer(do, 1e-4, momentum=0.5)
    state = create_train_state(pm, opt_m, pc, opt_d)
    step = build_train_step(model, cdae, opt_m, opt_d, cfg)
    cb = jnp.stack([x] * nup, axis=0)
    state, metrics = step(state, cb, x, KEY, 1.0)
    for k, v in metrics.items():
        assert jnp.isfinite(v), f"{model_name}/{cdae_name}/{ctx}: {k} not finite"
    # IWS eval path for this model family
    lp = ivae_api.logprob_iws(model, state.params_model, KEY, x,
                              sample_size=2 * z_dim,
                              jitter=1e-5 if model.family == "aux" else 0.0)
    assert jnp.isfinite(lp)


@pytest.mark.slow
@pytest.mark.parametrize("ds,model_name,cdae_name,ctx,mo,do,ssc,nup", CANONICAL)
def test_canonical_config_bf16_both_phases(ds, model_name, cdae_name, ctx, mo,
                                           do, ssc, nup):
    """One joint step with bf16 compute in BOTH phases for every canonical
    model family — catches fp32-constant dtype mismatches in decoders
    (e.g. the bilinear-upsample matrix in the resconv path)."""
    toy = ds == "25gaussians"
    nch, nh = (2, 1) if toy else (1, 28)
    h_dim = 16 if model_name in ("mlp-concat", "mnist-concat", "auxmnist") else (
        32 if "resconv" in model_name and "aux" not in model_name else 0)
    nonlin = "elu" if "resconv" in model_name else ("relu" if toy else "softplus")
    z_dim, n_dim = (2, 4) if toy else (8, 16)
    n_layers = 2 if h_dim else 0
    if model_name in ("auxmnist",):
        h_dim, n_layers = 16, 2

    model = build_ivae_model(model_name, nchannels=nch, nheight=nh, z_dim=z_dim,
                             h_dim=h_dim, n_dim=n_dim, n_layers=max(n_layers, 1),
                             nonlin=nonlin)
    ctx_dim = context_dim_for(ctx, model_name=model_name, nchannels=nch,
                              nheight=nh, z_dim=z_dim, h_dim=h_dim)
    cdae = build_cdae(cdae_name, input_dim=z_dim, context_dim=ctx_dim,
                      h_dim=16, n_layers=2, nonlin="softplus")

    bsz = 8
    x = jax.random.uniform(KEY, (bsz, nch * nh * nh)).round() if not toy \
        else jax.random.normal(KEY, (bsz, 2))
    eps = ivae_api.make_eps(model, KEY, bsz, 1)
    pm = model.init(KEY, x, eps, None) if model.family == "aux" \
        else model.init(KEY, x, eps)
    pc = cdae.init(KEY, jnp.zeros((4, z_dim)), jnp.zeros((4, ctx_dim)),
                   jnp.zeros((4, 1)))
    from ardae_tpu.train.optim import build_optimizer
    from ardae_tpu.train.state import create_train_state
    from ardae_tpu.train.step import StepConfig, build_train_step

    cfg = StepConfig(std_scale=ssc, delta=0.1, num_cdae_updates=nup,
                     train_nz_cdae=4, train_nz_model=1, ctx_type=ctx,
                     cdae_compute_dtype="bfloat16",
                     model_compute_dtype="bfloat16")
    opt_m = build_optimizer(mo, 1e-4, beta1=0.5)
    opt_d = build_optimizer(do, 1e-4, momentum=0.5)
    state = create_train_state(pm, opt_m, pc, opt_d)
    step = build_train_step(model, cdae, opt_m, opt_d, cfg)
    cdae_batches = jnp.stack([x] * nup, axis=0)
    state2, metrics = step(state, cdae_batches, x, KEY, 1.0)
    for k, v in metrics.items():
        assert jnp.isfinite(v), f"{k} not finite ({model_name})"
