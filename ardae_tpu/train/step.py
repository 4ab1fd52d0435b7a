"""The jitted joint AR-DAE training step.

One XLA computation per iteration reproducing the reference's alternating
scheme (ivae_ardae.py:707-846; SURVEY.md 3.1):

  PHASE A (x num_cdae_updates, each on its OWN data batch):
    sigma_i   = delta * mean_d std_s( std_scale * (z_s - z_det) )   per item
    stdmat    ~ sigma_i * N(0,1)  per (item, sample)                 [:761]
    cdae loss = mse(sigma * score(x_bar, ctx, sigma), -eps)          [:768]
    cdae optimizer step.

  PHASE B (fresh batch):
    model loss = mean(recon + beta * prior_energy)                   [:801]
    entropy-gradient injection: instead of the reference's graph surgery
    (model_loss.backward(retain_graph=True) then a second
    .backward(gradient=beta*score/(bsz*nz)) — ivae_ardae.py:804,834), the
    injected gradient is expressed as a differentiable surrogate term
        aux = beta/(bsz*nz) * sum( stop_grad(score) *
                                   std_scale * (z - stop_grad(z_det)) )
    whose d/dz equals the injected gradient exactly (this is precisely the
    contract of the reference's aux_loss_for_grad, models/aux.py:9-37).
    model optimizer step.

Both phases, both optimizers, the sigma statistics, and the noise draws jit
into a single program: no host sync anywhere in the hot loop.
"""

import dataclasses
from functools import partial
import jax
import jax.numpy as jnp

from ardae_tpu.models.cdae.cardae import cdae_loss, cdae_score
from ardae_tpu.models.ivae import api as ivae_api
from ardae_tpu.train.state import TrainState

stop_grad = jax.lax.stop_gradient


@dataclasses.dataclass(frozen=True)
class StepConfig:
    """Static configuration of the joint step (hashable: part of the jit key)."""

    std_scale: float = 1.0
    delta: float = 1.0
    num_cdae_updates: int = 1
    train_nz_cdae: int = 1
    train_nstd_cdae: int = 1
    train_nz_model: int = 1
    ctx_type: str = "data"  # data | lt0 | hidden1a
    noise_type: str = "gaussian"
    # Fused Pallas DSM kernel (ops/fused_dsm) where supported. Measured on
    # v5e: 1.4x faster than XLA in isolation (8.3 -> 6.0 ms at h=256, L=5,
    # nz=625) but neutral inside the full jitted step (XLA overlaps its own
    # ops better around the custom call), so off by default.
    use_pallas: bool = False
    # Mixed precision for the PHASE-A DSM loss: bf16 matmuls with fp32 master
    # params/grads/optimizer (standard MXU recipe). Measured 1.72x on the
    # grad-style canonical config (20.0 -> 11.6 ms); fp32 default for exact
    # reference parity.
    cdae_compute_dtype: str = "float32"
    # Mixed precision for the PHASE-B model forward/backward (encoder,
    # decoder, and the detached context/latent-mean passes); the loss
    # reductions and the injected entropy-gradient term stay fp32.
    model_compute_dtype: str = "float32"
    # jax.checkpoint around the phase-A DSM loss: the backward pass then
    # recomputes the score net's forward instead of loading stored
    # activations from HBM. Looked right on paper (step is HBM-traffic-bound
    # with the MXU ~97% idle) but MEASURED SLOWER on v5e
    # (scripts/bench_remat_ab.py): primary conv 82.3 -> 65.8 steps/s,
    # flagship resconvct-res 41.1 -> 34.8. The stored activations' reloads
    # were overlapped with compute (same finding as the materialized-
    # broadcast cleanups); recomputation serializes work instead. Kept as a
    # documented negative result; default stays off.
    remat_cdae: bool = False
    weight_avg: str = "none"  # none | polyak | swa
    weight_avg_start: int = 1000
    weight_avg_decay: float = 0.998
    # Sample parallelism (SURVEY.md 5): the nz_cdae sample axis is this
    # workload's analogue of a long sequence axis. When True, the phase-A
    # (bsz, nz, zdim) latent/noise tensors carry sharding constraints over a
    # 2-D ("data", "sample") mesh — the sigma statistics (std over nz) and
    # the DSM mean become XLA cross-device reductions over ICI. The jitted
    # step must then run under `with mesh:` (parallel.mesh.sample_parallel_mesh).
    shard_samples: bool = False


def _sp_constrain(t, cfg: StepConfig):
    """Pin a (bsz, nz, ...) tensor's layout to the ("data", "sample") mesh
    axes when sample parallelism is on (no-op otherwise)."""
    if not cfg.shard_samples:
        return t
    from jax.sharding import PartitionSpec as P

    spec = P("data", "sample", *([None] * (t.ndim - 2)))
    return jax.lax.with_sharding_constraint(t, spec)


def compute_context(model, params_model, x, ctx_type: str):
    """CDAE conditioning (reference ivae_ardae.py:729-741): always detached."""
    if ctx_type == "data":
        ctx = x.reshape(x.shape[0], -1)
        if model.center_input:
            ctx = 2.0 * ctx - 1.0
        return ctx
    if ctx_type == "lt0":
        z = ivae_api.encode_det(model, params_model, x)  # (B, 1, zdim)
        return stop_grad(z.reshape(z.shape[0], -1))
    if ctx_type == "hidden1a":
        h = ivae_api.encode_hidden_feats(model, params_model, x)
        return stop_grad(h)
    raise NotImplementedError(ctx_type)


def _sigma_stats(model, params_model, key, x, cfg: StepConfig):
    """Per-item adaptive noise level (reference ivae_ardae.py:748-758).

    Under bf16 phase-A compute the (detached) nz_cdae-wide sampling pass runs
    in bf16 too; the sigma statistics themselves reduce in fp32.
    """
    if cfg.cdae_compute_dtype == "bfloat16":
        bf = jnp.bfloat16
        params_c = jax.tree.map(
            lambda a: a.astype(bf) if a.dtype == jnp.float32 else a, params_model
        )
        x_c = x.astype(bf)
    else:
        params_c, x_c = params_model, x
    latent_mean = ivae_api.encode_det(model, params_c, x_c)  # (B,1,z)
    latent = ivae_api.sample_latents(model, params_c, key, x_c, cfg.train_nz_cdae)
    latent = _sp_constrain(latent, cfg)
    latent = stop_grad(latent).astype(jnp.float32)
    latent_mean = stop_grad(latent_mean).astype(jnp.float32)
    lsm = cfg.std_scale * (latent - latent_mean)  # (B,nz,z)
    std_qz = jnp.std(lsm, axis=1, keepdims=True, ddof=1)  # (B,1,z), unbiased
    sigma = cfg.delta * jnp.mean(std_qz, axis=2, keepdims=True)  # (B,1,1)
    # latent_mean doubles as the lt0 context (the reference uses ONE
    # model.encode(x, std=0) tensor for both, ivae_ardae.py:735+748);
    # params_c/x_c let hidden1a reuse the same compute-dtype recipe without
    # a second, different-precision trunk pass.
    return lsm, sigma, latent_mean, params_c, x_c


def cdae_update(model, cdae, opt_d, cfg: StepConfig, params_model, params_cdae,
                opt_cdae_state, key, x):
    """One PHASE-A update. Returns (params_cdae, opt_state, metrics)."""
    bsz = x.shape[0]
    k_lat, k_std, k_noise = jax.random.split(key, 3)

    lsm, sigma, latent_mean, params_c, x_c = _sigma_stats(
        model, params_model, k_lat, x, cfg)
    if cfg.ctx_type == "lt0":
        # same tensor as latent_mean (reference ivae_ardae.py:735+748) —
        # avoids recomputing the deterministic encoding in a different
        # precision from the sigma-stats pass
        ctx = latent_mean.reshape(bsz, -1)
    elif cfg.ctx_type == "hidden1a":
        ctx = stop_grad(
            ivae_api.encode_hidden_feats(model, params_c, x_c)
        ).astype(jnp.float32)
    else:
        ctx = compute_context(model, params_model, x, cfg.ctx_type)

    ns = cfg.train_nz_cdae * cfg.train_nstd_cdae
    stdmat = sigma * jax.random.normal(k_std, (bsz, ns, 1))  # sigma~N(0, sigma_i^2)
    stdmat = _sp_constrain(stdmat, cfg)

    # expand the nz samples across nstd (reference :764-767); identity when
    # nstd == 1 (avoids a materializing broadcast+reshape copy)
    zdim = lsm.shape[-1]
    if cfg.train_nstd_cdae == 1:
        lsm_exp = lsm
    else:
        lsm_exp = jnp.broadcast_to(
            lsm[:, :, None, :], (bsz, cfg.train_nz_cdae, cfg.train_nstd_cdae, zdim)
        ).reshape(bsz, ns, zdim)
    lsm_exp = _sp_constrain(lsm_exp, cfg)

    from ardae_tpu.ops.fused_dsm import fused_cdae_dsm_loss, supports_fused_dsm

    # NOTE: the grad-style fused kernel (ops/fused_dsm_grad) is correctness-
    # validated but measured SLOWER than XLA's fused double-backward and
    # bf16-unsafe — it is deliberately not dispatched here (see its
    # docstring for the measurements).
    # the guard and the kernel call must agree on the tile size, and the
    # fused path is fp32-only (it has no compute_dtype plumbing) — never
    # dispatch it in bf16 mode, which would silently mix numeric regimes
    fused_tile = 512
    use_fused = (
        cfg.use_pallas
        and cfg.noise_type == "gaussian"
        and cfg.cdae_compute_dtype != "bfloat16"
        and jax.default_backend() == "tpu"
        and supports_fused_dsm(cdae, bsz * ns, tile=fused_tile)
    )

    def loss_fn(p):
        if use_fused:
            return fused_cdae_dsm_loss(cdae, p, k_noise, lsm_exp, ctx, stdmat,
                                       tile=fused_tile)
        # bf16 mode: matmuls in bf16 (params cast inside cdae_loss, fp32
        # master grads through the cast's transpose); the noise draw, the
        # perturbation, and the sigma*score+eps loss product stay fp32 so
        # the collapsed tiny-sigma regime of aux configs cannot underflow.
        return cdae_loss(
            cdae, p, k_noise, lsm_exp, ctx, stdmat, cfg.noise_type,
            compute_dtype="bfloat16"
            if cfg.cdae_compute_dtype == "bfloat16" else None)

    if cfg.remat_cdae:
        loss_fn = jax.checkpoint(loss_fn)
    loss, grads = jax.value_and_grad(loss_fn)(params_cdae)
    updates, opt_cdae_state = opt_d.update(grads, opt_cdae_state, params_cdae)
    params_cdae = jax.tree.map(lambda p, u: p + u, params_cdae, updates)
    metrics = {
        "cdae_loss": loss,
        "std_eff_mean": jnp.mean(sigma),
        "std_eff_max": jnp.max(sigma),
        "std_eff_min": jnp.min(sigma),
    }
    return params_cdae, opt_cdae_state, metrics


def model_update(model, cdae, opt_m, cfg: StepConfig, params_cdae, params_model,
                 opt_model_state, key, x, beta):
    """PHASE B: ELBO-without-entropy + injected entropy gradient."""
    bsz = x.shape[0]
    nz = cfg.train_nz_model
    k_fwd, k_det = jax.random.split(key)

    bf16_b = cfg.model_compute_dtype == "bfloat16"

    def loss_fn(p):
        model_loss, terms = ivae_api.ivae_loss(
            model, p, k_fwd, x, nz, beta=beta,
            compute_dtype="bfloat16" if bf16_b else None)
        z = terms["z"]  # (B, nz, zdim), fp32

        # detached passes: safe to run entirely in bf16 when enabled
        if bf16_b:
            bf = jnp.bfloat16
            p_det = jax.tree.map(
                lambda a: a.astype(bf) if a.dtype == jnp.float32 else a, p)
            x_det = x.astype(bf)
        else:
            p_det, x_det = p, x
        ctx = stop_grad(compute_context(model, p_det, x_det, cfg.ctx_type))
        ctx = ctx.astype(jnp.float32)
        latent_mean = stop_grad(
            ivae_api.encode_det(model, p_det, x_det)).astype(jnp.float32)
        lsm_det = stop_grad(cfg.std_scale * (z - latent_mean))
        score = stop_grad(cdae_score(cdae, params_cdae, lsm_det, ctx, 0.0))

        aux = jnp.sum(score * (cfg.std_scale * (z - latent_mean)))
        total = model_loss + beta * aux / (bsz * nz)
        return total, (model_loss, terms["recon"], terms["prior"])

    (_, (model_loss, recon, prior)), grads = jax.value_and_grad(
        loss_fn, has_aux=True
    )(params_model)
    updates, opt_model_state = opt_m.update(grads, opt_model_state, params_model)
    params_model = jax.tree.map(lambda p, u: p + u, params_model, updates)
    metrics = {"model_loss": model_loss, "recon_loss": recon, "prior_loss": prior}
    return params_model, opt_model_state, metrics


def _update_weight_avg(cfg: StepConfig, state: TrainState) -> TrainState:
    """SWA / Polyak running average of model params
    (reference ivae_ardae.py:559-565 via torchcontrib)."""
    if cfg.weight_avg == "none" or state.avg_params_model is None:
        return state
    started = state.step >= cfg.weight_avg_start
    count = state.avg_count + jnp.where(started, 1, 0)
    if cfg.weight_avg == "polyak":
        d = cfg.weight_avg_decay

        def blend(avg, p):
            new = d * avg + (1.0 - d) * p
            return jnp.where(started, new, p)

    else:  # swa: running mean over post-start iterates

        def blend(avg, p):
            c = jnp.maximum(count, 1).astype(p.dtype)
            new = avg + (p - avg) / c
            return jnp.where(started, new, p)

    avg = jax.tree.map(blend, state.avg_params_model, state.params_model)
    return state.replace(avg_params_model=avg, avg_count=count)


def _one_step(model, cdae, opt_m, opt_d, cfg: StepConfig, state: TrainState,
              cdae_batches, model_batch, key, beta):
    """Shared body of the jitted single step and the scanned multi-step."""
    k_all = jax.random.fold_in(key, state.step)
    metrics = {}

    params_cdae, opt_cdae_state = state.params_cdae, state.opt_cdae
    for i in range(cfg.num_cdae_updates):
        params_cdae, opt_cdae_state, m = cdae_update(
            model, cdae, opt_d, cfg,
            state.params_model, params_cdae, opt_cdae_state,
            jax.random.fold_in(k_all, i), cdae_batches[i],
        )
        metrics.update(m)  # keep the last update's stats, like the logs

    k_model = jax.random.fold_in(k_all, 1000)
    params_model, opt_model_state, m = model_update(
        model, cdae, opt_m, cfg, params_cdae,
        state.params_model, state.opt_model, k_model, model_batch, beta,
    )
    metrics.update(m)

    state = state.replace(
        step=state.step + 1,
        params_model=params_model,
        opt_model=opt_model_state,
        params_cdae=params_cdae,
        opt_cdae=opt_cdae_state,
    )
    state = _update_weight_avg(cfg, state)
    return state, metrics


def build_train_chunk(model, cdae, opt_m, opt_d, cfg: StepConfig,
                      beta_fn=None):
    """K steps per device dispatch: lax.scan over the single joint step.

    This is the TPU-native replacement for the reference's per-iteration
    Python loop: the training data lives in HBM, per-step batches are
    device-side gathers of host-provided index arrays (preserving exact
    shuffled-epoch semantics), and ALL K steps of both phases + optimizer
    updates compile into one XLA program. Host work per dispatch is O(1).

      chunk(state, data, cdae_idx[K,U,B], model_idx[K,B], key, beta0)
        -> (state, stacked metrics dict of shape [K])

    data is the full (possibly gray, pre-binarization) train array in HBM;
    cfg-driven on-device bernoulli binarization happens per gather when
    binarize=True. ``beta_fn(step)`` computes per-step annealed beta inside
    the scan (defaults to the constant beta0 argument).
    """

    @partial(jax.jit, static_argnames=("binarize",), donate_argnums=(0,))
    def chunk(state: TrainState, data, cdae_idx, model_idx, key, beta0,
              binarize: bool = False):
        def body(state, per_step):
            c_idx, m_idx = per_step
            k = jax.random.fold_in(key, state.step)
            cdae_batches = jnp.take(data, c_idx.reshape(-1), axis=0).reshape(
                c_idx.shape[0], c_idx.shape[1], -1
            )
            model_batch = jnp.take(data, m_idx, axis=0)
            if binarize:
                # tag far outside the 0..num_cdae_updates fold_in range used
                # by _one_step: fold_in(k, 7) collides bit-exactly with cdae
                # update #7's keys when num_cdae_updates >= 8
                kb1, kb2 = jax.random.split(jax.random.fold_in(k, 1_000_003))
                cdae_batches = jax.random.bernoulli(kb1, cdae_batches).astype(
                    jnp.float32
                )
                model_batch = jax.random.bernoulli(kb2, model_batch).astype(
                    jnp.float32
                )
            beta = beta_fn(state.step) if beta_fn is not None else beta0
            state, metrics = _one_step(
                model, cdae, opt_m, opt_d, cfg, state,
                cdae_batches, model_batch, key, beta,
            )
            return state, metrics

        return jax.lax.scan(body, state, (cdae_idx, model_idx))

    return chunk


def build_train_step(model, cdae, opt_m, opt_d, cfg: StepConfig):
    """Returns jitted step(state, cdae_batches, model_batch, key, beta).

    cdae_batches: (num_cdae_updates, B, ...) — phase A consumes its own
    batches, exactly like the reference's separate iterator pulls
    (ivae_ardae.py:718-722 vs :790-794).
    """

    @jax.jit
    def step(state: TrainState, cdae_batches, model_batch, key, beta):
        return _one_step(model, cdae, opt_m, opt_d, cfg, state,
                         cdae_batches, model_batch, key, beta)

    return step
