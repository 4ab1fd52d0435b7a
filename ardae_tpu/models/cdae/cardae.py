"""Conditional AR-DAE score networks (the AR-DAE core).

TPU-first re-design of the reference CDAE family:
  * residual style (score = direct MLP output):
      /root/reference/models/resdae/mlp.py:27-413
  * gradient style (score = grad of a scalar energy MLP):
      /root/reference/models/graddae/mlp.py:39-483

Both share one calling convention (SURVEY.md 2.2): ``input`` is
(bsz, ssz, z_dim) latent samples, ``context`` is (bsz, ctx_dim) per-item
conditioning, ``std`` is a per-(item,sample) noise level (bsz, ssz, 1).

Design moves vs. the reference:
  * The context encoder runs ONCE per item ((bsz, ctx) -> (bsz, h)) and is
    broadcast across the sample axis, instead of expanding the raw context to
    bsz*ssz rows before encoding (reference resdae/mlp.py:359). Identical math
    (the context path is deterministic per item), ~ssz x less context compute.
  * The gradient style uses jax.grad of the energy network: the reference's
    double backprop (torch.autograd.grad(create_graph=True),
    graddae/mlp.py:35-36) becomes plain composition of jax transforms and jits
    into a single fused XLA computation.
  * Noise injection uses explicit PRNG keys (core.rng), never global state.

Unconditional variants (DAE / ARDAE, used by the notebook workloads) share
the same module with ``conditional=False``.
"""

import flax.linen as nn
import jax
import jax.numpy as jnp

from ardae_tpu.core.rng import sample_laplace
from ardae_tpu.nn.mlp import MLP


class CARDAE(nn.Module):
    """Unified conditional/unconditional, sigma-aware/plain, res/grad DAE.

    score_type: 'res'  -> score = dae_mlp(features)
                'grad' -> score = d/dx [-energy_mlp(features)]
    conditional: feed an encoded context alongside the input.
    sigma_conditioned: append the noise level sigma to the trunk input
                       (the "AR" in AR-DAE). Off => plain (C)DAE.
    """

    input_dim: int
    h_dim: int = 128
    context_dim: int = 2
    num_hidden_layers: int = 1
    nonlinearity: str = "tanh"
    score_type: str = "res"
    conditional: bool = True
    sigma_conditioned: bool = True
    enc_input: bool = True
    enc_ctx: bool = True

    def setup(self):
        nhl = self.num_hidden_layers
        if self.conditional:
            if self.enc_ctx:
                self.ctx_encode = MLP(
                    hidden_dim=self.h_dim,
                    output_dim=self.h_dim,
                    nonlinearity=self.nonlinearity,
                    num_hidden_layers=nhl - 1,
                    use_nonlinearity_output=True,
                    name="ctx_encode",
                )
            if self.enc_input:
                self.inp_encode = MLP(
                    hidden_dim=self.h_dim,
                    output_dim=self.h_dim,
                    nonlinearity=self.nonlinearity,
                    num_hidden_layers=nhl - 1,
                    use_nonlinearity_output=True,
                    name="inp_encode",
                )
        out_dim = 1 if self.score_type == "grad" else self.input_dim
        # The trunk's first layer is SPLIT: the per-row part (noisy input
        # features + sigma) and the per-ITEM context part are separate
        # matmuls, and the context contribution is computed once per item and
        # broadcast across the nz sample axis. Mathematically identical to a
        # single Linear over the concat (linear in each block), but the
        # context matmul (and its parameter-gradient) shrinks by a factor nz
        # — the dominant per-step saving at nz_cdae=625 (SURVEY.md 3.1).
        trunk_name = "dae" if self.score_type == "res" else "neglogprob"
        assert nhl >= 1
        from ardae_tpu.nn.linear import Linear

        self.trunk_l0_row = Linear(self.h_dim, name=f"{trunk_name}_l0_row")
        if self.conditional:
            self.trunk_l0_ctx = Linear(self.h_dim, use_bias=False,
                                       name=f"{trunk_name}_l0_ctx")
        self.trunk_rest = MLP(
            hidden_dim=self.h_dim,
            output_dim=out_dim,
            nonlinearity=self.nonlinearity,
            num_hidden_layers=nhl - 1,
            use_nonlinearity_output=False,
            name=trunk_name,
        )

    def encode_ctx(self, ctx):
        """Per-item context features, (bsz, ctx_dim) -> (bsz, h or ctx_dim)."""
        if not self.conditional:
            raise ValueError("unconditional DAE has no context path")
        return self.ctx_encode(ctx) if self.enc_ctx else ctx

    def _trunk(self, x, ctx_l0, std):
        """ctx_l0: per-item first-layer context contribution (bsz, h) already
        computed (or None); broadcast-added across the row axis."""
        from ardae_tpu.nn.activations import get_nonlinear_func

        parts = [self.inp_encode(x) if (self.conditional and self.enc_input) else x]
        if self.sigma_conditioned:
            parts.append(std)
        row_in = jnp.concatenate(parts, axis=-1) if len(parts) > 1 else parts[0]
        h = self.trunk_l0_row(row_in)
        if ctx_l0 is not None:
            n = x.shape[0]
            bsz = ctx_l0.shape[0]
            nz = n // bsz
            # broadcast INSIDE the add between two bitcast reshapes — a
            # broadcast_to(...).reshape(n, h) materializes an (n, h) copy
            # (measured ~1 ms/step at canonical flagship shapes, profiler)
            h = (h.reshape(bsz, nz, self.h_dim) + ctx_l0[:, None, :]).reshape(
                n, self.h_dim)
        h = get_nonlinear_func(self.nonlinearity)(h)
        return self.trunk_rest(h)

    def ctx_l0(self, ctx):
        """Per-item context features -> first-layer contribution (bsz, h)."""
        return self.trunk_l0_ctx(self.encode_ctx(ctx))

    def raw_score(self, x, ctx_l0, std):
        """Direct-score path: (n, z_dim) rows -> (n, z_dim) scores."""
        assert self.score_type == "res"
        return self._trunk(x, ctx_l0, std)

    def energy(self, x, ctx_l0, std):
        """Scalar neg-log-prob per row (gradient style), (n,) shaped."""
        assert self.score_type == "grad"
        return self._trunk(x, ctx_l0, std)[:, 0]

    def __call__(self, x, context, std):
        # full path (used for flax init so every submodule gets parameters):
        # context here is the RAW context, not pre-encoded features.
        ctx_l0 = self.ctx_l0(context) if self.conditional else None
        if self.score_type == "res":
            return self.raw_score(x, ctx_l0, std)
        return self.energy(x, ctx_l0, std)


def _flatten3(t):
    return t.reshape(-1, t.shape[-1])


def _ctx_l0(module, params, context):
    """Per-item first-layer context contribution (computed ONCE per item;
    broadcast-added inside the trunk)."""
    if context.ndim == 3:
        context = context.reshape(context.shape[0], -1)
    return module.apply(params, context, method=module.ctx_l0)


def cdae_score(module, params, latent, context, std):
    """glogprob: score estimate at ``latent`` given context and noise level.

    latent: (bsz, ssz, z_dim); context: (bsz, ctx_dim) or (bsz, 1, ctx_dim);
    std: scalar or (bsz, ssz, 1). Returns (bsz, ssz, z_dim).
    Matches reference resdae/mlp.py:383-413 & graddae/mlp.py:446-483.
    """
    bsz, ssz, zdim = latent.shape
    x = _flatten3(latent)
    ctx = _ctx_l0(module, params, context)
    stdv = jnp.broadcast_to(jnp.asarray(std, latent.dtype), (bsz, ssz, 1)).reshape(-1, 1)

    if module.score_type == "res":
        score = module.apply(params, x, ctx, stdv, method=module.raw_score)
    else:

        def neg_energy_sum(xx):
            return -jnp.sum(module.apply(params, xx, ctx, stdv, method=module.energy))

        score = jax.grad(neg_energy_sum)(x)
    return score.reshape(bsz, ssz, zdim)


def cdae_loss(module, params, key, latent, context, std,
              noise_type: str = "gaussian", compute_dtype=None):
    """Denoising score-matching loss: mse(sigma * score(x + sigma*eps), -eps).

    Matches reference resdae/mlp.py:344-381 / graddae/mlp.py:400-444
    (mse reduction = mean over every element). ``std`` is the per-sample
    noise level sigma (bsz, ssz, 1) — in training it is itself drawn as
    sigma_i * N(0,1) by the caller (ivae_ardae.py:761).

    ``compute_dtype='bfloat16'`` runs the score network's matmuls in bf16
    (params cast inside, so fp32 master params receive fp32 grads through
    the cast's transpose) while the noise draw, the x + sigma*eps
    perturbation, and the sigma*score + eps loss product/reduction stay
    fp32. The fp32 loss product is what keeps the collapsed tiny-sigma
    regime of aux-family configs finite under bf16 (VALIDATION.md
    "precision attribution": the sigma collapse is a workload pathology in
    both precisions, but the hard NaN was bf16-triggered underflow).
    """
    bsz, ssz, zdim = latent.shape
    x = _flatten3(latent).astype(jnp.float32)
    stdv = jnp.broadcast_to(
        jnp.asarray(std, jnp.float32), (bsz, ssz, 1)).reshape(-1, 1)

    if noise_type == "gaussian":
        eps = jax.random.normal(key, x.shape, x.dtype)
        x_bar = x + stdv * eps
    elif noise_type == "laplace":
        eps = sample_laplace(key, x.shape, x.dtype)
        x_bar = x + stdv * eps
    elif noise_type == "uniform":
        # reference add_uniform_noise: x + 2*val*u - val with u~U(0,1)
        eps = jax.random.uniform(key, x.shape, x.dtype)
        x_bar = x + 2.0 * stdv * eps - stdv
    else:
        raise NotImplementedError(noise_type)

    if compute_dtype is not None:
        cd = jnp.dtype(compute_dtype)
        params = jax.tree.map(
            lambda a: a.astype(cd) if a.dtype == jnp.float32 else a, params)
        x_bar_c, ctx_in, stdv_c = x_bar.astype(cd), context.astype(cd), \
            stdv.astype(cd)
    else:
        x_bar_c, ctx_in, stdv_c = x_bar, context, stdv
    ctx = _ctx_l0(module, params, ctx_in)

    if module.score_type == "res":
        score = module.apply(params, x_bar_c, ctx, stdv_c,
                             method=module.raw_score)
    else:

        def neg_energy_sum(xx):
            return -jnp.sum(
                module.apply(params, xx, ctx, stdv_c, method=module.energy))

        score = jax.grad(neg_energy_sum)(x_bar_c)

    score = score.astype(jnp.float32)
    return jnp.mean((stdv * score + eps) ** 2)


# ---------------------------------------------------------------------------
# Unconditional variants (notebook workloads: dae_toy / ardae_toy / ardae_fit)
# ---------------------------------------------------------------------------

def dae_score(module, params, x, std):
    """Unconditional score: x is (n, input_dim); std scalar or (n, 1).

    Matches reference resdae/mlp.py:82-90,153-167 / graddae/mlp.py:101-116,186-207.
    """
    n = x.shape[0]
    stdv = jnp.broadcast_to(jnp.asarray(std, x.dtype), (n, 1))
    if module.score_type == "res":
        return module.apply(params, x, None, stdv, method=module.raw_score)

    def neg_energy_sum(xx):
        return -jnp.sum(module.apply(params, xx, None, stdv, method=module.energy))

    return jax.grad(neg_energy_sum)(x)


def dae_loss(module, params, key, x, std, noise_type: str = "gaussian"):
    """Unconditional denoising score-matching loss."""
    n = x.shape[0]
    stdv = jnp.broadcast_to(jnp.asarray(std, x.dtype), (n, 1))
    if noise_type == "gaussian":
        eps = jax.random.normal(key, x.shape, x.dtype)
        x_bar = x + stdv * eps
    elif noise_type == "laplace":
        eps = sample_laplace(key, x.shape, x.dtype)
        x_bar = x + stdv * eps
    else:
        raise NotImplementedError(noise_type)

    if module.score_type == "res":
        score = module.apply(params, x_bar, None, stdv, method=module.raw_score)
    else:

        def neg_energy_sum(xx):
            return -jnp.sum(module.apply(params, xx, None, stdv, method=module.energy))

        score = jax.grad(neg_energy_sum)(x_bar)
    return jnp.mean((stdv * score + eps) ** 2)


# -------------------------- named constructors -----------------------------

def MLPResCARDAE(input_dim, context_dim, h_dim=128, num_hidden_layers=1,
                 nonlinearity="tanh", enc_input=True, enc_ctx=True):
    """resdae ConditionalARDAE (reference models/resdae/mlp.py:286-413)."""
    return CARDAE(
        input_dim=input_dim, context_dim=context_dim, h_dim=h_dim,
        num_hidden_layers=num_hidden_layers, nonlinearity=nonlinearity,
        score_type="res", conditional=True, sigma_conditioned=True,
        enc_input=enc_input, enc_ctx=enc_ctx,
    )


def MLPGradCARDAE(input_dim, context_dim, h_dim=128, num_hidden_layers=1,
                  nonlinearity="tanh", enc_input=True, enc_ctx=True):
    """graddae ConditionalARDAE (reference models/graddae/mlp.py:341-483)."""
    return CARDAE(
        input_dim=input_dim, context_dim=context_dim, h_dim=h_dim,
        num_hidden_layers=num_hidden_layers, nonlinearity=nonlinearity,
        score_type="grad", conditional=True, sigma_conditioned=True,
        enc_input=enc_input, enc_ctx=enc_ctx,
    )


def MLPResCDAE(input_dim, context_dim, h_dim=128, num_hidden_layers=1,
               nonlinearity="tanh", enc_input=True, enc_ctx=True):
    """resdae ConditionalDAE, fixed sigma (reference resdae/mlp.py:170-284)."""
    return CARDAE(
        input_dim=input_dim, context_dim=context_dim, h_dim=h_dim,
        num_hidden_layers=num_hidden_layers, nonlinearity=nonlinearity,
        score_type="res", conditional=True, sigma_conditioned=False,
        enc_input=enc_input, enc_ctx=enc_ctx,
    )


def MLPGradCDAE(input_dim, context_dim, h_dim=128, num_hidden_layers=1,
                nonlinearity="tanh", enc_input=True, enc_ctx=True):
    """graddae ConditionalDAE (reference graddae/mlp.py:210-339)."""
    return CARDAE(
        input_dim=input_dim, context_dim=context_dim, h_dim=h_dim,
        num_hidden_layers=num_hidden_layers, nonlinearity=nonlinearity,
        score_type="grad", conditional=True, sigma_conditioned=False,
        enc_input=enc_input, enc_ctx=enc_ctx,
    )


def MLPResARDAE(input_dim, h_dim=1000, num_hidden_layers=1, nonlinearity="tanh"):
    """resdae ARDAE, unconditional (reference resdae/mlp.py:92-167)."""
    return CARDAE(
        input_dim=input_dim, h_dim=h_dim, num_hidden_layers=num_hidden_layers,
        nonlinearity=nonlinearity, score_type="res", conditional=False,
        sigma_conditioned=True,
    )


def MLPGradARDAE(input_dim, h_dim=1000, num_hidden_layers=1, nonlinearity="tanh"):
    """graddae ARDAE, unconditional (reference graddae/mlp.py:118-207)."""
    return CARDAE(
        input_dim=input_dim, h_dim=h_dim, num_hidden_layers=num_hidden_layers,
        nonlinearity=nonlinearity, score_type="grad", conditional=False,
        sigma_conditioned=True,
    )


def MLPResDAE(input_dim, h_dim=1000, num_hidden_layers=1, nonlinearity="tanh"):
    """resdae DAE, unconditional fixed-sigma (reference resdae/mlp.py:27-90)."""
    return CARDAE(
        input_dim=input_dim, h_dim=h_dim, num_hidden_layers=num_hidden_layers,
        nonlinearity=nonlinearity, score_type="res", conditional=False,
        sigma_conditioned=False,
    )


def MLPGradDAE(input_dim, h_dim=1000, num_hidden_layers=1, nonlinearity="tanh"):
    """graddae DAE, unconditional fixed-sigma (reference graddae/mlp.py:39-116)."""
    return CARDAE(
        input_dim=input_dim, h_dim=h_dim, num_hidden_layers=num_hidden_layers,
        nonlinearity=nonlinearity, score_type="grad", conditional=False,
        sigma_conditioned=False,
    )
