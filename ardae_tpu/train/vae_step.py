"""Jitted train step for the baseline (Gaussian-posterior) VAEs.

Reference vae.py:380-417: single optimizer, loss scaled by
1/(nchannels*nheight*nheight) before backward (the logged loss is the scaled
one), beta annealing, optional weight averaging.
"""

import dataclasses

import jax

from ardae_tpu.models.vae.api import vae_loss
from ardae_tpu.train.state import TrainState
from ardae_tpu.train.step import _update_weight_avg, StepConfig


@dataclasses.dataclass(frozen=True)
class VAEStepConfig:
    loss_scale: float = 1.0  # 1/(C*H*W) in the reference driver (vae.py:410)
    weight_avg: str = "none"
    weight_avg_start: int = 1000
    weight_avg_decay: float = 0.998


def build_vae_train_step(model, opt_m, cfg: VAEStepConfig):
    wa_cfg = StepConfig(
        weight_avg=cfg.weight_avg,
        weight_avg_start=cfg.weight_avg_start,
        weight_avg_decay=cfg.weight_avg_decay,
    )

    @jax.jit
    def step(state: TrainState, batch, key, beta):
        k = jax.random.fold_in(key, state.step)

        def loss_fn(p):
            loss, terms = vae_loss(model, p, k, batch, beta=beta)
            return cfg.loss_scale * loss, terms

        (loss, terms), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params_model
        )
        updates, opt_state = opt_m.update(grads, state.opt_model, state.params_model)
        params = jax.tree.map(lambda p, u: p + u, state.params_model, updates)
        state = state.replace(
            step=state.step + 1, params_model=params, opt_model=opt_state
        )
        state = _update_weight_avg(wa_cfg, state)
        metrics = {
            "loss": loss,
            "recon_loss": terms["recon"],
            "kld_loss": terms["kld"],
            "elbo": -(terms["recon"] + terms["kld"]),
        }
        return state, metrics

    return step
