"""TrainState: one pytree holding both networks' params + optimizer states.

Checkpointing this single pytree (plus the base PRNG key) makes runs exactly
resumable — including the noise sequence, which the reference's global torch
RNG cannot restore (SURVEY.md 5, checkpoint/resume).
"""

from typing import Any

import flax.struct
import jax
import jax.numpy as jnp


@flax.struct.dataclass
class TrainState:
    step: jnp.ndarray  # global iteration i_ep (int32)
    params_model: Any
    opt_model: Any
    params_cdae: Any
    opt_cdae: Any
    # weight-averaging buffer for the model params ('none' keeps it = params)
    avg_params_model: Any = None
    avg_count: jnp.ndarray = flax.struct.field(default=None)


def create_train_state(params_model, opt_model_tx, params_cdae, opt_cdae_tx,
                       weight_avg: str = "none"):
    return TrainState(
        step=jnp.zeros([], jnp.int32),
        params_model=params_model,
        opt_model=opt_model_tx.init(params_model),
        params_cdae=params_cdae,
        opt_cdae=opt_cdae_tx.init(params_cdae),
        # independent copy: donation-safe (no aliasing with params_model)
        avg_params_model=(
            jax.tree.map(jnp.array, params_model) if weight_avg != "none" else None
        ),
        avg_count=jnp.zeros([], jnp.int32) if weight_avg != "none" else None,
    )
