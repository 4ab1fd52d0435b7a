"""Annealing schedules as pure functions of the step index.

Equivalent of /root/reference/utils/msc.py:53-55; written so the step may be
either a Python int (host loop) or a traced jnp scalar (inside jit).
"""

import jax.numpy as jnp


def annealing_func(val_init, val_fin, val_annealing, step):
    """Linear ramp from val_init to val_fin over val_annealing steps.

    If ``val_annealing`` is None the final value is returned immediately,
    matching the reference (interval<1 is normalized to None by the drivers).
    """
    if val_annealing is None:
        return val_fin
    frac = jnp.minimum(float(val_annealing), step) / float(val_annealing)
    return val_init + (val_fin - val_init) * frac
