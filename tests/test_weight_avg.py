"""SWA / Polyak weight averaging semantics (reference ivae_ardae.py:559-565
via torchcontrib: averaging starts at weight_avg_start, every step)."""

import jax
import jax.numpy as jnp
import numpy as np

from ardae_tpu.data.mnist import make_stacked_mnist, _resize_bilinear
from ardae_tpu.train.state import TrainState, create_train_state
from ardae_tpu.train.step import StepConfig, _update_weight_avg


def _mini_state(value, weight_avg):
    params = {"w": jnp.asarray(value)}
    return TrainState(
        step=jnp.zeros([], jnp.int32), params_model=params,
        opt_model=(), params_cdae={}, opt_cdae=(),
        avg_params_model={"w": jnp.asarray(value)},
        avg_count=jnp.zeros([], jnp.int32),
    )


def test_polyak_before_start_tracks_params():
    cfg = StepConfig(weight_avg="polyak", weight_avg_start=10,
                     weight_avg_decay=0.9)
    state = _mini_state(1.0, "polyak").replace(step=jnp.asarray(5, jnp.int32))
    state = state.replace(params_model={"w": jnp.asarray(3.0)})
    state = _update_weight_avg(cfg, state)
    assert float(state.avg_params_model["w"]) == 3.0  # not started: copy
    assert int(state.avg_count) == 0


def test_polyak_after_start_ema():
    cfg = StepConfig(weight_avg="polyak", weight_avg_start=0,
                     weight_avg_decay=0.9)
    state = _mini_state(1.0, "polyak").replace(step=jnp.asarray(1, jnp.int32))
    state = state.replace(params_model={"w": jnp.asarray(2.0)})
    state = _update_weight_avg(cfg, state)
    np.testing.assert_allclose(float(state.avg_params_model["w"]),
                               0.9 * 1.0 + 0.1 * 2.0)


def test_swa_running_mean():
    cfg = StepConfig(weight_avg="swa", weight_avg_start=0)
    state = _mini_state(0.0, "swa")
    for v in [2.0, 4.0, 6.0]:
        state = state.replace(params_model={"w": jnp.asarray(v)},
                              step=state.step + 1)
        state = _update_weight_avg(cfg, state)
    # running mean of 2, 4, 6
    np.testing.assert_allclose(float(state.avg_params_model["w"]), 4.0)
    assert int(state.avg_count) == 3


def test_stacked_mnist_labels():
    x = np.eye(10, 784, dtype=np.float32)
    y = np.arange(10, dtype=np.int64)
    imgs, labels = make_stacked_mnist(x, y, 10, seed=0)
    assert imgs.shape == (10, 3 * 784)
    assert ((labels >= 0) & (labels <= 999)).all()
    # last channel is deterministic (index % n)
    assert (labels % 10 == np.arange(10) % 10).all()


def test_resize_bilinear_32():
    x = np.random.default_rng(0).random((3, 784)).astype(np.float32)
    out = _resize_bilinear(x, 32)
    assert out.shape == (3, 1024)
    # mass approximately preserved under bilinear resize
    assert abs(out.mean() - x.mean()) < 0.05


def test_resize_bilinear_matches_torch_half_pixel():
    """mnist32 resize must follow the reference pipeline's convention:
    torchvision Resize == bilinear with align_corners=False (ADVICE r1)."""
    import torch
    import torch.nn.functional as F

    x = np.random.default_rng(3).random((5, 784)).astype(np.float32)
    ours = _resize_bilinear(x, 32).reshape(5, 32, 32)
    ref = F.interpolate(torch.from_numpy(x).reshape(5, 1, 28, 28),
                        size=(32, 32), mode="bilinear",
                        align_corners=False)[:, 0].numpy()
    np.testing.assert_allclose(ours, ref, atol=1e-5)
