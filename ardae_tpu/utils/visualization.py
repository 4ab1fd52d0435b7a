"""Visualization panels for TensorBoard (reference utils/visualization.py).

All functions return HWC uint8-ish float arrays (matplotlib Agg render) or
CHW grids, matching the tags/layouts the reference writes so dashboards are
directly comparable (SURVEY.md 5, metrics/observability).
"""

import math

import numpy as np

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402


def convert_npimage_torchimage(image):
    """HWC [0..255] -> CHW float in [0,1] (reference :16-17 transposes only)."""
    return np.transpose(image, (2, 0, 1)).astype(np.float32) / 255.0


def _fig_to_np(fig):
    fig.canvas.draw()
    image = np.asarray(fig.canvas.buffer_rgba())[:, :, :3].copy()
    plt.close(fig)
    return image


def get_scatter_plot(data, xlim=4, ylim=4, alpha=0.1):
    """(reference utils/visualization.py:19-60)"""
    fig, ax = plt.subplots(figsize=(5, 5))
    ax.scatter(data[:, 0], data[:, 1], s=2, alpha=alpha)
    ax.set_xlim(-xlim, xlim)
    ax.set_ylim(-ylim, ylim)
    return _fig_to_np(fig)


def get_quiver_plot(grad, xs, ys, xlim=4.5, ylim=4.5):
    """Score-field quiver (reference :71-120)."""
    fig, ax = plt.subplots(figsize=(5, 5))
    ax.quiver(xs, ys, grad[:, 0], grad[:, 1])
    ax.set_xlim(-xlim, xlim)
    ax.set_ylim(-ylim, ylim)
    return _fig_to_np(fig)


def get_data_for_quiver_plot(val=4, num=20):
    """(reference :63-69)"""
    lin = np.linspace(-val, val, num)
    xs, ys = np.meshgrid(lin, lin)
    data = np.stack([xs.reshape(-1), ys.reshape(-1)], axis=1).astype(np.float32)
    return data, xs, ys


def get_prob_from_energy_func_for_vis(energy_func, val=4, num=256):
    """Normalized density heightmap from an energy function (reference :123-135)."""
    import jax.numpy as jnp

    lin = np.linspace(-val, val, num)
    xv, yv = np.meshgrid(lin, lin)
    pts = jnp.asarray(np.stack([xv.reshape(-1), yv.reshape(-1)], axis=1),
                      jnp.float32)
    energy = np.asarray(energy_func(pts)).reshape(num, num)
    prob = np.exp(-energy)
    return prob / max(prob.max(), 1e-12)


def get_imshow_plot(prob, val=4, use_grid=False):
    """(reference :137-159)"""
    fig, ax = plt.subplots(figsize=(5, 5))
    ax.imshow(prob, cmap="jet", extent=(-val, val, -val, val), origin="lower")
    ax.grid(use_grid)
    return _fig_to_np(fig)


def get_1d_histogram_plot(data, val=4, num=128):
    """(reference :161-191)"""
    fig, ax = plt.subplots(figsize=(5, 5))
    ax.hist(data, bins=num, range=(-val, val), density=True)
    return _fig_to_np(fig)


def get_2d_histogram_plot(data, val=4, num=128, use_grid=False):
    """(reference :193-228)"""
    hist, _, _ = np.histogram2d(
        data[:, 1], data[:, 0], bins=num, range=[[-val, val], [-val, val]]
    )
    fig, ax = plt.subplots(figsize=(5, 5))
    ax.imshow(hist, cmap="jet", extent=(-val, val, -val, val), origin="lower")
    ax.grid(use_grid)
    return _fig_to_np(fig)


def get_grid_image(images, batch_size, nchannels, nheight, nrow=8, pad=2):
    """Image grid -> CHW float in [0,1] (reference :230-238 wraps
    vutils.make_grid); pure-numpy implementation."""
    imgs = np.asarray(images).reshape(batch_size, nchannels, nheight, nheight)
    imgs = np.clip(imgs, 0.0, 1.0)
    n = min(batch_size, 64)
    ncol = min(nrow, n)
    nrows = math.ceil(n / ncol)
    H = nrows * (nheight + pad) + pad
    W = ncol * (nheight + pad) + pad
    grid = np.zeros((nchannels, H, W), np.float32)
    for i in range(n):
        r, c = divmod(i, ncol)
        y = pad + r * (nheight + pad)
        x = pad + c * (nheight + pad)
        grid[:, y : y + nheight, x : x + nheight] = imgs[i]
    return grid
