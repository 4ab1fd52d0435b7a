"""Toy 2-D datasets: swissroll, single gaussian, 3-gaussian, 25-gaussians grid.

TPU-native rebuild of the reference generators (datasets/toy.py:55-345):
same distributions and split sizes (2M train / 20k test / 2k val by default),
but numpy-vectorized with an explicit seeded Generator (the reference draws
from torch's global RNG), cached as ``.npz`` instead of pickled ``.pt``, and
with a *working* normalized log-pdf for the Gaussian mixtures — the
reference computes pdfs but returns ``None`` for all of them
(datasets/toy.py:120-122, :252-254) and its exp3 pdf has a syntax-level bug
(:185); documented, not replicated.
"""

import math
import os

import numpy as np

__all__ = ["generate_toy_data", "toy_logpdf", "get_toy_dataset"]

_DEFAULT_SIZES = dict(train=2_000_000, test=20_000, val=2_000)


def _mixture_modes(name):
    """(means [N,2], std) for the Gaussian-mixture toys."""
    if name == "25gaussians":
        # reference exp4 (datasets/toy.py:196-254): 5x5 grid over [-4,4]^2,
        # per-mode variance 0.1
        lin = np.linspace(-4.0, 4.0, 5)
        xv, yv = np.meshgrid(lin, lin)
        mu = np.stack([xv.ravel(), yv.ravel()], axis=1)
        return mu.astype(np.float64), math.sqrt(0.1)
    if name == "gaussian":
        # reference exp1 (:78-128): single standard normal
        return np.zeros((1, 2)), 1.0
    if name == "toy3":
        # reference exp3 (:125-185): modes (2,2), (2,-2), (-2,-2), sigma 0.5
        return np.array([[2.0, 2.0], [2.0, -2.0], [-2.0, -2.0]]), 0.5
    raise NotImplementedError(f"no mixture modes for toy data: {name}")


def _sample_mixture(rng, num_data, mu, std):
    """Equal-share mixture sampling, laid out per-mode like the reference
    (datasets/toy.py:216-224: block i holds mode i's samples)."""
    n_modes = mu.shape[0]
    per = num_data // n_modes
    rem = num_data - per * n_modes
    counts = np.full(n_modes, per, np.int64)
    counts[:rem] += 1  # reference requires exact divisibility; we distribute
    x = np.empty((num_data, 2), np.float32)
    label = np.empty(num_data, np.int64)
    pos = 0
    for i in range(n_modes):
        c = int(counts[i])
        x[pos : pos + c] = rng.normal(mu[i], std, size=(c, 2))
        label[pos : pos + c] = i
        pos += c
    return x, label


def _swissroll(rng, num_data):
    """Reference get_swissroll (datasets/toy.py:55-76): sklearn swiss roll,
    noise 0.75, (x, z) plane, /3 scaling."""
    import sklearn.datasets

    data, _ = sklearn.datasets.make_swiss_roll(
        n_samples=num_data, noise=0.75,
        random_state=np.random.RandomState(rng.integers(0, 2**31 - 1)),
    )
    x = (data[:, [0, 2]] / 3.0).astype(np.float32)
    return x, np.zeros(num_data, np.int64)


def _exp1(rng, num_data):
    return _sample_mixture(rng, num_data, *_mixture_modes("gaussian"))


def _exp3(rng, num_data):
    return _sample_mixture(rng, num_data, *_mixture_modes("toy3"))


def _exp4(rng, num_data):
    return _sample_mixture(rng, num_data, *_mixture_modes("25gaussians"))


_GENERATORS = {
    "swissroll": _swissroll,
    "gaussian": _exp1,
    "toy3": _exp3,
    "25gaussians": _exp4,
}


def generate_toy_data(name, sizes=None, cache_dir="data/toy", seed=20_200_616):
    """Generate (or load cached) train/val/test splits for a toy dataset.

    Returns ``{"train": (x, y), "val": (x, y), "test": (x, y)}`` with
    float32 ``x: [N, 2]`` and int64 labels. Mirrors the reference's
    generate-once-then-cache contract (datasets/toy.py:256-291) with an
    explicit seed so splits are bit-reproducible across hosts.
    """
    if name not in _GENERATORS:
        raise NotImplementedError(f"no toy data: {name}")
    sizes = dict(_DEFAULT_SIZES, **(sizes or {}))
    os.makedirs(cache_dir, exist_ok=True)
    tag = "-".join(f"{k}{sizes[k]}" for k in ("train", "val", "test"))
    path = os.path.join(cache_dir, f"{name}-{tag}.npz")
    if os.path.exists(path):
        z = np.load(path)
        return {s: (z[f"{s}_x"], z[f"{s}_y"]) for s in ("train", "val", "test")}
    rng = np.random.default_rng(seed)
    gen = _GENERATORS[name]
    splits = {}
    # reference order: train, val, test (datasets/toy.py:261-263)
    for s in ("train", "val", "test"):
        splits[s] = gen(rng, int(sizes[s]))
    np.savez_compressed(
        path, **{f"{s}_x": splits[s][0] for s in splits},
        **{f"{s}_y": splits[s][1] for s in splits},
    )
    return splits


def toy_logpdf(name):
    """Normalized log-density of a mixture toy as a jittable jnp function.

    The reference defines these pdfs but never exposes them (returns None,
    datasets/toy.py:120-122); here they are first-class for tests and
    visualization. ``swissroll`` has no closed form and raises.
    """
    import jax.numpy as jnp
    from jax.scipy.special import logsumexp

    mu, std = _mixture_modes(name)
    mu_j = jnp.asarray(mu, jnp.float32)
    log_norm = -math.log(2.0 * math.pi * std * std)  # 2-D Gaussian
    inv2var = 1.0 / (2.0 * std * std)
    log_w = -math.log(mu.shape[0])

    def logpdf(x):
        d2 = jnp.sum((x[..., None, :] - mu_j) ** 2, axis=-1)  # [..., N]
        return logsumexp(log_w + log_norm - inv2var * d2, axis=-1)

    return logpdf


def get_toy_dataset(name, root="data", sizes=None):
    """Driver-facing wrapper: arrays + info (reference get_toy_dataset,
    datasets/toy.py:293-345 — loaders replaced by device-resident arrays)."""
    splits = generate_toy_data(name, sizes=sizes,
                               cache_dir=os.path.join(root, "toy"))
    try:
        logpdf = toy_logpdf(name)
        nclasses = _mixture_modes(name)[0].shape[0]
    except NotImplementedError:
        logpdf, nclasses = None, 1
    return {
        "train": splits["train"][0],
        "val": splits["val"][0],
        "test": splits["test"][0],
        "info": {
            "binarize": False,
            "center": False,
            "synthetic": False,
            "nclasses": nclasses,
            "logpdf": logpdf,
            "labels": {s: splits[s][1] for s in splits},
        },
    }
