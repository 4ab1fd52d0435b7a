"""Data pipeline tests: toy generators, MNIST splits, device iterator."""

import pytest
import os
import tempfile

import jax
import jax.numpy as jnp
import numpy as np

from ardae_tpu.data import get_dataset
from ardae_tpu.data.loader import DeviceEpochIterator, EvalBatcher
from ardae_tpu.data.toy import generate_toy_data, toy_logpdf


def test_25gaussians_structure(tmp_path):
    sizes = dict(train=2500, val=250, test=250)
    splits = generate_toy_data("25gaussians", sizes=sizes, cache_dir=str(tmp_path))
    x, y = splits["train"]
    assert x.shape == (2500, 2) and y.shape == (2500,)
    # each of the 25 modes gets an equal share, points near their mode
    lin = np.linspace(-4, 4, 5)
    xv, yv = np.meshgrid(lin, lin)
    modes = np.stack([xv.ravel(), yv.ravel()], 1)
    d = np.linalg.norm(x[:, None] - modes[None], axis=-1).min(1)
    assert np.mean(d < 1.5) > 0.98
    # caching: second call loads identical data
    again = generate_toy_data("25gaussians", sizes=sizes, cache_dir=str(tmp_path))
    np.testing.assert_array_equal(again["train"][0], x)


def test_swissroll_scale(tmp_path):
    sizes = dict(train=2000, val=200, test=200)
    splits = generate_toy_data("swissroll", sizes=sizes, cache_dir=str(tmp_path))
    x, _ = splits["train"]
    assert np.abs(x).max() < 6.0  # /3 scaling keeps it in ~[-5, 5]


def test_toy_logpdf_normalization():
    logpdf = toy_logpdf("25gaussians")
    # integrate on a grid
    lin = np.linspace(-8, 8, 400)
    xv, yv = np.meshgrid(lin, lin)
    pts = jnp.asarray(np.stack([xv.ravel(), yv.ravel()], 1), jnp.float32)
    p = np.exp(np.array(logpdf(pts)))
    integral = p.sum() * (lin[1] - lin[0]) ** 2
    assert abs(integral - 1.0) < 0.02


@pytest.mark.slow
def test_mnist_splits_and_persistence(tmp_path):
    root = str(tmp_path)
    d1 = get_dataset("dbmnist-val5k", root=root)
    assert d1["train"].shape == (55000, 784)
    assert d1["val"].shape == (5000, 784)
    assert d1["test"].shape == (10000, 784)
    assert d1["info"]["binarize"] is True
    assert d1["train"].min() >= 0.0 and d1["train"].max() <= 1.0
    # the split permutation must be cached and reused
    d2 = get_dataset("dbmnist-val5k", root=root)
    np.testing.assert_array_equal(d1["val"][:10], d2["val"][:10])
    # final mode trains on all 60k
    d3 = get_dataset("dbmnist-val5k", root=root, final_mode=True)
    assert d3["train"].shape == (60000, 784) and d3["val"] is None


@pytest.mark.slow
def test_sbmnist_fallback_binary(tmp_path):
    d = get_dataset("sbmnist", root=str(tmp_path))
    assert d["train"].shape == (50000, 784)
    vals = np.unique(d["train"][:100])
    assert set(vals).issubset({0.0, 1.0})
    # static binarization: same values on re-load
    d2 = get_dataset("sbmnist", root=str(tmp_path))
    np.testing.assert_array_equal(d["train"][:5], d2["train"][:5])


def test_device_iterator_epoch_accounting():
    data = np.arange(100, dtype=np.float32).reshape(50, 2)
    it = DeviceEpochIterator(data, batch_size=8, key=jax.random.PRNGKey(0))
    assert it.iters_per_epoch == 6
    seen = [np.array(it.next()) for _ in range(6)]
    allrows = np.concatenate(seen)
    assert allrows.shape == (48, 2)
    # within an epoch no duplicates
    assert len(np.unique(allrows[:, 0])) == 48


def test_device_iterator_binarize():
    data = np.full((32, 4), 0.5, np.float32)
    it = DeviceEpochIterator(data, batch_size=8, key=jax.random.PRNGKey(0),
                             binarize=True)
    b1 = np.array(it.next())
    assert set(np.unique(b1)).issubset({0.0, 1.0})
    b2 = np.array(it.next())
    assert not np.array_equal(b1, b2)  # re-binarized per fetch


def test_eval_batcher_covers_all():
    data = np.arange(20, dtype=np.float32).reshape(10, 2)
    batches = list(EvalBatcher(data, batch_size=4))
    assert sum(b.shape[0] for b in batches) == 10


@pytest.mark.slow
def test_mnist32_and_cmnist_dispatch(tmp_path):
    d32 = get_dataset("mnist32", root=str(tmp_path))
    assert d32["train"].shape[1] == 32 * 32
    assert d32["info"]["binarize"] is False
    dc = get_dataset("cmnist", root=str(tmp_path))
    assert dc["info"]["center"] is True and dc["train"].shape[1] == 784


def test_labels_fallback_flag_and_warning(tmp_path):
    """Real idx image files + missing label files → zero labels with an
    explicit warning and info['labels_fallback']=True (ADVICE r1)."""
    import struct
    import warnings

    import numpy as np

    from ardae_tpu.data.mnist import get_mnist

    raw = tmp_path / "MNIST" / "raw"
    raw.mkdir(parents=True)
    rng = np.random.default_rng(0)
    for name, n in (("train-images-idx3-ubyte", 64),
                    ("t10k-images-idx3-ubyte", 32)):
        payload = rng.integers(0, 256, (n, 28, 28), dtype=np.uint8)
        with open(raw / name, "wb") as f:
            f.write(struct.pack(">IIII", 2051, n, 28, 28))
            f.write(payload.tobytes())
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        out = get_mnist("mnist", root=str(tmp_path))
    assert out["info"]["labels_fallback"] is True
    assert out["info"]["synthetic"] is False
    assert any("label files missing" in str(x.message) for x in w)
    labels = out["info"]["labels"]
    assert (labels["test"] == 0).all()
