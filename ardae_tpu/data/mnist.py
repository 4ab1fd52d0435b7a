"""MNIST-family datasets: dynamic/static binarization, val splits, mnist32.

TPU-native rebuild of the reference pipelines (datasets/mnist.py:28-145,
datasets/sbmnist.py:21-80). Differences by design:

- Arrays, not DataLoaders: splits are returned as float32 [N, D] numpy
  arrays that the drivers push to HBM once; *dynamic binarization* — a CPU
  ``torch.bernoulli`` transform applied on every epoch access in the
  reference (datasets/mnist.py:38-40) — happens on-device per fetch
  (data/loader.py / train step's ``binarize`` flag) so the host never
  re-materializes the binarized copies.
- The train/val split permutation is cached to disk and reused, like the
  reference's ``data/MNIST/{ds}-val{n}-split.pt`` (datasets/mnist.py:60-67),
  but the permutation itself is seeded (the reference draws it from the
  *unseeded* global numpy RNG, so two fresh checkouts silently train on
  different splits — documented, not replicated).
- Zero-egress fallback: this build environment cannot download MNIST. If
  the real idx files (``{root}/MNIST/raw/``) or Larochelle amat files
  (``{root}/bmnist/``) are absent, a deterministic class-structured
  synthetic surrogate is generated and flagged via ``info["synthetic"]``.
  Drop the real files in and everything picks them up automatically.
"""

import os

import numpy as np

from .native import load_amat, load_idx_images, load_idx_labels

__all__ = [
    "get_mnist", "get_sbmnist", "get_image_dataset",
    "make_stacked_mnist",
]

_N_TRAIN, _N_TEST = 60_000, 10_000
_SB_TRAIN, _SB_VAL, _SB_TEST = 50_000, 10_000, 10_000


# ---------------------------------------------------------------------------
# synthetic surrogate (deterministic; zero-egress environments only)
# ---------------------------------------------------------------------------

def _upsample_bilinear_field(f, out):
    """[h, w] → [out, out] align-corners bilinear (for template synthesis)."""
    h, w = f.shape
    yi = np.linspace(0, h - 1, out)
    xi = np.linspace(0, w - 1, out)
    y0 = np.clip(yi.astype(np.int64), 0, h - 2)
    x0 = np.clip(xi.astype(np.int64), 0, w - 2)
    wy = (yi - y0)[:, None]
    wx = (xi - x0)[None, :]
    a = f[y0][:, x0]
    b = f[y0][:, x0 + 1]
    c = f[y0 + 1][:, x0]
    d = f[y0 + 1][:, x0 + 1]
    return (a * (1 - wy) * (1 - wx) + b * (1 - wy) * wx
            + c * wy * (1 - wx) + d * wy * wx)


def _class_templates(n_classes=10, size=28, seed=777):
    """Crisp per-class ink patterns in [0, 1] (shared by every split).

    Real MNIST statistics matter for comparable NLL scales: backgrounds are
    exactly 0 (zero binarization entropy) and ink pixels are mostly
    saturated, with ~13-16% ink coverage. A steep sigmoid over a smooth
    random field reproduces that profile."""
    rng = np.random.default_rng(seed)
    tpl = np.empty((n_classes, size, size), np.float32)
    for c in range(n_classes):
        field = _upsample_bilinear_field(rng.normal(size=(7, 7)), size)
        field = (field - field.mean()) / (field.std() + 1e-8)
        tpl[c] = 1.0 / (1.0 + np.exp(-12.0 * (field - 1.1)))
    return tpl


def _synthetic_mnist(n, seed):
    """Deterministic MNIST-shaped surrogate: class template + small integer
    translation + amplitude jitter + ink-masked pixel noise, clipped to
    [0, 1]. Background pixels stay exactly 0 so the dynamic-binarization
    entropy floor is dominated by edge pixels, as with real MNIST (keeps
    NLLs on a comparable scale)."""
    rng = np.random.default_rng(seed)
    labels = rng.integers(0, 10, n)
    tpl = _class_templates()
    imgs = tpl[labels].copy()
    sx = rng.integers(-2, 3, n)
    sy = rng.integers(-2, 3, n)
    for dx in range(-2, 3):
        for dy in range(-2, 3):
            m = (sx == dx) & (sy == dy)
            if m.any():
                imgs[m] = np.roll(np.roll(imgs[m], dx, axis=1), dy, axis=2)
    amp = rng.uniform(0.9, 1.0, (n, 1, 1)).astype(np.float32)
    noise = rng.normal(0.0, 0.08, (n, 28, 28)).astype(np.float32)
    out = imgs * amp + noise * (imgs > 0.05)
    out = np.clip(out, 0.0, 1.0).astype(np.float32)
    # snap the sigmoid's sub-1e-3 background tail to exactly 0 so the
    # "zero-entropy background" invariant holds literally (and static
    # binarization never flips a stray background pixel)
    out[out < 1e-3] = 0.0
    return out.reshape(n, 784), labels.astype(np.int64)


# ---------------------------------------------------------------------------
# real-file loaders
# ---------------------------------------------------------------------------

def _load_mnist_arrays(root):
    """(train_x, train_y, test_x, test_y, synthetic, labels_fallback): real
    idx files if present under {root}/MNIST/raw/, else the deterministic
    surrogate. labels_fallback=True means images are real but label files
    were missing/corrupt, so labels defaulted to zeros (warned)."""
    raw = os.path.join(root, "MNIST", "raw")
    tr_x = load_idx_images(os.path.join(raw, "train-images-idx3-ubyte"))
    te_x = load_idx_images(os.path.join(raw, "t10k-images-idx3-ubyte"))
    if tr_x is not None and te_x is not None:
        tr_y = load_idx_labels(os.path.join(raw, "train-labels-idx1-ubyte"))
        te_y = load_idx_labels(os.path.join(raw, "t10k-labels-idx1-ubyte"))
        labels_fallback = tr_y is None or te_y is None
        if labels_fallback:
            # Label-dependent outputs (stacked MNIST, per-class panels, split
            # label bookkeeping) would be silently wrong without a signal.
            import warnings

            warnings.warn(
                f"MNIST label files missing or unreadable under {raw}; "
                "labels default to all zeros (images are real). "
                "info['labels_fallback'] is set.", stacklevel=2)
        if tr_y is None:
            tr_y = np.zeros(tr_x.shape[0], np.int64)
        if te_y is None:
            te_y = np.zeros(te_x.shape[0], np.int64)
        return tr_x, tr_y, te_x, te_y, False, labels_fallback
    tr_x, tr_y = _synthetic_mnist(_N_TRAIN, seed=1_000_001)
    te_x, te_y = _synthetic_mnist(_N_TEST, seed=1_000_003)
    return tr_x, tr_y, te_x, te_y, True, False


def _load_sbmnist_arrays(root):
    """Larochelle statically-binarized splits (reference
    datasets/sbmnist.py:44-80) or a static-binarized surrogate."""
    d = os.path.join(root, "bmnist")
    paths = {s: os.path.join(d, f"binarized_mnist_{s}.amat")
             for s in ("train", "valid", "test")}
    if all(os.path.exists(p) for p in paths.values()):
        tr = load_amat(paths["train"], n_cols=784).astype(np.float32)
        va = load_amat(paths["valid"], n_cols=784).astype(np.float32)
        te = load_amat(paths["test"], n_cols=784).astype(np.float32)
        return tr, va, te, False
    # static binarization: one fixed bernoulli draw of the surrogate
    rng = np.random.default_rng(1_000_007)
    gray, _ = _synthetic_mnist(_SB_TRAIN + _SB_VAL + _SB_TEST, seed=1_000_005)
    binary = (rng.random(gray.shape) < gray).astype(np.float32)
    tr = binary[:_SB_TRAIN]
    va = binary[_SB_TRAIN:_SB_TRAIN + _SB_VAL]
    te = binary[_SB_TRAIN + _SB_VAL:]
    return tr, va, te, True


# ---------------------------------------------------------------------------
# transforms
# ---------------------------------------------------------------------------

def _resize_bilinear(x, out_size, in_size=28):
    """[N, in²] → [N, out²] half-pixel-centers bilinear, matching the
    reference mnist32 path (torchvision transforms.Resize ≡ bilinear with
    align_corners=False, datasets/mnist.py:69-72); verified against
    torch.nn.functional.interpolate in tests."""
    n = x.shape[0]
    imgs = x.reshape(n, in_size, in_size)
    scale = in_size / out_size
    yi = np.clip((np.arange(out_size) + 0.5) * scale - 0.5, 0, in_size - 1)
    y0 = np.clip(yi.astype(np.int64), 0, in_size - 2)
    wy = (yi - y0).astype(np.float32)
    rows = (imgs[:, y0, :] * (1 - wy)[None, :, None]
            + imgs[:, y0 + 1, :] * wy[None, :, None])
    cols = (rows[:, :, y0] * (1 - wy)[None, None, :]
            + rows[:, :, y0 + 1] * wy[None, None, :])
    return cols.reshape(n, out_size * out_size).astype(np.float32)


def make_stacked_mnist(x, y, n, seed=0):
    """3-channel stacked MNIST (reference StackedMNIST,
    datasets/mnist.py:16-33): channels 1-2 random, channel 3 = item index;
    label = 100*y1 + 10*y2 + y3."""
    rng = np.random.default_rng(seed)
    m = x.shape[0]
    i1 = rng.integers(0, m, n)
    i2 = rng.integers(0, m, n)
    i3 = np.arange(n) % m
    imgs = np.concatenate([x[i1], x[i2], x[i3]], axis=1)
    labels = 100 * y[i1] + 10 * y[i2] + y[i3]
    return imgs.astype(np.float32), labels.astype(np.int64)


# ---------------------------------------------------------------------------
# dataset builders
# ---------------------------------------------------------------------------

def _val_split_indices(root, dataset, n, val_size):
    """Cached split permutation (reference datasets/mnist.py:60-67)."""
    d = os.path.join(root, "MNIST")
    os.makedirs(d, exist_ok=True)
    path = os.path.join(d, f"{dataset}-val{val_size}-split.npz")
    if os.path.exists(path):
        return np.load(path)["indices"]
    indices = np.random.default_rng(n + val_size).permutation(n)
    # atomic publish: a second concurrent driver must never np.load a
    # half-written npz (content is deterministic, last-writer-wins is safe)
    tmp = path + f".{os.getpid()}.tmp.npz"  # .npz suffix: savez keeps name
    np.savez(tmp, indices=indices)
    os.replace(tmp, path)
    return indices


def get_mnist(dataset, root="data", final_mode=False):
    """mnist / cmnist / dbmnist / dbmnist-val5k / mnist32 splits
    (reference get_mnist, datasets/mnist.py:49-92)."""
    binary = dataset in ("dbmnist", "dbmnist-val5k")
    center = dataset == "cmnist"
    image_size = 32 if dataset == "mnist32" else 28
    val_size = 5_000 if dataset == "dbmnist-val5k" else 10_000

    tr_x, tr_y, te_x, te_y, synthetic, labels_fallback = \
        _load_mnist_arrays(root)
    if image_size != 28:
        tr_x = _resize_bilinear(tr_x, image_size)
        te_x = _resize_bilinear(te_x, image_size)

    if final_mode:
        train_x, train_y, val_x, val_y = tr_x, tr_y, None, None
    else:
        n = tr_x.shape[0]
        idx = _val_split_indices(root, dataset, n, val_size)
        train_x = tr_x[idx[: n - val_size]]
        train_y = tr_y[idx[: n - val_size]]
        val_x = tr_x[idx[n - val_size:]]
        val_y = tr_y[idx[n - val_size:]]

    return {
        "train": train_x,
        "val": val_x,
        "test": te_x,
        "info": {
            "binarize": binary,   # dynamic: re-drawn on device per fetch
            "center": center,     # consumer applies 2x-1 (models' do_center)
            "synthetic": synthetic,
            "labels_fallback": labels_fallback,  # real images, zero labels
            "nclasses": 10,
            "image_size": image_size,
            "labels": {"train": train_y, "val": val_y, "test": te_y},
        },
    }


def get_sbmnist(root="data", final_mode=False):
    """Statically binarized MNIST (reference get_sbmnist,
    datasets/mnist.py:94-123): final mode folds val into train."""
    tr, va, te, synthetic = _load_sbmnist_arrays(root)
    if final_mode:
        tr = np.concatenate([tr, va], axis=0)
        va = None
    return {
        "train": tr,
        "val": va,
        "test": te,
        "info": {
            "binarize": False,  # already binary on disk (static)
            "center": False,
            "synthetic": synthetic,
            "nclasses": 10,
            "image_size": 28,
        },
    }


def get_image_dataset(dataset, root="data", final_mode=False):
    """Name dispatch (reference get_image_dataset, datasets/mnist.py:125-145)."""
    if dataset in ("mnist", "cmnist", "dbmnist", "dbmnist-val5k", "mnist32"):
        return get_mnist(dataset, root=root, final_mode=final_mode)
    if dataset == "sbmnist":
        return get_sbmnist(root=root, final_mode=final_mode)
    raise NotImplementedError(f"dataset: {dataset}")
