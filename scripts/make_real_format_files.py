"""Write the synthetic surrogate out in the REAL on-disk formats.

Produces exactly the files the real-data loaders look for (reference
datasets/mnist.py:49-92 idx layout, datasets/sbmnist.py:21-80 Larochelle
amat layout), so the full parse -> split cache -> HBM -> binarize -> train
-> eval path can be rehearsed end to end before real MNIST files ever
arrive (round-1 VERDICT item 7):

  {root}/MNIST/raw/train-images-idx3-ubyte   (60000 x 28 x 28, big-endian)
  {root}/MNIST/raw/train-labels-idx1-ubyte
  {root}/MNIST/raw/t10k-images-idx3-ubyte    (10000)
  {root}/MNIST/raw/t10k-labels-idx1-ubyte
  {root}/bmnist/binarized_mnist_{train,valid,test}.amat  (50k/10k/10k x 784)

Usage: python scripts/make_real_format_files.py <root> [--small]
(--small writes 1/10-size files for fast tests).
"""
import os
import struct
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ardae_tpu.data.mnist import _synthetic_mnist


def write_idx_images(path, imgs01):
    """float [N, 784] in [0,1] -> idx3-ubyte."""
    n = imgs01.shape[0]
    arr = np.round(imgs01 * 255.0).astype(np.uint8).reshape(n, 28, 28)
    with open(path, "wb") as f:
        f.write(struct.pack(">IIII", 2051, n, 28, 28))
        f.write(arr.tobytes())


def write_idx_labels(path, labels):
    with open(path, "wb") as f:
        f.write(struct.pack(">II", 2049, labels.shape[0]))
        f.write(labels.astype(np.uint8).tobytes())


def write_amat(path, binary):
    """binary [N, 784] of {0,1} -> whitespace text matrix (Larochelle style)."""
    with open(path, "wb") as f:
        for row in binary.astype(np.uint8):
            f.write(b" ".join(b"1" if v else b"0" for v in row))
            f.write(b"\n")


def main():
    root = sys.argv[1]
    small = "--small" in sys.argv
    div = 10 if small else 1

    raw = os.path.join(root, "MNIST", "raw")
    os.makedirs(raw, exist_ok=True)
    tr_x, tr_y = _synthetic_mnist(60_000 // div, seed=1_000_001)
    te_x, te_y = _synthetic_mnist(10_000 // div, seed=1_000_003)
    write_idx_images(os.path.join(raw, "train-images-idx3-ubyte"), tr_x)
    write_idx_labels(os.path.join(raw, "train-labels-idx1-ubyte"), tr_y)
    write_idx_images(os.path.join(raw, "t10k-images-idx3-ubyte"), te_x)
    write_idx_labels(os.path.join(raw, "t10k-labels-idx1-ubyte"), te_y)

    bdir = os.path.join(root, "bmnist")
    os.makedirs(bdir, exist_ok=True)
    rng = np.random.default_rng(1_000_007)
    n_tr, n_va, n_te = 50_000 // div, 10_000 // div, 10_000 // div
    gray, _ = _synthetic_mnist(n_tr + n_va + n_te, seed=1_000_005)
    binary = (rng.random(gray.shape) < gray).astype(np.uint8)
    write_amat(os.path.join(bdir, "binarized_mnist_train.amat"), binary[:n_tr])
    write_amat(os.path.join(bdir, "binarized_mnist_valid.amat"),
               binary[n_tr:n_tr + n_va])
    write_amat(os.path.join(bdir, "binarized_mnist_test.amat"),
               binary[n_tr + n_va:])
    print(f"wrote idx ({tr_x.shape[0]}+{te_x.shape[0]}) and amat "
          f"({n_tr}/{n_va}/{n_te}) files under {root}")


if __name__ == "__main__":
    main()
