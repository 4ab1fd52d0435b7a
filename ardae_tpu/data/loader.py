"""Device-resident data iteration.

Replaces the reference's torch DataLoader machinery (num_workers=4 CPU
workers + pinned-memory copies per batch, datasets/mnist.py:129): the whole
split lives in HBM, epochs are shuffled host-side as int32 index arrays, and
dynamic binarization is a per-fetch on-device bernoulli draw (the reference
re-binarizes via a CPU transform on every epoch access,
datasets/mnist.py:38-40 — same semantics, no host traffic).

The CLI drivers use the lower-level ``IndexStream`` (cli/common.py) to feed
the scanned multi-step chunk; ``DeviceEpochIterator`` is the one-batch-at-a-
time equivalent for simple loops and examples, and ``EvalBatcher`` covers an
eval split including the ragged tail.
"""

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["DeviceEpochIterator", "EvalBatcher"]


class DeviceEpochIterator:
    """Shuffled, drop-remainder batch iterator over an HBM-resident array."""

    def __init__(self, data, batch_size, key, binarize=False):
        self.data = jnp.asarray(data)
        self.bs = int(batch_size)
        self.n = int(self.data.shape[0])
        self.iters_per_epoch = self.n // self.bs
        if self.iters_per_epoch == 0:
            raise ValueError(
                f"batch_size {batch_size} exceeds dataset size {self.n}")
        self.binarize = bool(binarize)
        self._key = key
        self._fetches = 0
        self._epoch = 0
        self._pos = 0
        self._perm = self._shuffle()

    def _shuffle(self):
        seed = np.asarray(
            jax.random.key_data(jax.random.fold_in(self._key, self._epoch))
        ).ravel()
        rng = np.random.default_rng([int(s) for s in seed])
        return rng.permutation(self.n)

    def next(self):
        if self._pos + self.bs > self.iters_per_epoch * self.bs:
            self._epoch += 1
            self._pos = 0
            self._perm = self._shuffle()
        idx = jnp.asarray(
            self._perm[self._pos : self._pos + self.bs].astype(np.int32))
        self._pos += self.bs
        batch = jnp.take(self.data, idx, axis=0)
        if self.binarize:
            kb = jax.random.fold_in(self._key, 2_000_003 + self._fetches)
            batch = jax.random.bernoulli(kb, batch).astype(jnp.float32)
        self._fetches += 1
        return batch

    def __iter__(self):
        return self

    def __next__(self):
        return self.next()


class EvalBatcher:
    """Sequential batches over an eval split; the tail batch is included
    (eval bounds are per-item means — every item must count, reference
    ivae_ardae.py:652-668)."""

    def __init__(self, data, batch_size):
        self.data = np.asarray(data)
        self.bs = int(batch_size)

    def __iter__(self):
        for start in range(0, self.data.shape[0], self.bs):
            yield self.data[start : start + self.bs]

    def __len__(self):
        return -(-self.data.shape[0] // self.bs)
