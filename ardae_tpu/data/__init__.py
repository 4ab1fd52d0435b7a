"""Dataset dispatch (reference datasets/__init__.py:5-15).

``get_dataset(name)`` returns ``{"train", "val", "test", "info"}`` where the
splits are host numpy float32 [N, D] arrays (the drivers push them to HBM
once and stream int32 batch indices) instead of the reference's
(train_loader, val_loader, test_loader, info) DataLoader tuple.
"""

from .loader import DeviceEpochIterator, EvalBatcher  # noqa: F401
from .mnist import get_image_dataset
from .toy import get_toy_dataset

__all__ = ["get_dataset", "DeviceEpochIterator", "EvalBatcher"]

_TOY = ("swissroll", "toy3", "25gaussians", "gaussian")
_IMAGE = ("mnist", "cmnist", "dbmnist", "dbmnist-val5k", "sbmnist", "mnist32")


def get_dataset(name, root="data", final_mode=False, toy_sizes=None):
    if name in _TOY:
        # toy datasets have no final mode in the reference either
        # (vae.py:271 only forwards final_mode to image datasets)
        return get_toy_dataset(name, root=root, sizes=toy_sizes)
    if name in _IMAGE:
        return get_image_dataset(name, root=root, final_mode=final_mode)
    raise NotImplementedError(f"dataset: {name}")
