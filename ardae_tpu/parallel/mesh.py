"""Device mesh + sharding utilities.

The reference is single-GPU with no parallelism whatsoever (SURVEY.md 2.8).
Here data parallelism is first-class and free: one 1-D mesh over all chips,
batches sharded on axis 0, params replicated. Everything else is unchanged —
XLA inserts the psum for the gradient all-reduce over ICI when the jitted
step consumes sharded batches with replicated params.

The per-item sigma statistics (std over the nz axis) are local to each
example, so the AR-DAE phase is embarrassingly data-parallel.

The sample axis (nz_cdae up to 625) is this workload's analogue of a long
sequence axis; ``sample_parallel_mesh`` exposes a second mesh axis to shard
it when a single chip's HBM cannot hold bsz*nz activations.
"""

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None, axis_name: str = "data") -> Mesh:
    """1-D data-parallel mesh over the first n devices (default: all)."""
    devs = jax.devices()
    if n_devices is not None:
        if n_devices > len(devs):
            raise ValueError(
                f"mesh needs {n_devices} devices but only {len(devs)} "
                "are available")
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (axis_name,))


def sample_parallel_mesh(data: int, sample: int) -> Mesh:
    """2-D (data, sample) mesh: shard the batch AND the nz sample axis."""
    devs = jax.devices()
    if data * sample > len(devs):
        raise ValueError(
            f"mesh needs {data * sample} devices but only {len(devs)} "
            "are available")
    return Mesh(np.array(devs[: data * sample]).reshape(data, sample),
                ("data", "sample"))


def batch_sharding(mesh: Mesh, axis_name: str = "data") -> NamedSharding:
    """Shard axis 0 of a batch across the mesh's data axis."""
    return NamedSharding(mesh, P(axis_name))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
