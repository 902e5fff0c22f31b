"""Device mesh + sharding helpers (the NCCL/DDP replacement, SURVEY.md §2.10).

The reference's parallelism is one-process-per-GPU DDP over NCCL
(utils/dist.py:210-213). TPU-native equivalent: a jax.sharding.Mesh with a
'data' axis (batch/videos) and an optional 'frames' axis (the natural
"sequence parallelism" for video: frames of one clip spread across chips,
with XLA inserting the halo collectives for any cross-frame op). Gradients
and metrics reduce via XLA collectives emitted by jit — no hand-written
communication.

Multi-host: call jax.distributed.initialize() before building the mesh
(utils/dist.py SLURM-parse equivalent is the runner's job; JAX handles
coordinator bootstrap natively).
"""

from __future__ import annotations

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_data: int | None = None, n_frames: int = 1, devices=None) -> Mesh:
    """Mesh over ('data', 'frames'). Defaults: all devices on the data axis."""
    devices = list(devices if devices is not None else jax.devices())
    if n_data is None:
        n_data = len(devices) // n_frames
    devs = np.asarray(devices[: n_data * n_frames]).reshape(n_data, n_frames)
    return Mesh(devs, ("data", "frames"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh, ndim: int, frames_axis: int | None = None) -> NamedSharding:
    """Shard axis 0 over 'data' (and optionally one axis over 'frames')."""
    spec = [None] * ndim
    spec[0] = "data"
    if frames_axis is not None and mesh.shape["frames"] > 1:
        spec[frames_axis] = "frames"
    return NamedSharding(mesh, P(*spec))


def shard_batch(mesh: Mesh, batch, frames_axis: int | None = None):
    """Device-put a pytree of arrays with batch sharding."""
    return jax.tree_util.tree_map(
        lambda a: jax.device_put(a, batch_sharding(mesh, a.ndim, frames_axis)), batch)
