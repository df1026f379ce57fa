"""The communication backend, in one module (SURVEY.md §5.8).

The reference's only parallelism is DDP data parallelism with NCCL
all-reduce hidden inside PyTorch-Lightning (``train.py:118-120``,
``configs/config_px2px.yaml:60-63``).  TPU-natively that whole layer is: a
1-D ``jax.sharding.Mesh`` over the ``data`` axis, batches sharded on it,
parameters replicated, and the gradient all-reduce emitted *by the compiler*
inside the jitted train step, riding ICI.  Metric reduction (the reference's
``sync_dist=True``) is likewise free: metrics are means over the logically
global batch.

Multi-host: call ``jax.distributed.initialize()`` before ``create_mesh``
(DCN between hosts, ICI within a slice); nothing else changes.

A second ``spatial`` axis is reserved for sharding very large tiles across
chips with halo exchange (the conv-world analogue of context parallelism,
SURVEY.md §5.7) — see ``nirgan_tpu/parallel/spatial.py``.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = [
    "create_mesh",
    "batch_sharding",
    "replicated_sharding",
    "shard_batch",
    "replicate",
]


def create_mesh(axis_names: Sequence[str] = ("data",), devices=None,
                shape: Sequence[int] | None = None) -> Mesh:
    """Build a device mesh.  Default: all local devices on one ``data`` axis."""
    devices = list(devices if devices is not None else jax.devices())
    if shape is None:
        shape = [len(devices)] + [1] * (len(axis_names) - 1)
    arr = np.asarray(devices).reshape(tuple(shape))
    return Mesh(arr, tuple(axis_names))


def batch_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Leading-axis (batch) sharding."""
    return NamedSharding(mesh, P(axis))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch, axis: str = "data"):
    """Host arrays → device, batch-sharded across the mesh."""
    s = batch_sharding(mesh, axis)
    return jax.tree.map(lambda x: jax.device_put(x, s), batch)


def replicate(mesh: Mesh, tree):
    """Host arrays → device, fully replicated (params, opt state)."""
    s = replicated_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, s), tree)


def initialize_multihost(coordinator_address: str | None = None,
                         num_processes: int | None = None,
                         process_id: int | None = None) -> None:
    """Multi-host bootstrap (SURVEY.md §2.9: the reference's multi-node story
    is 'none'; TPU-natively it is one call).  On TPU pods the arguments are
    discovered from the environment; pass them explicitly elsewhere.  Call
    before ``create_mesh`` — ``jax.devices()`` then spans all hosts, gradient
    all-reduces ride ICI within a slice and DCN across slices."""
    import jax

    kwargs = {}
    if coordinator_address is not None:
        kwargs = dict(coordinator_address=coordinator_address,
                      num_processes=num_processes, process_id=process_id)
    jax.distributed.initialize(**kwargs)
