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
    "pad_batch",
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


def pad_batch(batch: dict, quota: int) -> dict:
    """Pad a dict batch's leading dim up to a multiple of ``quota`` by
    repeating the last row, and record the real rows in a ``_valid`` f32
    mask.  Metric code masks the padded rows out (``calculate_metrics``);
    edge-repeat (not zeros) keeps padded activations in-distribution so
    debug-NaN checks stay quiet."""
    b = next(np.shape(v)[0] for v in batch.values()
             if not isinstance(v, (list, str)))
    target = -(-b // quota) * quota
    if target == b and "_valid" in batch:
        return batch
    mask = np.zeros(target, np.float32)
    mask[:b] = 1.0

    def pad1(x):
        if isinstance(x, (list, str)):
            return x
        x = np.asarray(x)
        if x.shape[0] == target:
            return x
        reps = np.repeat(x[-1:], target - x.shape[0], axis=0)
        return np.concatenate([x, reps], axis=0)

    out = {k: pad1(v) for k, v in batch.items()}
    out["_valid"] = mask
    return out


def shard_batch(mesh: Mesh, batch, axis: str = "data",
                pad_uneven: bool = False):
    """Host arrays → device, batch-sharded across the mesh.

    Single-process: plain ``device_put``.  Multi-process (the mesh spans
    devices of other hosts, i.e. after ``initialize_multihost``): each host
    passes its *local* slice of the global batch — the per-host batch its
    ``Loader(process_index, process_count)`` yields — and the global array is
    assembled with ``jax.make_array_from_process_local_data`` (global batch =
    per-host batch × participating hosts, no cross-host data movement).

    ``pad_uneven=True`` (dict batches only): a batch whose size does not
    divide the mesh is edge-padded up to the next multiple and a ``_valid``
    row mask is attached — validation work then scales with the mesh instead
    of running replicated (single-process fallback) or failing divisibility
    (multi-process).  All processes must still pass equal-size local batches
    (``drop_last=True`` loaders guarantee it), since the common pad target is
    computed from the local size.

    Without padding, multi-process callers MUST pass sizes that divide the
    mesh: sizes are not cross-checked, and unequal ones would imply
    inconsistent global shapes across processes."""
    s = batch_sharding(mesh, axis)
    n_shards = int(np.prod([mesh.shape[a] for a in (axis,) if a in mesh.shape]))
    procs = {d.process_index for d in mesh.devices.flat}
    if pad_uneven and isinstance(batch, dict):
        batch = pad_batch(batch, max(1, n_shards // len(procs)))
    if len(procs) <= 1:
        repl = replicated_sharding(mesh)

        def put1(x):
            # uneven batches (val batch 5, tail batches) can't split over the
            # mesh — run them replicated instead of failing divisibility
            target = s if np.shape(x)[0] % n_shards == 0 else repl
            return jax.device_put(x, target)

        return jax.tree.map(put1, batch)

    def put(x):
        x = np.asarray(x)
        if (x.shape[0] * len(procs)) % n_shards:
            raise ValueError(
                f"multi-process batch of global size {x.shape[0] * len(procs)} "
                f"does not divide over the {n_shards}-way '{axis}' mesh; pick "
                f"a per-host batch size that is a multiple of "
                f"{n_shards // len(procs)} (or shard with pad_uneven=True)")
        global_shape = (x.shape[0] * len(procs),) + x.shape[1:]
        return jax.make_array_from_process_local_data(s, x, global_shape)

    return jax.tree.map(put, batch)


def replicate(mesh: Mesh, tree):
    """Host arrays → device, fully replicated (params, opt state).

    Multi-process meshes: ``device_put`` refuses non-addressable shardings,
    so each process fills its local shards from its host copy
    (``make_array_from_callback``) — every process must hold the same values
    (e.g. identically-seeded ``init_state``), as with any SPMD framework."""
    s = replicated_sharding(mesh)
    procs = {d.process_index for d in mesh.devices.flat}
    if len(procs) <= 1:
        return jax.tree.map(lambda x: jax.device_put(x, s), tree)

    def put(x):
        if jax.dtypes.issubdtype(getattr(x, "dtype", None), jax.dtypes.prng_key):
            data = np.asarray(jax.device_get(jax.random.key_data(x)))
            arr = jax.make_array_from_callback(
                data.shape, s, lambda idx: data[idx])
            return jax.random.wrap_key_data(arr, impl=jax.random.key_impl(x))
        x = np.asarray(jax.device_get(x))
        return jax.make_array_from_callback(x.shape, s, lambda idx: x[idx])

    return jax.tree.map(put, tree)


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
