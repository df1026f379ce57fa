"""shard_batch edge semantics: uneven batches (reference val batch 5, tail
batches) fall back to replicated placement single-process; multi-process
sizing errors are explicit."""

import numpy as np
import jax

from nirgan_tpu.parallel import batch_sharding, create_mesh, shard_batch


def test_uneven_batch_replicates():
    mesh = create_mesh(("data",))
    assert mesh.devices.size == 8
    b = shard_batch(mesh, {"x": np.zeros((5, 4), np.float32),
                           "y": np.zeros((8, 4), np.float32)})
    assert b["x"].sharding.is_fully_replicated          # 5 % 8 != 0
    assert not b["y"].sharding.is_fully_replicated      # 8 % 8 == 0
    assert b["y"].sharding == batch_sharding(mesh)


def test_uneven_batch_computes_correctly():
    """An uneven (replicated) batch still runs through a jitted reduction
    identically to host numpy."""
    import jax.numpy as jnp

    mesh = create_mesh(("data",))
    x = np.arange(5 * 3, dtype=np.float32).reshape(5, 3)
    b = shard_batch(mesh, {"x": x})
    got = float(jax.jit(lambda t: jnp.sum(t["x"] * 2))(b))
    assert got == float(x.sum() * 2)
