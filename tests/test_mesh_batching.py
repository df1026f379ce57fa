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


def test_loader_process_slices_cover_uneven_corpus():
    """Loader(process_index/count) with drop_last=False must yield every
    item exactly once across hosts, including the ceil-slice tail (floor
    division dropped the last tile(s) of uneven corpora)."""
    from nirgan_tpu.data.pipeline import Loader

    class _Idx:
        def __len__(self):
            return 9

        def __getitem__(self, i):
            return {"i": np.asarray([i])}

    seen = []
    for pi in range(2):
        ld = Loader(_Idx(), batch_size=4, shuffle=False, drop_last=False,
                    process_index=pi, process_count=2)
        got = [int(v) for b in ld for v in b["i"].ravel()]
        assert len(got) == len(range(pi, 9, 2))
        seen += got
    assert sorted(seen) == list(range(9))


def test_loader_drop_last_is_host_invariant():
    """drop_last=True (the SPMD train/val loops): every host must yield the
    SAME number of batches regardless of its slice's ragged tail, or the
    per-batch collective programs desynchronize across processes."""
    from nirgan_tpu.data.pipeline import Loader

    class _Idx:
        def __init__(self, n):
            self.n = n

        def __len__(self):
            return self.n

        def __getitem__(self, i):
            return {"i": np.asarray([i])}

    for n in (15, 16, 17):
        counts = []
        for pi in range(2):
            ld = Loader(_Idx(n), batch_size=4, shuffle=False, drop_last=True,
                        process_index=pi, process_count=2)
            counts.append(sum(1 for _ in ld))
            assert counts[-1] == len(ld)
        assert counts[0] == counts[1], (n, counts)
        assert counts[0] == (n // 2) // 4
