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


def test_pad_uneven_shards_and_masks():
    """pad_uneven pads up to mesh divisibility, attaches the `_valid` row
    mask, and the result shards over the mesh (no replicated fallback)."""
    from nirgan_tpu.parallel import pad_batch

    mesh = create_mesh(("data",))
    x = np.arange(5 * 3, dtype=np.float32).reshape(5, 3)
    b = shard_batch(mesh, {"x": x}, pad_uneven=True)
    assert b["x"].shape == (8, 3)
    assert not b["x"].sharding.is_fully_replicated
    assert b["_valid"].shape == (8,)
    np.testing.assert_array_equal(np.asarray(b["_valid"]),
                                  [1, 1, 1, 1, 1, 0, 0, 0])
    # padded rows are edge-repeats of the last real row
    np.testing.assert_array_equal(np.asarray(b["x"])[5:], np.stack([x[-1]] * 3))
    # already-divisible batches pass through untouched (plus mask)
    p = pad_batch({"x": np.zeros((8, 3), np.float32)}, 8)
    assert p["x"].shape == (8, 3) and p["_valid"].sum() == 8


def test_masked_metrics_match_unpadded():
    """calculate_metrics with a pad mask equals the plain metrics on the
    real rows — the padded eval path changes no reported value."""
    from nirgan_tpu.losses import calculate_metrics
    from nirgan_tpu.parallel import pad_batch

    rng = np.random.default_rng(0)
    pred = rng.uniform(0, 1, (5, 16, 16, 1)).astype(np.float32)
    tgt = rng.uniform(0, 1, (5, 16, 16, 1)).astype(np.float32)
    ref = {k: float(v) for k, v in calculate_metrics(pred, tgt, "val").items()}
    padded = pad_batch({"p": pred, "t": tgt}, 8)
    got = {k: float(v) for k, v in calculate_metrics(
        padded["p"], padded["t"], "val", mask=padded["_valid"]).items()}
    for k in ref:
        np.testing.assert_allclose(got[k], ref[k], rtol=1e-5, atol=1e-6,
                                   err_msg=k)


def test_eval_step_padded_batch_matches_replicated():
    """The px2px eval step on a padded+masked uneven batch reports the same
    metrics as the old replicated path on the raw batch."""
    import os

    from nirgan_tpu.config import load_config
    from nirgan_tpu.parallel import replicate
    from nirgan_tpu.tasks import Px2PxTask

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    cfg = load_config(os.path.join(repo, "configs/config_px2px.yaml"))
    cfg.base_configs.ngf = 8
    cfg.base_configs.ndf = 8
    cfg.Data.padding_amount = 2
    cfg.tpu.compute_dtype = "float32"
    task = Px2PxTask(cfg)
    mesh = create_mesh(("data",))
    state = replicate(mesh, task.init_state(seed=0, image_size=32))
    step = task.make_eval_step(mesh=mesh)

    rng = np.random.default_rng(1)
    batch = {"rgb": rng.uniform(0, 1, (5, 3, 32, 32)).astype(np.float32),
             "nir": rng.uniform(0, 1, (5, 1, 32, 32)).astype(np.float32)}
    ex = task.extract_batch(batch)
    _, m_repl = step(state, shard_batch(mesh, ex))           # replicated 5
    pred, m_pad = step(state, shard_batch(mesh, ex, pad_uneven=True))
    assert pred.shape[0] == 8
    for k, v in jax.device_get(m_repl).items():
        np.testing.assert_allclose(float(m_pad[k]), float(v), rtol=2e-5,
                                   atol=1e-6, err_msg=k)
