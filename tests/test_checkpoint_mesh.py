"""Checkpoint portability across mesh shapes (VERDICT round-1 item 7 /
ROADMAP 'Orbax sharded checkpoints for multi-host').

A production run saves under one topology and must restore under another
(preemption moves you from a v5e-8 to a v5e-4; serving restores a training
checkpoint onto a 2-D data×spatial mesh).  These tests save a live train
state under an 8-device data mesh and resume it under (a) a 2-D (2,4)
data×spatial mesh and (b) a 4-device submesh, continuing training in both.
"""

import numpy as np
import jax

from nirgan_tpu.config import load_config
from nirgan_tpu.parallel import create_mesh, replicate, shard_batch
from nirgan_tpu.tasks import Px2PxTask
from nirgan_tpu.train.checkpoint import CheckpointManager


def _task():
    cfg = load_config("configs/config_px2px.yaml")
    cfg.base_configs.ngf = 8
    cfg.base_configs.ndf = 8
    cfg.Data.padding_amount = 2
    cfg.tpu.compute_dtype = "float32"
    return Px2PxTask(cfg)


def _batch(task, n=8, size=32, seed=0):
    rng = np.random.default_rng(seed)
    return task.extract_batch({
        "rgb": rng.random((n, 3, size, size), dtype=np.float32),
        "nir": rng.random((n, 1, size, size), dtype=np.float32),
    })


def _flat(tree, pre=""):
    out = {}
    for k, v in tree.items():
        if isinstance(v, dict):
            out.update(_flat(v, f"{pre}{k}/"))
        else:
            out[f"{pre}{k}"] = np.asarray(jax.device_get(v))
    return out


def test_restore_across_mesh_shapes(tmp_path):
    task = _task()
    mesh8 = create_mesh(("data",))
    assert mesh8.devices.size == 8

    state = replicate(mesh8, task.init_state(seed=0, image_size=32))
    step8 = task.make_train_step(mesh=mesh8)
    state, _ = step8(state, shard_batch(mesh8, _batch(task)))
    ckpt = CheckpointManager(str(tmp_path / "x"))
    ckpt.save(state, {"val/L1": 0.5})
    want = _flat(jax.device_get(state.params_g))

    # (a) resume under a 2-D data×spatial mesh
    mesh24 = create_mesh(("data", "spatial"), shape=(2, 4))
    tmpl24 = replicate(mesh24, task.init_state(seed=1, image_size=32))
    restored = CheckpointManager(str(tmp_path / "x")).restore(tmpl24, "last")
    got = _flat(jax.device_get(restored.params_g))
    assert sorted(got) == sorted(want)
    for k in want:
        np.testing.assert_array_equal(got[k], want[k], err_msg=k)
    assert int(jax.device_get(restored.step)) == 1
    step24 = task.make_train_step(mesh=mesh24)
    restored, metrics = step24(restored, shard_batch(mesh24, _batch(task, seed=2)))
    assert np.isfinite(float(metrics["model_loss/generator_total_loss"]))
    assert int(jax.device_get(restored.step)) == 2

    # (b) resume under a 4-device submesh (half the chips died / smaller pod)
    mesh4 = create_mesh(("data",), devices=jax.devices()[:4])
    tmpl4 = replicate(mesh4, task.init_state(seed=2, image_size=32))
    restored4 = CheckpointManager(str(tmp_path / "x")).restore(tmpl4, "last")
    got4 = _flat(jax.device_get(restored4.params_g))
    for k in want:
        np.testing.assert_array_equal(got4[k], want[k], err_msg=k)
    step4 = task.make_train_step(mesh=mesh4)
    restored4, m4 = step4(restored4, shard_batch(mesh4, _batch(task, n=4, seed=3)))
    assert np.isfinite(float(m4["model_loss/generator_total_loss"]))


def test_restore_batch_sharded_arrays_across_meshes(tmp_path):
    """Orbax round-trip of genuinely *sharded* (non-replicated) arrays:
    save an array laid out over 8 shards, restore it over a (2,4) grid
    sharding and a 4-device sharding — values identical each time."""
    import orbax.checkpoint as ocp
    from jax.sharding import NamedSharding, PartitionSpec as P

    mesh8 = create_mesh(("data",))
    x = np.arange(8 * 16 * 4, dtype=np.float32).reshape(8, 16, 4)
    xd = jax.device_put(x, NamedSharding(mesh8, P("data")))
    ckptr = ocp.StandardCheckpointer()
    path = str(tmp_path / "sharded")
    ckptr.save(path, {"x": xd}, force=True)
    ckptr.wait_until_finished()

    mesh24 = create_mesh(("data", "spatial"), shape=(2, 4))
    tmpl = {"x": jax.device_put(np.zeros_like(x),
                                NamedSharding(mesh24, P("data", "spatial")))}
    got = ckptr.restore(path, target=tmpl)
    np.testing.assert_array_equal(np.asarray(jax.device_get(got["x"])), x)

    mesh4 = create_mesh(("data",), devices=jax.devices()[:4])
    tmpl4 = {"x": jax.device_put(np.zeros_like(x),
                                 NamedSharding(mesh4, P("data")))}
    got4 = ckptr.restore(path, target=tmpl4)
    np.testing.assert_array_equal(np.asarray(jax.device_get(got4["x"])), x)
