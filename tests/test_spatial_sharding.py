"""Spatial (halo-exchange) sharding: H-sharded inference over the 8-device
mesh must match the single-device computation exactly."""

import numpy as np

import jax

from nirgan_tpu.config import load_config
from nirgan_tpu.parallel import create_mesh
from nirgan_tpu.parallel.spatial import predict_large_tile
from nirgan_tpu.tasks import Px2PxTask


def _task():
    cfg = load_config("configs/config_px2px.yaml")
    cfg.base_configs.ngf = 8
    cfg.base_configs.ndf = 8
    cfg.Data.padding = False  # pure network; pad/crop is the host wrapper's job
    cfg.tpu.compute_dtype = "float32"
    return Px2PxTask(cfg)


def test_spatially_sharded_matches_single_device():
    assert len(jax.devices()) == 8
    mesh = create_mesh(("data",))
    task = _task()
    params = task.init_state(seed=0, image_size=64).params_g

    rgb = np.random.default_rng(0).random((1, 3, 128, 64), dtype=np.float32)
    sharded = predict_large_tile(task, params, rgb, mesh)

    single = jax.jit(lambda p, x: task.g_apply(p, x))(
        params, np.transpose(rgb, (0, 2, 3, 1)))
    single = np.transpose(np.asarray(single), (0, 3, 1, 2))

    assert sharded.shape == (1, 1, 128, 64)
    np.testing.assert_allclose(sharded, single, rtol=2e-5, atol=2e-5)


def test_spatial_sharding_rejects_bad_height():
    mesh = create_mesh(("data",))
    task = _task()
    params = task.init_state(seed=0, image_size=64).params_g
    rgb = np.zeros((1, 3, 100, 64), np.float32)  # 100 not divisible by 32
    try:
        predict_large_tile(task, params, rgb, mesh)
        assert False, "expected ValueError"
    except ValueError as e:
        assert "multiple of 32" in str(e)


def test_2d_mesh_data_by_spatial_matches_single_device():
    """(2,4) data×spatial mesh: batch parallel + H-sharded at once, output
    equal to single-device (ROADMAP perf bullet 3 / VERDICT round-1 item 9)."""
    from nirgan_tpu.parallel.spatial import predict_tiles_2d

    mesh = create_mesh(("data", "spatial"), shape=(2, 4))
    assert mesh.shape == {"data": 2, "spatial": 4}
    task = _task()
    params = task.init_state(seed=0, image_size=64).params_g

    rgb = np.random.default_rng(1).random((4, 3, 64, 64), dtype=np.float32)
    sharded = predict_tiles_2d(task, params, rgb, mesh)

    single = jax.jit(lambda p, x: task.g_apply(p, x))(
        params, np.transpose(rgb, (0, 2, 3, 1)))
    single = np.transpose(np.asarray(single), (0, 3, 1, 2))
    assert sharded.shape == (4, 1, 64, 64)
    np.testing.assert_allclose(sharded, single, rtol=2e-5, atol=2e-5)


def test_2d_mesh_rejects_bad_shapes():
    from nirgan_tpu.parallel.spatial import predict_tiles_2d

    mesh = create_mesh(("data", "spatial"), shape=(2, 4))
    task = _task()
    params = task.init_state(seed=0, image_size=64).params_g
    with np.testing.assert_raises(ValueError):
        predict_tiles_2d(task, params, np.zeros((3, 3, 64, 64), np.float32), mesh)
    with np.testing.assert_raises(ValueError):
        predict_tiles_2d(task, params, np.zeros((2, 3, 40, 64), np.float32), mesh)
