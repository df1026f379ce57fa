"""Worker for tests/test_multiprocess.py — one process of a true 2-process
``jax.distributed`` run (gloo CPU collectives, 4 virtual devices per
process, 8 global).

Each process loads only its own slice of the epoch
(``Loader(process_index, process_count)``), assembles global batches with
``shard_batch`` (``make_array_from_process_local_data`` path), runs the
fused GAN train step over the global ``data`` mesh (gradient all-reduce
crosses the process boundary), and round-trips the state through the
multi-process orbax ``CheckpointManager``.

Usage: python tests/mp_worker.py <pid> <nproc> <port> <outdir>
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    pid, nproc, port, outdir = (int(sys.argv[1]), int(sys.argv[2]),
                                sys.argv[3], sys.argv[4])
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = [f for f in os.environ.get("XLA_FLAGS", "").split()
             if "host_platform_device_count" not in f]
    flags.append("--xla_force_host_platform_device_count=4")
    os.environ["XLA_FLAGS"] = " ".join(flags)
    import jax

    jax.config.update("jax_platforms", "cpu")

    from nirgan_tpu.parallel import initialize_multihost

    initialize_multihost(coordinator_address=f"localhost:{port}",
                         num_processes=nproc, process_id=pid)
    assert jax.process_count() == nproc and jax.device_count() == 4 * nproc

    import numpy as np

    from nirgan_tpu.config import load_config
    from nirgan_tpu.data.datasets import FakeDataset
    from nirgan_tpu.data.pipeline import Loader
    from nirgan_tpu.parallel import create_mesh, replicate, shard_batch
    from nirgan_tpu.tasks import Px2PxTask
    from nirgan_tpu.train.checkpoint import CheckpointManager

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    cfg = load_config(os.path.join(repo, "configs/config_px2px.yaml"))
    cfg.base_configs.ngf = 8
    cfg.base_configs.ndf = 8
    cfg.Data.padding_amount = 2
    cfg.tpu.compute_dtype = "float32"
    task = Px2PxTask(cfg)

    mesh = create_mesh(("data",))  # all 8 global devices
    assert mesh.devices.size == 8
    state = replicate(mesh, task.init_state(seed=0, image_size=32))
    step = task.make_train_step(mesh=mesh)

    ds = FakeDataset(image_size=32, length=32, seed=5)
    loader = Loader(ds, batch_size=4, shuffle=True, seed=7,
                    process_index=jax.process_index(),
                    process_count=jax.process_count())

    losses = []
    for i, batch in zip(range(2), loader):
        ex = shard_batch(mesh, task.extract_batch(batch))
        state, metrics = step(state, ex)
        losses.append(float(jax.device_get(
            metrics["model_loss/generator_total_loss"])))

    ckpt_dir = os.path.join(outdir, "ckpt")
    ckpt = CheckpointManager(ckpt_dir)
    ckpt.save(state, {"val/L1": losses[-1]})

    # restore under the same 2-process mesh and continue one step
    tmpl = replicate(mesh, task.init_state(seed=1, image_size=32))
    restored = CheckpointManager(ckpt_dir).restore(tmpl, "last")
    assert int(jax.device_get(restored.step)) == 2
    a = jax.device_get(jax.tree.leaves(state.params_g)[0])
    b = jax.device_get(jax.tree.leaves(restored.params_g)[0])
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    restored, m = step(restored, shard_batch(
        mesh, task.extract_batch(next(iter(loader)))))
    post = float(jax.device_get(m["model_loss/generator_total_loss"]))
    assert np.isfinite(post)

    with open(os.path.join(outdir, f"proc{pid}.json"), "w") as f:
        json.dump({"losses": losses, "post_restore_loss": post}, f)
    jax.distributed.shutdown()


if __name__ == "__main__":
    main()
