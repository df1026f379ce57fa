"""Worker for tests/test_multiprocess.py — run the REAL Trainer.fit() under
a 2-process jax.distributed mesh (fake dataset, tiny nets): exercises the
broadcast-agreed logdir, rank-zero logging, per-host input slicing,
coordinated orbax checkpointing, and the plateau-LR replicate path.

Usage: python tests/mp_trainer_worker.py <pid> <nproc> <port> <outdir>
(cwd should be a scratch dir — the trainer writes logs/ under cwd)
"""

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


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
    # bootstrap through the CLI path (setup_runtime reads NIRGAN_MULTIHOST)
    os.environ["NIRGAN_MULTIHOST"] = "1"
    os.environ["NIRGAN_COORDINATOR"] = f"localhost:{port}"
    os.environ["NIRGAN_NUM_PROCESSES"] = str(nproc)
    os.environ["NIRGAN_PROCESS_ID"] = str(pid)
    from nirgan_tpu.runtime import setup_runtime

    setup_runtime(cache_dir=os.path.join(outdir, ".jax_cache"))
    assert jax.process_count() == nproc

    from nirgan_tpu.config import load_config
    from nirgan_tpu.data import dataset_selector
    from nirgan_tpu.train.trainer import Trainer
    from nirgan_tpu.tasks import Px2PxTask

    cfg = load_config(os.path.join(REPO, "configs/config_px2px.yaml"))
    cfg.base_configs.ngf = 8
    cfg.base_configs.ndf = 8
    cfg.Data.padding_amount = 2
    cfg.tpu.compute_dtype = "float32"
    cfg.Data.dataset_type = "fake"
    cfg.Data.fake_settings.image_size = 32
    cfg.Data.fake_settings.length = 96   # val split 12 → 6/host ≥ val batch 5
    cfg.Data.fake_settings.batch_size = 4   # per process → global batch 8
    cfg.Data.train_batch_size = 4
    # the shipped configs' val batch 5 does NOT divide the 4 local devices —
    # exercises the pad+mask path (shard_batch pad_uneven) that replaced the
    # old multi-process divisibility crash
    cfg.Data.val_batch_size = 5
    cfg.custom_configs.Training.limit_val_batches = 1

    task = Px2PxTask(cfg)
    dm = dataset_selector(cfg)
    trainer = Trainer(task, dm, cfg, max_steps=3, log_every=1)
    state = trainer.fit()
    step = int(jax.device_get(state.step)) if state is not None else -1

    with open(os.path.join(outdir, f"trainer_proc{pid}.json"), "w") as f:
        json.dump({"logdir": os.path.abspath(trainer.logdir),
                   "is_main": trainer.is_main,
                   "final_step": step,
                   "has_last_ckpt": trainer.ckpt.has("last"),
                   "metrics_jsonl_exists": os.path.exists(
                       os.path.join(trainer.logdir, "metrics.jsonl"))}, f)
    trainer.logger.close()
    jax.distributed.shutdown()


if __name__ == "__main__":
    main()
