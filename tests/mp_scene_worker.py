"""Worker for tests/test_multiprocess.py — multi-host whole-scene synthesis:
each process takes its contiguous row band (halo recompute, no collectives
inside synthesis), then the CLI's allgather assembles the bands and rank 0
writes the output GeoTIFF.

Usage: python tests/mp_scene_worker.py <pid> <nproc> <port> <outdir>
"""

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
    import numpy as np

    from nirgan_tpu.parallel import initialize_multihost

    initialize_multihost(coordinator_address=f"localhost:{port}",
                         num_processes=nproc, process_id=pid)

    from nirgan_tpu.config import load_config, save_config
    from nirgan_tpu.data.geotiff import write_geotiff

    cfg = load_config(os.path.join(REPO, "configs/config_px2px.yaml"))
    cfg.base_configs.ngf = 8
    cfg.base_configs.ndf = 8
    cfg.Data.padding_amount = 2
    cfg.tpu.compute_dtype = "float32"
    cfg_path = os.path.join(outdir, "cfg.yaml")

    # every host reads the same scene file in production; rank 0 writes it
    # here, rank 1 waits on the coordinator barrier below
    rng = np.random.default_rng(11)
    scene = rng.integers(0, 10000, size=(3, 150, 96)).astype(np.uint16)
    src = os.path.join(outdir, "rgb.tif")
    if pid == 0:
        save_config(cfg, cfg_path)
        write_geotiff(src, scene, pixel_scale=(10.0, 10.0),
                      origin=(500000.0, 4649776.0), epsg=32633)
    from jax.experimental import multihost_utils

    multihost_utils.sync_global_devices("scene_inputs_ready")

    import synthesize_scene as cli

    dst = os.path.join(outdir, "nir.tif")
    cli.main([src, dst, "--config", cfg_path,
              "--tile", "64", "--overlap", "16", "--batch-size", "4",
              "--mesh"])
    print(f"[{pid}] done")
    jax.distributed.shutdown()


if __name__ == "__main__":
    main()
