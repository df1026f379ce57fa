"""Worker for tests/test_multiprocess.py — multi-host bulk serving: each
process serves its strided slice of the tile list on a LOCAL-device mesh
(embarrassingly parallel, no collectives) and writes into the shared out
folder.

Usage: python tests/mp_serve_worker.py <pid> <nproc> <port> <outdir>
"""

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


class TinySRDataset:
    def __init__(self, n=10, hr=64, lr=16):
        self.n, self.hr, self.lr = n, hr, lr

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        import numpy as np

        rng = np.random.default_rng(i)
        return {
            "lr": rng.random((3, self.lr, self.lr), dtype=np.float32),
            "hr": rng.random((3, self.hr, self.hr), dtype=np.float32),
            "s2_nir": rng.random((1, self.lr, self.lr), dtype=np.float32),
            "coords": np.zeros(2, np.float32),
            "id": f"tile_{i:03d}",
        }


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
    from nirgan_tpu.parallel import create_mesh, initialize_multihost

    initialize_multihost(coordinator_address=f"localhost:{port}",
                         num_processes=nproc, process_id=pid)

    from nirgan_tpu.config import load_config
    from nirgan_tpu.inference import synthesize_dataset
    from nirgan_tpu.tasks import Px2PxTask

    cfg = load_config(os.path.join(REPO, "configs/config_px2px.yaml"))
    cfg.base_configs.ngf = 8
    cfg.base_configs.ndf = 8
    cfg.Data.padding_amount = 2
    cfg.tpu.compute_dtype = "float32"
    cfg.tpu.shape_buckets = [64]
    task = Px2PxTask(cfg)
    task.bind(task.init_state(seed=0, image_size=64))

    mesh = create_mesh(("data",), devices=jax.local_devices())
    n = synthesize_dataset(task, TinySRDataset(), os.path.join(outdir, "synth"),
                           batch_size=2, plot_every=10 ** 9, mesh=mesh)
    print(f"[{pid}] wrote {n} tiles")
    jax.distributed.shutdown()


if __name__ == "__main__":
    main()
