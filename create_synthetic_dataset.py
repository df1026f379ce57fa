"""Bulk RGB→NIR synthesis CLI (reference ``create_synthetic_dataset.py``):
load a checkpoint, sweep an LR/HR paired dataset, histogram-match the
predictions to the S2 NIR reference, write fp16 ``.npz`` tiles.

    python create_synthetic_dataset.py \
        --data data/synthDataset --ckpt ckpts/S2.ckpt --out data/synthDataset/synth_nirs
"""

import argparse
import os


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--config", default="configs/config_px2px.yaml")
    p.add_argument("--ckpt", default="ckpts/S2.ckpt",
                   help="torch reference .ckpt or orbax checkpoint dir")
    p.add_argument("--data", default="data/synthDataset")
    p.add_argument("--out", default=None)
    p.add_argument("--batch-size", type=int, default=8)
    p.add_argument("--no-hist-match", action="store_true")
    p.add_argument("--plot-dir", default=None)
    p.add_argument("--mesh", action="store_true",
                   help="shard serving batches over all local chips")
    p.add_argument("--quant", choices=["none", "int8"], default=None,
                   help="serving quantisation override (tpu.serving_quant): "
                        "int8 runs the residual trunk on the double-rate "
                        "int8 MXU path, PSNR-guarded (ops/int8_trunk.py)")
    args = p.parse_args()

    from nirgan_tpu.runtime import setup_runtime

    setup_runtime()

    from nirgan_tpu.config import load_config
    from nirgan_tpu.data.datasets import SRPairedDataset
    from nirgan_tpu.inference import synthesize_dataset
    from nirgan_tpu.tasks import Px2PxTask
    from nirgan_tpu.train.checkpoint import merge_params

    config = load_config(args.config)
    if args.quant is not None:
        # reference-schema configs have no tpu: section — create it
        config["tpu"] = config.get("tpu") or {}
        config.tpu.serving_quant = args.quant
    task = Px2PxTask(config)
    state = task.init_state(seed=0, image_size=64)
    params_g = state.params_g
    if args.ckpt and os.path.exists(args.ckpt):
        if os.path.isdir(args.ckpt):
            import orbax.checkpoint as ocp

            restored = ocp.StandardCheckpointer().restore(os.path.abspath(args.ckpt))
            params_g = merge_params(params_g, restored["params_g"])
        else:
            loaded = task.load_torch_weights(args.ckpt)
            params_g = merge_params(params_g, loaded.get("params_g", {}))
        print("Loaded weights from:", args.ckpt)
    else:
        print(f"WARNING: checkpoint {args.ckpt!r} not found — running with "
              "random weights (smoke mode)")
    task.bind(params_g)

    # uint16 DN rasters ship to the device unscaled (half the ingest
    # bytes); the fused serving program scales DN/10000 on device
    dataset = SRPairedDataset(args.data, dn_passthrough=True)
    out = args.out or os.path.join(args.data, "synth_nirs")
    mesh = None
    if args.mesh:
        import jax

        from nirgan_tpu.parallel import create_mesh

        # local devices only: multi-host serving shards tiles across hosts
        # (synthesize_dataset slices the dataset per process) and each host
        # batches over its own chips — no cross-host collectives
        mesh = create_mesh(("data",), devices=jax.local_devices())
    n = synthesize_dataset(task, dataset, out, batch_size=args.batch_size,
                           match_histograms=not args.no_hist_match,
                           plot_dir=args.plot_dir, mesh=mesh)
    print(f"wrote {n} synthetic NIR tiles to {out}")


if __name__ == "__main__":
    main()
