"""SatCLIP pretraining CLI — the runnable counterpart of the reference's
(commented-out) LightningCLI driver in ``model/satclip/main.py:112-167``:
contrastive training of the dual encoder over an S2Geo (image, location)
dataset.

    python pretrain_satclip.py --data data/s100k_npz --steps 10000
    python pretrain_satclip.py --pack data/s100k_npz --data data/s100k_packed
    python pretrain_satclip.py --data data/s100k_packed --steps 10000
    python pretrain_satclip.py --fake --steps 50        # smoke mode

``--pack`` bundles a tile folder into mmap-able shards once
(``pack_s2geo_shards``); packed folders are auto-detected by ``--data``.
At the reference's 100k-tile corpus scale this replaces per-item file opens
with page-cached sequential reads.
"""

import argparse
import json
import time


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--data", default=None,
                   help="folder of .npz tiles or packed shards (image+point)")
    p.add_argument("--pack", default=None, metavar="SRC",
                   help="pack the .npz tiles under SRC into shards at --data "
                        "and exit")
    p.add_argument("--tiles-per-shard", type=int, default=1024)
    p.add_argument("--fake", action="store_true", help="procedural smoke dataset")
    p.add_argument("--fake-geo", action="store_true",
                   help="procedural dataset with coordinate-DEPENDENT imagery "
                        "(real contrastive signal; pairs with FakeDataset geo "
                        "mode for the pretrain-to-inject demo)")
    p.add_argument("--fake-length", type=int, default=0,
                   help="tiles in the procedural dataset (default 4x batch)")
    p.add_argument("--steps", type=int, default=1000)
    p.add_argument("--batch-size", type=int, default=32)
    p.add_argument("--prefetch-depth", type=int, default=0,
                   help="producer-thread device feed depth (see "
                        "tpu.prefetch_depth); 0 = inline")
    p.add_argument("--image-size", type=int, default=256)
    p.add_argument("--embed-dim", type=int, default=256)
    p.add_argument("--vision", default="resnet",
                   choices=["resnet", "vit", "moco_resnet18", "moco_resnet50",
                            "moco_vit16"])
    p.add_argument("--tower-weights", default=None,
                   help="timm/torchgeo SSL4EO .pth to warm-start a moco_* tower")
    p.add_argument("--vision-width", type=int, default=64)
    p.add_argument("--resnet-layers", type=int, nargs=4, default=(3, 4, 6, 3))
    p.add_argument("--vit-layers", type=int, default=12)
    p.add_argument("--le-type", default="sphericalharmonics")
    p.add_argument("--pe-type", default="siren")
    p.add_argument("--legendre-polys", type=int, default=10)
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--accumulate", type=int, default=1,
                   help="gradient-accumulation micro-batches per optimizer "
                        "update (the reference trainer defaults to 16, "
                        "main.py:131)")
    p.add_argument("--val-every", type=int, default=0,
                   help=">0: hold out every 20th tile and log val_loss every "
                        "N steps (reference logs val_loss per epoch)")
    p.add_argument("--val-batches", type=int, default=5)
    p.add_argument("--ckpt-every", type=int, default=0,
                   help=">0: save params every N steps (besides the final save)")
    p.add_argument("--out", default="logs/satclip_pretrain")
    args = p.parse_args()

    from nirgan_tpu.runtime import setup_runtime

    setup_runtime()

    from nirgan_tpu.data.pipeline import Loader
    from nirgan_tpu.data.s2geo import (FakeS2GeoDataset, PackedS2GeoDataset,
                                       S2GeoDataset, pack_s2geo_shards)
    from nirgan_tpu.tasks.satclip_pretrain import SatClipPretrainTask
    from nirgan_tpu.utils.loggers import ExperimentLogger

    if args.pack:
        if not args.data:
            p.error("--pack requires --data as the output folder")
        src = S2GeoDataset(args.pack, augment=False, crop=1 << 30)
        n = pack_s2geo_shards(src, args.data,
                              tiles_per_shard=args.tiles_per_shard)
        print(f"packed {len(src)} tiles into {n} shards under {args.data}")
        return

    if args.vision == "resnet":
        vision_layers = tuple(args.resnet_layers)
    elif args.vision == "vit":
        vision_layers = args.vit_layers
    else:
        vision_layers = args.vision  # moco_* pretrained tower
    task = SatClipPretrainTask(
        embed_dim=args.embed_dim, le_type=args.le_type, pe_type=args.pe_type,
        legendre_polys=args.legendre_polys, vision_layers=vision_layers,
        vision_width=args.vision_width, image_resolution=args.image_size,
        learning_rate=args.lr, accumulate_grad_batches=args.accumulate)

    if args.fake or args.fake_geo or not args.data:
        ds = FakeS2GeoDataset(length=args.fake_length
                              or max(args.batch_size * 4, 64),
                              crop=args.image_size, channels=task.in_channels,
                              mode="geo" if args.fake_geo else "rand")
        if not args.fake:
            print("no --data given; using the procedural smoke dataset")
    else:
        import os

        packed = any(f.endswith(".images.npy") for f in os.listdir(args.data))
        ds = (PackedS2GeoDataset(args.data, crop=args.image_size) if packed
              else S2GeoDataset(args.data, crop=args.image_size))

    import os

    import jax
    import numpy as np
    import orbax.checkpoint as ocp

    from nirgan_tpu.parallel import create_mesh, replicate, shard_batch

    # data-parallel pretraining over all visible devices (multi-host via
    # NIRGAN_MULTIHOST=1 — the Loader then takes this host's epoch slice)
    mesh = create_mesh(("data",))
    is_main = jax.process_index() == 0
    state = task.init_state(seed=0)
    if args.tower_weights:
        state = task.load_tower_weights(state, args.tower_weights)
    state = replicate(mesh, state)
    step = task.make_train_step(mesh=mesh)
    logger = ExperimentLogger(args.out, project="satclip_pretrain",
                              enabled=is_main)

    ckptr = ocp.StandardCheckpointer()
    ckpt_path = os.path.abspath(os.path.join(args.out, "satclip_ckpt"))

    def save_params():
        ckptr.save(ckpt_path, jax.device_get(state.params), force=True)
        ckptr.wait_until_finished()
        # architecture sidecar so SatClipWrapper can rebuild the location
        # encoder from this native checkpoint (analogue of the torch
        # Lightning ckpt's hyper_parameters the reference loader reads)
        import json

        with open(os.path.join(args.out, "satclip_hparams.json"), "w") as f:
            json.dump({"le_type": args.le_type, "pe_type": args.pe_type,
                       "legendre_polys": args.legendre_polys,
                       "harmonics_calculation": "analytic",
                       "embed_dim": args.embed_dim}, f)

    class _EveryNth:
        """Deterministic 1-in-20 holdout (the reference's S2GeoDataModule
        splits train/val at build time; the sampling policy itself is not in
        the public snapshot)."""

        def __init__(self, base, offset, mod, keep):
            idx = [i for i in range(len(base)) if (i % mod == offset) == keep]
            self.base, self.idx = base, idx

        def __len__(self):
            return len(self.idx)

        def __getitem__(self, i):
            return self.base[self.idx[i]]

    eval_step = None
    if args.val_every:
        train_ds = _EveryNth(ds, 0, 20, keep=False)
        val_ds = _EveryNth(ds, 0, 20, keep=True)
        eval_step = task.make_eval_step()
        # process-sliced like the train loader: without it every host feeds
        # the SAME rows as its "local" slice, the global contrastive batch
        # holds P copies of each tile, and the duplicates act as perfect
        # negatives — inflating val_loss by ~ln(P) vs single-host
        # batch size must fit the PER-HOST slice: with drop_last=True a
        # batch computed from the global length can exceed the local row
        # count and silently yield zero val batches under multi-host
        n_local = len(range(jax.process_index(), len(val_ds),
                            jax.process_count()))
        val_loader = Loader(val_ds, min(args.batch_size, max(n_local, 1)),
                            shuffle=False, drop_last=True,
                            process_index=jax.process_index(),
                            process_count=jax.process_count())
    else:
        train_ds = ds

    loader = Loader(train_ds, args.batch_size, shuffle=True, num_workers=4,
                    drop_last=True, process_index=jax.process_index(),
                    process_count=jax.process_count())
    from nirgan_tpu.data.pipeline import DeviceFeed

    prepare = lambda b: shard_batch(mesh, task.extract_batch(b))
    n, t0 = 0, time.time()
    while n < args.steps:
        for ex in DeviceFeed(loader, prepare, depth=args.prefetch_depth):
            state, m = step(state, ex)
            n += 1
            if n % 10 == 0 or n == 1:
                loss = float(m["train_loss"])
                logger.log_metrics({"train_loss": loss}, n)
                print(json.dumps({"step": n, "train_loss": round(loss, 4),
                                  "elapsed_s": round(time.time() - t0, 1)}))
            if eval_step is not None and n % args.val_every == 0:
                losses = [float(jax.device_get(eval_step(
                              state, shard_batch(mesh, task.extract_batch(vb))
                          )["val_loss"]))
                          for vb, _ in zip(val_loader, range(args.val_batches))]
                if losses:
                    v = float(np.mean(losses))
                    logger.log_metrics({"val_loss": v}, n)
                    print(json.dumps({"step": n, "val_loss": round(v, 4)}))
            if args.ckpt_every and n % args.ckpt_every == 0:
                save_params()
            if n >= args.steps:
                break

    save_params()
    print("saved params to", ckpt_path)


if __name__ == "__main__":
    main()
