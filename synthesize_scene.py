"""Whole-scene RGB→NIR synthesis CLI: one GeoTIFF in, one GeoTIFF out.

The reference serves pre-tiled datasets only (``create_synthetic_dataset.py``
— see that CLI's rebuild in this repo); this entry point covers the missing
scene workflow: read an arbitrary-size georeferenced RGB scene, run seamless
sliding-window inference (``nirgan_tpu/inference/scene.py`` — plateau-cosine
blending, per-window SatCLIP coordinates from the scene's georeferencing),
and write the synthetic NIR band as a GeoTIFF with the input's grid.

    python synthesize_scene.py input_rgb.tif output_nir.tif \
        --config configs/config_px2px.yaml --ckpt logs/run/best \
        [--tile 512 --overlap 32 --batch-size 32 --quant int8 --mesh \
         --match-histogram ref_nir.tif]

Under ``NIRGAN_MULTIHOST=1`` with >1 process, each host synthesizes a
contiguous row band (halo recompute) and rank 0 assembles + writes.
"""

import argparse
import os

import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("input", help="georeferenced RGB GeoTIFF (3+ bands; "
                                 "bands 1-3 are used)")
    p.add_argument("output", help="output NIR GeoTIFF path")
    p.add_argument("--config", default="configs/config_px2px.yaml")
    p.add_argument("--ckpt", default=None,
                   help="torch reference .ckpt or orbax checkpoint dir")
    p.add_argument("--tile", type=int, default=512)
    p.add_argument("--overlap", type=int, default=32)
    p.add_argument("--batch-size", type=int, default=32,
                   help="windows per device dispatch; measured 512² rates "
                        "202.7/259.6/291.3 tiles/s at 8/32/128 (b128 OOMs "
                        "nothing but needs ~100 MB input per batch)")
    p.add_argument("--quant", choices=["none", "int8"], default=None,
                   help="serving quantisation override (tpu.serving_quant)")
    p.add_argument("--mesh", action="store_true",
                   help="shard window batches over all local chips")
    p.add_argument("--match-histogram", default=None, metavar="REF_TIF",
                   help="match the synthesized NIR histogram to this "
                        "reference GeoTIFF's first band (the reference "
                        "pipeline's skimage match, create_synthetic_dataset"
                        ".py:34-47, applied ONCE scene-level after blending "
                        "— per-window matching would reintroduce seams); "
                        "integer references are DN-scaled like inputs")
    p.add_argument("--compression", default="deflate",
                   choices=["none", "deflate", "lzw", "packbits", "zstd"])
    args = p.parse_args(argv)

    from nirgan_tpu.runtime import setup_runtime

    setup_runtime()

    from nirgan_tpu.config import load_config
    from nirgan_tpu.data.geotiff import read_geotiff, write_geotiff
    from nirgan_tpu.inference import synthesize_scene
    from nirgan_tpu.tasks import Px2PxTask
    from nirgan_tpu.train.checkpoint import merge_params

    config = load_config(args.config)
    if args.quant is not None:
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

    # native_dtype: uint16 DN stays integer through the host→device transfer
    # (half the tunnel bytes) and is scaled on device; the default float32
    # read returns UNSCALED DN floats, which the task would wrongly treat as
    # reflectance
    img, meta = read_geotiff(args.input, native_dtype=True)
    rgb = img[:3]
    print(f"Scene {meta['width']}×{meta['height']} "
          f"(EPSG:{meta.get('epsg', '?')}), tile={args.tile} "
          f"overlap={args.overlap}")

    import jax

    mesh = None
    if args.mesh:
        from nirgan_tpu.parallel import create_mesh

        mesh = create_mesh(("data",), devices=jax.local_devices())

    nprocs = jax.process_count()
    if nprocs > 1:
        # multi-host (NIRGAN_MULTIHOST=1): every host reads the scene, takes
        # a contiguous row band with halo recompute (no communication inside
        # synthesis), then rank 0 assembles the disjoint bands and writes
        from jax.experimental import multihost_utils

        band, off = synthesize_scene(
            task, rgb, tile=args.tile, overlap=args.overlap,
            batch_size=args.batch_size, meta=meta, mesh=mesh,
            process_index=jax.process_index(), process_count=nprocs,
            progress=jax.process_index() == 0)
        info = multihost_utils.process_allgather(
            np.array([band.shape[1], off], np.int64))
        maxh = max(int(info[:, 0].max()), 1)
        buf = np.zeros((maxh, band.shape[2]), np.float32)
        buf[:band.shape[1]] = band[0]
        bands = multihost_utils.process_allgather(buf)
        if jax.process_index() != 0:
            print(f"[proc {jax.process_index()}] band rows {off}.."
                  f"{off + band.shape[1]} done; rank 0 writes")
            return
        nir = np.zeros((1, rgb.shape[1], rgb.shape[2]), np.float32)
        for p2 in range(nprocs):
            h2, o2 = int(info[p2, 0]), int(info[p2, 1])
            nir[0, o2:o2 + h2] = bands[p2, :h2]
    else:
        nir = synthesize_scene(task, rgb, tile=args.tile,
                               overlap=args.overlap,
                               batch_size=args.batch_size, meta=meta,
                               mesh=mesh, progress=True)

    if args.match_histogram:
        import jax.numpy as jnp

        from nirgan_tpu.inference import histogram_match

        ref_img, _ = read_geotiff(args.match_histogram, native_dtype=True)
        ref_b = ref_img[:1].astype(np.float32)
        if np.issubdtype(ref_img.dtype, np.integer):
            ref_b = ref_b / float(task.dn_scale)
        nir = np.asarray(histogram_match(
            jnp.asarray(nir[..., None]), jnp.asarray(ref_b[..., None])))[..., 0]
        print(f"Histogram-matched to {args.match_histogram} "
              f"(out range [{nir.min():.4f}, {nir.max():.4f}])")

    kw = {}
    if "pixel_scale" in meta and "tiepoint" in meta:
        sx, sy = meta["pixel_scale"][:2]
        _, _, _, ox, oy, _ = meta["tiepoint"]
        kw = dict(pixel_scale=(sx, sy), origin=(ox, oy),
                  epsg=meta.get("epsg", 4326))
    big = nir.astype(np.float32).nbytes > (1 << 32) - (1 << 20)
    write_geotiff(args.output, nir.astype(np.float32),
                  compression=args.compression, bigtiff=big, **kw)
    print("Wrote", args.output)


if __name__ == "__main__":
    main()
