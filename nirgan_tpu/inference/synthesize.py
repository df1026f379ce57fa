"""Bulk RGB→NIR synthesis — the serving pipeline
(reference ``create_synthetic_dataset.py:98-124``).

The reference's loop is: torch predict → CPU skimage histogram match per
image → fp16 ``np.savez_compressed``.  Here the whole compute path is one
jitted device program per batch — generator forward, ×4 bilinear upsample of
the S2 NIR reference, then a second resize to the prediction size (the
reference's double-interpolation quirk, ``:111`` then ``:37``, preserved),
then sort-based histogram matching — and the only host work is the
compressed write, done by a background thread so IO overlaps compute.
"""

from __future__ import annotations

import functools
import os
import queue
import threading
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp

from nirgan_tpu.inference.histogram import histogram_match
from nirgan_tpu.ops.resize import resize_bilinear
from nirgan_tpu.runtime.setup import default_compiler_options

__all__ = ["synthesize_dataset"]


def _writer_loop(q: "queue.Queue", out_path: str):
    while True:
        item = q.get()
        if item is None:
            return
        name, arr = item
        np.savez_compressed(os.path.join(out_path, f"{name}"), nir=arr)


def synthesize_dataset(task, dataset, out_path: str, batch_size: int = 8,
                       match_histograms: bool = True,
                       plot_every: int = 10, plot_dir: Optional[str] = None,
                       num_workers: int = 4, num_writers: int = 4,
                       mesh=None):
    """Run the generator over an LR/HR paired dataset and write synthetic
    NIR tiles (fp16 .npz, key ``nir`` — reference ``save_image``, ``:49-52``).

    The whole per-batch compute — generator forward (with reflect-pad /
    bucket handling), the reference's ×4-then-resize double interpolation of
    the S2 NIR, sort-based histogram matching, and the fp16 cast — is ONE
    jitted device program; the host sees only the final fp16 tiles.
    Compressed writes run on a writer-thread pool, overlapped with compute
    (the reference does skimage matching + writes serially on host,
    ``create_synthetic_dataset.py:100-124``).

    ``task``: a bound Px2PxTask (``task.bind(state)`` done by the caller).
    ``dataset``: SRPairedDataset-like items {"lr","hr","s2_nir","coords","id"}.
    ``mesh``: optional device mesh — the batch is sharded on its ``data``
    axis (params replicated), scaling bulk serving across chips; ragged
    batches are padded to the mesh size and trimmed after.
    """
    from nirgan_tpu.data.pipeline import Loader

    os.makedirs(out_path, exist_ok=True)
    # multi-host bulk serving is embarrassingly parallel: each host takes a
    # strided slice of the tile list and writes its own outputs; no
    # collectives (pass a LOCAL-device mesh, each host serving independently)
    loader = Loader(dataset, batch_size, shuffle=False, num_workers=num_workers,
                    drop_last=False, process_index=jax.process_index(),
                    process_count=jax.process_count())

    q: queue.Queue = queue.Queue(maxsize=64)
    writers = [threading.Thread(target=_writer_loop, args=(q, out_path), daemon=True)
               for _ in range(max(1, num_writers))]
    for w in writers:
        w.start()

    inject = task.satclip and task.satclip_style == "inject"

    @functools.lru_cache(maxsize=8)
    def fused(h: int, w: int, size: int):
        def fn(params, stats, hr_nhwc, s2_nhwc, embeds, trunk_q):
            # integer DN input (dn_passthrough datasets) is scaled to
            # reflectance here, on device — the host→device transfer carried
            # 2 B/px instead of 4 (ROADMAP ingest bullet)
            x = task._dn_to_reflectance(hr_nhwc, task.compute_dtype)
            s2_nhwc = task._dn_to_reflectance(s2_nhwc, jnp.float32)
            if (h, w) != (size, size):
                x = jnp.pad(x, ((0, 0), (0, size - h), (0, size - w), (0, 0)),
                            mode="reflect")
            pred = task.g_apply(params, x,
                                embeds if inject else None, train=False,
                                stats=stats, trunk_q=trunk_q)
            pred = pred.astype(jnp.float32)[:, :h, :w, :]
            if match_histograms:
                up = resize_bilinear(s2_nhwc, s2_nhwc.shape[1] * 4,
                                     s2_nhwc.shape[2] * 4)
                up = resize_bilinear(up, h, w)  # double interpolation quirk
                pred = histogram_match(pred, up)
            return pred.astype(jnp.float16)

        copts = default_compiler_options(
            "serve_int8" if task.serving_quant == "int8" else "serve")
        if mesh is None:
            return jax.jit(fn, compiler_options=copts)
        from nirgan_tpu.parallel import batch_sharding, replicated_sharding

        repl, data = replicated_sharding(mesh), batch_sharding(mesh)
        return jax.jit(fn, in_shardings=(repl, repl, data, data,
                                         data if inject else repl, repl),
                       out_shardings=data, compiler_options=copts)

    n_written = 0
    pending = None  # overlap device compute with host pull of previous batch

    def flush(item):
        nonlocal n_written
        dev, ids, batch, v = item
        out = np.asarray(dev).transpose(0, 3, 1, 2)
        for im, tid in zip(out, ids):
            q.put((tid, im))
            n_written += 1
        if plot_dir and v % plot_every == 0:
            _plot_example(batch, out, v, plot_dir, dn_scale=task.dn_scale)

    def ingest(x):
        # uint8/uint16 DN stays integer through the transfer (half the
        # bytes); anything else becomes f32 (task._ingest policy)
        x = np.asarray(x)
        if x.dtype not in (np.uint8, np.uint16):
            x = np.asarray(x, np.float32)
        return jnp.transpose(jnp.asarray(x), (0, 2, 3, 1))

    for v, batch in enumerate(loader):
        hr = ingest(batch["hr"])
        s2 = ingest(batch["s2_nir"])
        embeds = None
        if task.satclip:
            embeds = jnp.asarray(task.satclip_model.predict(
                np.asarray(batch["coords"], np.float32)))
        n_real = hr.shape[0]
        if mesh is not None:
            n_dev = int(np.prod(list(mesh.shape.values())))
            pad_n = -n_real % n_dev
            if pad_n:  # ragged tail: repeat rows so every shard is populated
                reps = np.concatenate([np.arange(n_real),
                                       np.zeros(pad_n, np.int64)])
                hr, s2 = hr[reps], s2[reps]
                if embeds is not None:
                    embeds = embeds[reps]
        h, w = hr.shape[1], hr.shape[2]
        size = task.bucket_for(h, w)
        if task.wants_int8_serving() and task._trunk_q is None:
            # calibrate the int8 trunk once from the first batch (replicated
            # under a mesh: scales are scalars, weights int8 — tiny)
            x = task._dn_to_reflectance(hr, task.compute_dtype)
            if (h, w) != (size, size):
                x = jnp.pad(x, ((0, 0), (0, size - h), (0, size - w), (0, 0)),
                            mode="reflect")
            task._trunk_q = task.build_trunk_q(
                task._params_g, x, embeds if inject else None)
        dev = fused(h, w, size)(task._params_g, task._stats_g, hr, s2, embeds,
                                task._trunk_q)
        dev = dev[:n_real]
        if pending is not None:
            flush(pending)
        pending = (dev, batch["id"], batch, v)
    if pending is not None:
        flush(pending)
    for _ in writers:
        q.put(None)
    for w in writers:
        w.join()
    return n_written


def _plot_example(batch, pred_nchw, idx: int, plot_dir: str,
                  dn_scale: float = 10000.0):
    """4-panel HR-RGB | LR-RGB | synth NIR | real NIR example
    (reference ``plot_example``, ``create_synthetic_dataset.py:54-84``)."""
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        def refl(x):  # dn_passthrough batches carry integer DN
            x = np.asarray(x)
            if np.issubdtype(x.dtype, np.integer):
                return x.astype(np.float32) / float(dn_scale)
            return np.asarray(x, np.float32)

        os.makedirs(plot_dir, exist_ok=True)
        hr = np.clip(refl(batch["hr"][0]) * 3, 0, 1)
        lr = np.clip(refl(batch["lr"][0]) * 3, 0, 1)
        fig, axs = plt.subplots(1, 4, figsize=(16, 4))
        axs[0].imshow(np.transpose(hr, (1, 2, 0)))
        axs[0].set_title("HR RGB")
        axs[1].imshow(np.transpose(lr, (1, 2, 0)))
        axs[1].set_title("LR RGB")
        axs[2].imshow(pred_nchw[0, 0].astype(np.float32), cmap="gray")
        axs[2].set_title("Synth NIR")
        axs[3].imshow(refl(batch["s2_nir"][0, 0]), cmap="gray")
        axs[3].set_title("Real NIR")
        for ax in axs:
            ax.axis("off")
        fig.tight_layout()
        fig.savefig(os.path.join(plot_dir, f"example_{idx}.png"))
        plt.close(fig)
    except Exception as e:
        print("example plot failed:", e)
