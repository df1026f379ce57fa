"""Whole-scene RGB→NIR synthesis: seamless sliding-window inference.

The reference serves pre-tiled datasets only (``create_synthetic_dataset.py``
loops a tile DataLoader); a real Sentinel-2 scene is ~10980² px and has to be
cut up first, and independently-predicted tiles show seams — the generator's
instance-norm statistics and reflect-pad edge handling differ per tile.  This
module adds the missing scene-level API:

  * the scene is reflect-padded by ``overlap`` and cut into ``tile``² windows
    on a ``tile - 2·overlap`` stride, so every original pixel lies in the
    full-weight *plateau* of at least one window;
  * every window runs through the generator in fixed-shape batches (ONE XLA
    compile for the whole scene, any scene size), on the int8 serving trunk
    when enabled, sharded over a device mesh when given;
  * windows are blended with a separable plateau-cosine weight — flat 1 in
    the interior, half-cosine ramps over the ``overlap`` margins — and
    normalised by the accumulated weight, which removes seams exactly where
    neighbouring windows disagree;
  * on the SatCLIP routes each window gets its own location embedding from
    the scene's georeferencing (``data/geotiff.pixel_lonlat``) — a scene
    spanning a UTM zone is conditioned on per-window coordinates, not one
    scene centroid.

Host blending overlaps device compute (same pending-batch pattern as
``synthesize_dataset``).  The CLI wrapper is ``synthesize_scene.py``.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp
from nirgan_tpu.runtime.setup import default_compiler_options

__all__ = ["synthesize_scene", "tile_origins", "plateau_weight"]


def tile_origins(length: int, tile: int, stride: int) -> list:
    """Window origins covering ``[0, length)``: multiples of ``stride``,
    with the last window clamped flush to the end.  Guarantees the
    full-weight plateaus ``[k·stride + overlap, k·stride + overlap + stride)``
    tile the interior contiguously (see module docstring)."""
    if length <= tile:
        return [0]
    xs = list(range(0, length - tile + 1, stride))
    if xs[-1] != length - tile:
        xs.append(length - tile)
    return xs


def plateau_weight(tile: int, overlap: int) -> np.ndarray:
    """1-D blending weight: half-cosine ramp 0→1 over the first ``overlap``
    samples, flat 1 in the middle, mirrored ramp at the end.  Strictly
    positive everywhere so border windows never divide by zero."""
    w = np.ones(tile, np.float32)
    if overlap > 0:
        ramp = 0.5 - 0.5 * np.cos(
            np.pi * (np.arange(overlap, dtype=np.float32) + 1.0) / (overlap + 1.0))
        w[:overlap] = ramp
        w[-overlap:] = ramp[::-1]
    return w


def _pad_reflect(arr: np.ndarray, pads: Tuple[Tuple[int, int], ...]) -> np.ndarray:
    """np.pad(mode='reflect') that tolerates pads ≥ the axis length by
    reflecting in chunks (relevant only for degenerate strip scenes)."""
    while any(p > 0 for pair in pads for p in pair):
        step = tuple((min(b, max(arr.shape[i] - 1, 0)),
                      min(a, max(arr.shape[i] - 1, 0)))
                     for i, (b, a) in enumerate(pads))
        if all(p == 0 for pair in step for p in pair):  # 1-px axis: replicate
            step = tuple((min(b, 1), min(a, 1)) for b, a in pads)
            arr = np.pad(arr, step, mode="edge")
        else:
            arr = np.pad(arr, step, mode="reflect")
        pads = tuple((b - sb, a - sa)
                     for (b, a), (sb, sa) in zip(pads, step))
    return arr


def synthesize_scene(task, rgb_chw: np.ndarray, *, tile: int = 512,
                     overlap: int = 32, batch_size: int = 8,
                     meta: Optional[dict] = None, mesh=None,
                     process_index: Optional[int] = None,
                     process_count: Optional[int] = None,
                     progress: bool = False):
    """Synthesize the NIR band of one whole scene.

    ``task``: a bound ``Px2PxTask`` (``task.bind(params)`` done by caller).
    ``rgb_chw``: (3, H, W) — float reflectance, or uint8/uint16 DN (kept
    integer through the host→device transfer, scaled on device).
    ``meta``: optional :func:`~nirgan_tpu.data.geotiff.read_geotiff` metadata
    for per-window SatCLIP coordinates; required when the task has a SatCLIP
    route and no coords can be derived.
    ``mesh``: optional device mesh — window batches shard on its ``data``
    axis (local devices of this host).

    Multi-host scenes split scene-level: with ``process_index``/
    ``process_count`` set, this process takes a contiguous row band of the
    padded scene and computes every window that TOUCHES the band — boundary
    windows are recomputed redundantly by both neighbours (≤ ⌈tile/stride⌉−1
    window-rows per join, a few % on real scenes), so synthesis needs NO
    cross-process communication and each owned row is identical to the
    single-process result.  int8 calibration uses the GLOBAL first window
    batch so every process derives the same quantised trunk.  Returns
    ``(band (1, rows, W) float32, row_offset)`` in original scene
    coordinates; bands of all processes are disjoint and tile ``[0, H)``.

    Without ``process_count`` (or =1): returns (1, H, W) float32 NIR.
    """
    if overlap < 0 or tile <= 2 * overlap:
        raise ValueError("need 0 <= overlap < tile/2")
    netg = str(getattr(task, "opt", None) and task.opt.get("netG", ""))
    if netg.startswith("unet"):
        # a UNet bottleneck needs its input divisible by 2^num_downs; the
        # reference's torch UNet fails identically under reflect-pad
        # (model/pix2pix.py:91-108), so UNet serving runs unpadded
        downs = 7 if netg == "unet_128" else 8
        eff = tile + 2 * getattr(task, "pad_amount", 0)
        if eff % (1 << downs):
            raise ValueError(
                f"{netg} needs (tile + 2·padding_amount) divisible by "
                f"{1 << downs}, got {eff} — serve UNets with Data.padding: "
                f"false and a power-of-two tile")
    rgb_chw = np.asarray(rgb_chw)
    if rgb_chw.ndim != 3 or rgb_chw.shape[0] != 3:
        raise ValueError(f"expected (3, H, W) scene, got {rgb_chw.shape}")
    _, H, W = rgb_chw.shape

    if task.satclip and meta is not None:
        from nirgan_tpu.data.geotiff import pixel_lonlat
        if pixel_lonlat(meta, 0, 0) is None:
            meta = None
    if task.satclip and meta is None:
        raise ValueError("SatCLIP task needs georeferenced `meta` for "
                         "per-window coordinates")

    O, S = overlap, tile - 2 * overlap
    pad = _pad_reflect(rgb_chw, ((0, 0), (O, max(O, tile - H - O)),
                                 (O, max(O, tile - W - O))))
    Hp, Wp = pad.shape[1], pad.shape[2]
    ys, xs = tile_origins(Hp, tile, S), tile_origins(Wp, tile, S)
    wins_global = [(y, x) for y in ys for x in xs]

    banded = process_count is not None and process_count > 1
    if banded:
        if not (0 <= process_index < process_count):
            raise ValueError("need 0 <= process_index < process_count")
        # contiguous padded-row bands; every window that touches the band is
        # computed here (halo recompute, no communication)
        bounds = [round(i * Hp / process_count)
                  for i in range(process_count + 1)]
        lo, hi = bounds[process_index], bounds[process_index + 1]
        ys_mine = [y for y in ys if y < hi and y + tile > lo]
        wins = [(y, x) for y in ys_mine for x in xs]
    else:
        lo, hi = 0, Hp
        wins = wins_global

    w1d = plateau_weight(tile, O)
    w2d = np.outer(w1d, w1d)
    num = np.zeros((Hp, Wp), np.float32)
    den = np.zeros((Hp, Wp), np.float32)

    # C++ threaded cut/blend (native/tileio.cc): the numpy window loop and
    # the += blend are single-threaded host work that throttles the
    # pipeline on small hosts (scene e2e 10.4 win/s vs ~212 compute-side)
    from nirgan_tpu.data import native_loader as _native

    pad = np.ascontiguousarray(pad)
    use_native = (_native.available()
                  and pad.dtype in (np.uint8, np.uint16, np.float32))

    inject = task.satclip and task.satclip_style == "inject"
    concat = task.satclip and task.satclip_style == "concat"
    n_dev = int(np.prod(list(mesh.shape.values()))) if mesh is not None else 1
    # every batch is padded to one static size (and a device multiple under
    # a mesh): the whole scene is ONE XLA program
    bs_eff = -(-batch_size // n_dev) * n_dev

    @functools.lru_cache(maxsize=1)
    def fused(bs: int):
        def fn(params, stats, tiles_nhwc, embeds, trunk_q):
            x = task._dn_to_reflectance(tiles_nhwc, task.compute_dtype)
            pred = task.g_apply(params, x, embeds if inject else None,
                                train=False, stats=stats, trunk_q=trunk_q)
            return pred.astype(jnp.float32)

        copts = default_compiler_options(
            "serve_int8" if task.serving_quant == "int8" else "serve")
        if mesh is None:
            return jax.jit(fn, compiler_options=copts)
        from nirgan_tpu.parallel import batch_sharding, replicated_sharding

        repl, data = replicated_sharding(mesh), batch_sharding(mesh)
        return jax.jit(fn, in_shardings=(repl, repl, data,
                                         data if inject else repl, repl),
                       out_shardings=data, compiler_options=copts)

    def window_coords(batch_wins):
        from nirgan_tpu.data.geotiff import pixel_lonlat

        out = []
        for (y, x) in batch_wins:
            # window centre in ORIGINAL pixel coordinates, clipped into the
            # scene (padding reflects border content, so its centroid is the
            # nearest real location)
            r = min(max(y - O + tile / 2.0, 0.0), H - 1.0)
            c = min(max(x - O + tile / 2.0, 0.0), W - 1.0)
            out.append(pixel_lonlat(meta, r, c))
        return np.stack(out).astype(np.float32)

    def make_batch(batch_wins):
        if use_native:
            tiles = _native.scene_cut(
                pad, np.asarray(batch_wins, np.int32), tile)  # (b, T, T, 3)
        else:
            tiles = np.stack([pad[:, y:y + tile, x:x + tile]
                              for (y, x) in batch_wins])  # (b, 3, T, T)
            tiles = np.transpose(tiles, (0, 2, 3, 1))  # NHWC
        if tiles.dtype not in (np.uint8, np.uint16):
            tiles = np.asarray(tiles, np.float32)
        embeds = None
        if task.satclip:
            embeds = np.asarray(task.satclip_model.predict(
                window_coords(batch_wins)), np.float32)
        if concat:
            # concat route: the embedding plane is a float 4th channel, so
            # reflectance conversion happens host-side (extract_batch parity)
            tiles = np.asarray(jax.device_get(task._concat_embedding_plane(
                task._dn_to_reflectance(jnp.asarray(tiles), jnp.float32),
                jnp.asarray(embeds))))
            embeds = None
        n_real = tiles.shape[0]
        if n_real < bs_eff:  # ragged tail: repeat rows, trim after
            reps = np.concatenate([np.arange(n_real),
                                   np.zeros(bs_eff - n_real, np.int64)])
            tiles = tiles[reps]
            if embeds is not None:
                embeds = embeds[reps]
        return jnp.asarray(tiles), (jnp.asarray(embeds)
                                    if embeds is not None else None), n_real

    def flush(item):
        dev, batch_wins = item
        out = np.asarray(dev)[..., 0]  # (b, T, T)
        if use_native:
            _native.scene_blend(num, den, out,
                                np.asarray(batch_wins, np.int32), tile, w1d)
            return
        for p, (y, x) in zip(out, batch_wins):
            num[y:y + tile, x:x + tile] += p * w2d
            den[y:y + tile, x:x + tile] += w2d

    if task.wants_int8_serving() and task._trunk_q is None and wins:
        # calibrate on the GLOBAL first window batch — identical on every
        # process, so banded multi-host synthesis derives ONE shared
        # quantised trunk (single-process: global first batch == own first)
        tiles, embeds, _ = make_batch(wins_global[:bs_eff])
        x = task._dn_to_reflectance(tiles, task.compute_dtype)
        task._trunk_q = task.build_trunk_q(task._params_g, x, embeds)

    pending = None
    for i in range(0, len(wins), bs_eff):
        batch_wins = wins[i:i + bs_eff]
        tiles, embeds, n_real = make_batch(batch_wins)
        dev = fused(tiles.shape[0])(task._params_g, task._stats_g, tiles,
                                    embeds, task._trunk_q)[:n_real]
        if pending is not None:
            flush(pending)
        pending = (dev, batch_wins)
        if progress:
            print(f"\r  windows {min(i + bs_eff, len(wins))}/{len(wins)}",
                  end="", flush=True)
    if pending is not None:
        flush(pending)
    if progress:
        print()

    if banded:
        a2, b2 = max(lo, O), min(hi, O + H)
        if b2 <= a2:  # band entirely inside the padding margin
            return np.zeros((1, 0, W), np.float32), 0
        band = num[a2:b2, O:O + W] / den[a2:b2, O:O + W]
        return band[None].astype(np.float32), a2 - O
    nir = num[O:O + H, O:O + W] / den[O:O + H, O:O + W]
    return nir[None].astype(np.float32)
