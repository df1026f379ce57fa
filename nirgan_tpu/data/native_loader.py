"""ctypes binding for the native tile pipeline (``native/tileio.cc``).

Builds the shared library on first use (g++, cached under ``native/build``)
and exposes ``NativeNpyDataset`` — a drop-in map-free iterable that decodes
uint16-DN/f32 ``.npy`` and GeoTIFF RGBN tiles (incl. DEFLATE/LZW/PackBits/
ZSTD/JPEG codecs, linking the system zlib/libzstd/libjpeg) in C++ worker
threads, bypassing Python in the decode path entirely.  Falls back to the
numpy reader when no compiler is available (``available()`` gates usage).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional, Sequence

import numpy as np

__all__ = ["available", "NativeTileReader", "NativeNpyDataset",
           "scene_cut", "scene_blend"]

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(os.path.dirname(os.path.dirname(_HERE)), "native", "tileio.cc")
_BUILD = os.path.join(os.path.dirname(_SRC), "build")
_LIB_PATH = os.path.join(_BUILD, "libtileio.so")
_lock = threading.Lock()
_lib = None
_build_failed = False


def _load_lib():
    global _lib, _build_failed
    with _lock:
        if _lib is not None or _build_failed:
            return _lib
        try:
            if not os.path.exists(_LIB_PATH) or (
                    os.path.getmtime(_LIB_PATH) < os.path.getmtime(_SRC)):
                os.makedirs(_BUILD, exist_ok=True)
                subprocess.run(
                    ["g++", "-O3", "-shared", "-fPIC", "-std=c++17",
                     "-o", _LIB_PATH, _SRC, "-lpthread", "-lz", "-lzstd",
                     "-ljpeg"],
                    check=True, capture_output=True)
            # DEEPBIND so tileio's libzstd/libjpeg/zlib dependencies resolve
            # their own internal symbols even when tensorflow/Pillow wheels
            # have loaded incompatible bundled copies into the global scope
            # (see geotiff._zstd for the observed failure mode)
            lib = ctypes.CDLL(_LIB_PATH, mode=getattr(os, "RTLD_DEEPBIND", 0)
                              | ctypes.RTLD_LOCAL)
            lib.tileio_create.restype = ctypes.c_void_p
            lib.tileio_create.argtypes = [
                ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int,
                ctypes.c_float, ctypes.c_int, ctypes.c_int]
            lib.tileio_next.restype = ctypes.c_int
            lib.tileio_next.argtypes = [
                ctypes.c_void_p, ctypes.POINTER(ctypes.c_float), ctypes.c_int,
                ctypes.POINTER(ctypes.c_int)]
            lib.tileio_destroy.argtypes = [ctypes.c_void_p]
            lib.tileio_scene_cut.restype = None
            lib.tileio_scene_cut.argtypes = [
                ctypes.c_void_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
                ctypes.POINTER(ctypes.c_int), ctypes.c_int, ctypes.c_int,
                ctypes.c_void_p, ctypes.c_int, ctypes.c_int]
            lib.tileio_scene_blend.restype = None
            lib.tileio_scene_blend.argtypes = [
                ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
                ctypes.c_int, ctypes.c_int, ctypes.POINTER(ctypes.c_float),
                ctypes.POINTER(ctypes.c_int), ctypes.c_int, ctypes.c_int,
                ctypes.POINTER(ctypes.c_float), ctypes.c_int]
            _lib = lib
        except Exception as e:  # no compiler / build error → numpy fallback
            print("native tileio unavailable:", e)
            _build_failed = True
        return _lib


def available() -> bool:
    return _load_lib() is not None


def _n_threads() -> int:
    return max(1, min(8, os.cpu_count() or 1))


def scene_cut(pad: np.ndarray, wins: np.ndarray, tile: int) -> np.ndarray:
    """Cut windows out of a CHW scene into an NHWC batch with C++ threads.

    ``pad``: (C, Hp, Wp) contiguous u8/u16/f32; ``wins``: (n, 2) int32 (y, x)
    origins.  Returns (n, tile, tile, C) in pad's dtype — equivalent to
    ``np.stack([pad[:, y:y+t, x:x+t] for y, x in wins]).transpose(0,2,3,1)``
    (the single-threaded numpy loop in ``inference/scene.py make_batch``)."""
    lib = _load_lib()
    assert lib is not None
    pad = np.ascontiguousarray(pad)
    assert pad.dtype.itemsize in (1, 2, 4), pad.dtype
    wins = np.ascontiguousarray(wins, np.int32)
    n = wins.shape[0]
    out = np.empty((n, tile, tile, pad.shape[0]), pad.dtype)
    lib.tileio_scene_cut(
        pad.ctypes.data_as(ctypes.c_void_p), pad.shape[0], pad.shape[1],
        pad.shape[2], wins.ctypes.data_as(ctypes.POINTER(ctypes.c_int)), n,
        tile, out.ctypes.data_as(ctypes.c_void_p), pad.dtype.itemsize,
        _n_threads())
    return out


def scene_blend(num: np.ndarray, den: np.ndarray, preds: np.ndarray,
                wins: np.ndarray, tile: int, w1d: np.ndarray) -> None:
    """Accumulate predicted windows into the (Hp, Wp) num/den planes with
    the separable plateau weight, row-stripe threaded (no races on
    overlapping windows).  In-place equivalent of the ``flush`` loop in
    ``inference/scene.py``: ``num[y:y+t, x:x+t] += p * outer(w, w)``."""
    lib = _load_lib()
    assert lib is not None
    assert num.flags.c_contiguous and den.flags.c_contiguous
    assert num.dtype == den.dtype == np.float32
    preds = np.ascontiguousarray(preds, np.float32)
    wins = np.ascontiguousarray(wins, np.int32)
    w1d = np.ascontiguousarray(w1d, np.float32)
    assert w1d.shape == (tile,)
    f32p = ctypes.POINTER(ctypes.c_float)
    lib.tileio_scene_blend(
        num.ctypes.data_as(f32p), den.ctypes.data_as(f32p),
        num.shape[0], num.shape[1], preds.ctypes.data_as(f32p),
        wins.ctypes.data_as(ctypes.POINTER(ctypes.c_int)), wins.shape[0],
        tile, w1d.ctypes.data_as(f32p), _n_threads())


class NativeTileReader:
    """Stream (index, (C,crop,crop) float32) tiles decoded by C++ threads."""

    def __init__(self, paths: Sequence[str], crop: int, channels: int = 4,
                 dn_scale: float = 10000.0, n_threads: int = 4,
                 capacity: int = 32):
        lib = _load_lib()
        if lib is None:
            raise RuntimeError("native tileio library unavailable")
        self._lib = lib
        self._n = len(paths)
        self._crop = crop
        self._channels = channels
        arr = (ctypes.c_char_p * self._n)(
            *[os.fsencode(p) for p in paths])
        self._paths_keepalive = arr
        self._handle = lib.tileio_create(arr, self._n, crop,
                                         ctypes.c_float(dn_scale),
                                         n_threads, capacity)
        self._buf = np.empty(channels * crop * crop, np.float32)
        self._closed = False

    def __iter__(self):
        c_out = ctypes.c_int(0)
        ptr = self._buf.ctypes.data_as(ctypes.POINTER(ctypes.c_float))
        while True:
            idx = self._lib.tileio_next(self._handle, ptr, self._buf.size, ctypes.byref(c_out))
            if idx == -1:
                break
            if idx == -2:
                continue  # decode failure — skip tile (logged C-side)
            ch = c_out.value
            tile = self._buf[:ch * self._crop * self._crop].reshape(
                ch, self._crop, self._crop).copy()
            yield idx, tile

    def close(self):
        if not self._closed:
            self._lib.tileio_destroy(self._handle)
            self._closed = True

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass


class NativeNpyDataset:
    """Batch iterable over a folder of RGBN ``.npy``/GeoTIFF tiles using the
    native reader; yields the universal batch dict.  (Epoch order is the
    shuffled path order; within an epoch, batches arrive in decode-completion
    order — an extra shuffle layer, fine for training.)"""

    SUFFIXES = (".npy", ".tif", ".tiff")

    def __init__(self, base_path: str, image_size: int = 256,
                 batch_size: int = 16, shuffle: bool = True, seed: int = 0,
                 n_threads: int = 8, drop_last: bool = True,
                 return_coords: bool = False):
        self.paths = sorted(os.path.join(base_path, f)
                            for f in os.listdir(base_path)
                            if f.lower().endswith(self.SUFFIXES))
        if not self.paths:
            raise FileNotFoundError(f"no .npy/.tif tiles under {base_path!r}")
        self.image_size = image_size
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.seed = seed
        self.n_threads = n_threads
        self.drop_last = drop_last
        self.return_coords = bool(return_coords)
        self._coords = None
        self._epoch = 0

    def _path_coords(self) -> np.ndarray:
        """(N, 2) lon/lat per path — header-only metadata reads, cached once;
        the pixel decode stays in the C++ workers.  .npy tiles (no geo
        header) get (0, 0), like the fake dataset."""
        if self._coords is None:
            from nirgan_tpu.data.geotiff import centroid_lonlat, read_geotiff_meta

            out = np.zeros((len(self.paths), 2), np.float32)
            for i, p in enumerate(self.paths):
                if p.lower().endswith((".tif", ".tiff")):
                    try:
                        ll = centroid_lonlat(read_geotiff_meta(p))
                        if ll is not None:
                            out[i] = ll
                    except Exception:
                        pass
            self._coords = out
        return self._coords

    def __len__(self):
        n = len(self.paths)
        return n // self.batch_size if self.drop_last else -(-n // self.batch_size)

    def __iter__(self):
        order = np.arange(len(self.paths))
        if self.shuffle:
            np.random.default_rng(self.seed + self._epoch).shuffle(order)
        self._epoch += 1
        reader = NativeTileReader([self.paths[i] for i in order],
                                  crop=self.image_size, n_threads=self.n_threads)
        coords = self._path_coords() if self.return_coords else None

        def emit(buf, idxs):
            batch = {"rgb": np.stack(buf)[:, :3], "nir": np.stack(buf)[:, 3:4]}
            if coords is not None:
                batch["coords"] = coords[order[np.asarray(idxs)]]
            return batch

        try:
            buf, idxs = [], []
            for i, tile in reader:
                buf.append(tile)
                idxs.append(i)
                if len(buf) == self.batch_size:
                    yield emit(buf, idxs)
                    buf, idxs = [], []
            if buf and not self.drop_last:
                yield emit(buf, idxs)
        finally:
            reader.close()
