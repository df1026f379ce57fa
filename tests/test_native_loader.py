"""Native C++ tile pipeline: build, decode parity vs numpy, batching, and
throughput sanity."""

import os
import time

import numpy as np
import pytest

from nirgan_tpu.data import native_loader


@pytest.fixture(scope="module")
def tile_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("tiles")
    rng = np.random.default_rng(0)
    for i in range(12):
        arr = (rng.random((4, 80, 80)) * 10000).astype(np.uint16)
        np.save(d / f"tile_{i:03d}.npy", arr)
    # one float32 tile and one corrupt file
    np.save(d / "tile_f32.npy", rng.random((4, 80, 80)).astype(np.float32))
    (d / "corrupt.npy").write_bytes(b"not an npy file at all")
    return str(d)


def test_native_lib_builds():
    assert native_loader.available(), "g++ build of native/tileio.cc failed"


def test_decode_parity_with_numpy(tile_dir):
    paths = sorted(os.path.join(tile_dir, f) for f in os.listdir(tile_dir)
                   if f.startswith("tile_0"))
    reader = native_loader.NativeTileReader(paths, crop=64, n_threads=3)
    got = dict(iter(reader))
    reader.close()
    assert len(got) == len(paths)
    for i, p in enumerate(paths):
        ref = np.load(p).astype(np.float32) / 10000.0
        y0 = (80 - 64) // 2
        ref = ref[:, y0:y0 + 64, y0:y0 + 64]
        np.testing.assert_allclose(got[i], ref, rtol=1e-6, atol=1e-7)


def test_f32_and_corrupt_handling(tile_dir):
    paths = [os.path.join(tile_dir, "tile_f32.npy"),
             os.path.join(tile_dir, "corrupt.npy")]
    reader = native_loader.NativeTileReader(paths, crop=64)
    got = dict(iter(reader))
    reader.close()
    assert 0 in got and 1 not in got  # f32 decoded, corrupt skipped
    ref = np.load(paths[0])[:, 8:72, 8:72]
    np.testing.assert_allclose(got[0], ref, rtol=1e-6)


def test_native_dataset_batches(tile_dir):
    ds = native_loader.NativeNpyDataset(tile_dir, image_size=64, batch_size=4,
                                        shuffle=True, seed=1)
    batches = list(ds)
    assert len(batches) == len(ds) == 3  # 13 decodable tiles // 4
    assert batches[0]["rgb"].shape == (4, 3, 64, 64)
    assert batches[0]["nir"].shape == (4, 1, 64, 64)
    assert batches[0]["rgb"].dtype == np.float32
    assert 0.0 <= batches[0]["rgb"].min() and batches[0]["rgb"].max() <= 1.0


def test_native_faster_than_single_thread_python(tile_dir):
    """Sanity: the threaded native reader should not be slower than a naive
    sequential numpy loop (usually several times faster)."""
    paths = [os.path.join(tile_dir, f) for f in sorted(os.listdir(tile_dir))
             if f.startswith("tile_0")] * 20

    t0 = time.perf_counter()
    reader = native_loader.NativeTileReader(paths, crop=64, n_threads=8)
    n = sum(1 for _ in reader)
    reader.close()
    t_native = time.perf_counter() - t0
    assert n == len(paths)

    t0 = time.perf_counter()
    for p in paths:
        a = np.load(p).astype(np.float32) / 10000.0
        a = a[:, 8:72, 8:72].copy()
    t_py = time.perf_counter() - t0
    assert t_native < t_py * 1.5, (t_native, t_py)


@pytest.mark.parametrize("planar,dtype", [(False, np.uint16), (True, np.uint16),
                                          (False, np.float32)])
def test_native_reader_decodes_geotiff(tmp_path, planar, dtype):
    """The C++ TIFF decode path matches the Python reference reader
    (nirgan_tpu/data/geotiff.py) bit-for-bit."""
    from nirgan_tpu.data import native_loader
    from nirgan_tpu.data.geotiff import read_geotiff, write_geotiff

    if not native_loader.available():
        pytest.skip("no C++ toolchain")
    rng = np.random.default_rng(21)
    paths = []
    for i in range(3):
        if np.issubdtype(dtype, np.integer):
            img = rng.integers(0, 10000, (4, 24, 24)).astype(dtype)
        else:
            img = rng.random((4, 24, 24)).astype(dtype)
        p = str(tmp_path / f"t{i}.tif")
        write_geotiff(p, img, epsg=32632, planar=planar,
                      rows_per_strip=5 if i % 2 else None)
        paths.append(p)

    reader = native_loader.NativeTileReader(paths, crop=16, n_threads=2)
    got = {idx: tile for idx, tile in reader}
    reader.close()
    assert sorted(got) == [0, 1, 2]
    for i, p in enumerate(paths):
        ref, _ = read_geotiff(p, dn_scale=10000.0)
        c = (ref.shape[1] - 16) // 2
        np.testing.assert_allclose(got[i], ref[:, c:c + 16, c:c + 16], rtol=1e-6)


def test_native_dataset_over_tiff_folder(tmp_path):
    from nirgan_tpu.data import native_loader
    from nirgan_tpu.data.geotiff import write_geotiff

    if not native_loader.available():
        pytest.skip("no C++ toolchain")
    rng = np.random.default_rng(22)
    for i in range(4):
        write_geotiff(str(tmp_path / f"x{i}.tif"),
                      rng.integers(0, 10000, (4, 20, 20)).astype(np.uint16),
                      epsg=4326)
    ds = native_loader.NativeNpyDataset(str(tmp_path), image_size=16,
                                        batch_size=2, n_threads=2)
    batches = list(ds)
    assert len(batches) == 2
    assert batches[0]["rgb"].shape == (2, 3, 16, 16)
    assert batches[0]["nir"].shape == (2, 1, 16, 16)
    assert float(batches[0]["rgb"].max()) <= 1.0


def test_native_dataset_returns_geotiff_coords(tmp_path):
    """return_coords: header-only geo metadata joins the C++-decoded tiles,
    matched through the decode-completion reordering — feeds SatCLIP
    training from the native pipeline."""
    from nirgan_tpu.data import native_loader
    from nirgan_tpu.data.geotiff import write_geotiff

    if not native_loader.available():
        pytest.skip("no C++ toolchain")
    rng = np.random.default_rng(23)
    # distinct centroids: easting 500km + i*1km in UTM 32N
    for i in range(4):
        ox = 500000.0 + 1000.0 * i - (10 // 2 + 0.5) * 10.0
        oy = 5000000.0 + (10 // 2 + 0.5) * 10.0
        img = np.full((4, 10, 10), i * 1000, np.uint16)
        write_geotiff(str(tmp_path / f"t{i}.tif"), img, pixel_scale=(10.0, 10.0),
                      origin=(ox, oy), epsg=32632)

    ds = native_loader.NativeNpyDataset(str(tmp_path), image_size=8,
                                        batch_size=2, n_threads=2,
                                        shuffle=True, return_coords=True)
    from nirgan_tpu.data.geotiff import utm_to_lonlat

    want = {i: utm_to_lonlat(32632, 500000.0 + 1000.0 * i, 5000000.0)
            for i in range(4)}
    n = 0
    for batch in ds:
        assert batch["coords"].shape == (2, 2)
        for rgb, c in zip(batch["rgb"], batch["coords"]):
            i = int(round(rgb[0, 0, 0] * 10000 / 1000))  # tile id from DN
            assert abs(c[0] - want[i][0]) < 1e-4, (i, c)
            assert abs(c[1] - want[i][1]) < 1e-4
            n += 1
    assert n == 4


@pytest.mark.parametrize("compression,predictor", [
    ("deflate", False), ("deflate", True), ("lzw", False), ("lzw", True),
    ("packbits", False), ("zstd", False), ("zstd", True),
])
def test_native_reader_decodes_compressed_geotiff(tmp_path, compression,
                                                  predictor):
    """The C++ decode path handles DEFLATE/LZW/PackBits/ZSTD (+predictor-2)
    streams identically to the Python reference reader."""
    from nirgan_tpu.data import native_loader
    from nirgan_tpu.data.geotiff import read_geotiff, write_geotiff

    if not native_loader.available():
        pytest.skip("no C++ toolchain")
    rng = np.random.default_rng(31)
    paths = []
    for i, planar in enumerate((False, True)):
        img = rng.integers(0, 10000, (4, 24, 24)).astype(np.uint16)
        p = str(tmp_path / f"c{i}.tif")
        write_geotiff(p, img, epsg=32632, planar=planar, rows_per_strip=7,
                      predictor=predictor, compression=compression)
        paths.append(p)
    reader = native_loader.NativeTileReader(paths, crop=24, n_threads=2)
    got = {idx: tile for idx, tile in reader}
    reader.close()
    assert sorted(got) == [0, 1]
    for i, p in enumerate(paths):
        ref, _ = read_geotiff(p, dn_scale=10000.0)
        np.testing.assert_allclose(got[i], ref, rtol=0, atol=1e-6)


def test_native_reader_decodes_jpeg_geotiff(tmp_path):
    """New-style JPEG-in-TIFF through the C++ path (system libjpeg,
    JPEGTables splicing) matches the Python reader (Pillow's libjpeg) —
    same decoder family, so bit-identical output.  Covers our writer's
    self-contained YCbCr streams, a planar 4-band file, and a
    Pillow/libtiff-written file with a shared JPEGTables tag."""
    from nirgan_tpu.data import native_loader
    from nirgan_tpu.data.geotiff import read_geotiff, write_geotiff

    if not native_loader.available():
        pytest.skip("no C++ toolchain")
    PIL = pytest.importorskip("PIL.Image")
    rng = np.random.default_rng(41)
    paths = []

    img3 = (rng.random((3, 24, 24)) * 255).astype(np.uint8)
    p = str(tmp_path / "chunky3.tif")
    write_geotiff(p, img3, compression="jpeg", rows_per_strip=8)
    paths.append(p)

    img4 = (rng.random((4, 24, 24)) * 255).astype(np.uint8)
    p = str(tmp_path / "planar4.tif")
    write_geotiff(p, img4, compression="jpeg", planar=True, rows_per_strip=8)
    paths.append(p)

    arr = (rng.random((24, 24, 3)) * 255).astype(np.uint8)
    p = str(tmp_path / "piltables.tif")
    try:
        PIL.fromarray(arr).save(p, compression="jpeg", quality=95)
        paths.append(p)
    except OSError:
        pass  # Pillow without libtiff: skip this leg only

    reader = native_loader.NativeTileReader(paths, crop=24, n_threads=2)
    got = {idx: tile for idx, tile in reader}
    reader.close()
    assert sorted(got) == list(range(len(paths)))
    for i, p in enumerate(paths):
        ref, _ = read_geotiff(p, dn_scale=10000.0)
        np.testing.assert_allclose(got[i], ref, rtol=0, atol=1e-6)


def test_native_reader_decodes_bigtiff(tmp_path):
    """BigTIFF (magic 43, u64 offsets/counts, LONG8 strip tags) through the
    C++ path matches the Python reader, incl. a Pillow-written file."""
    from nirgan_tpu.data import native_loader
    from nirgan_tpu.data.geotiff import read_geotiff, write_geotiff

    if not native_loader.available():
        pytest.skip("no C++ toolchain")
    rng = np.random.default_rng(51)
    paths = []
    img = rng.integers(0, 10000, (4, 24, 24)).astype(np.uint16)
    for i, (compression, planar) in enumerate(
            [("none", False), ("zstd", True), ("deflate", False)]):
        p = str(tmp_path / f"b{i}.tif")
        write_geotiff(p, img, epsg=32632, bigtiff=True, planar=planar,
                      compression=compression, rows_per_strip=7,
                      predictor=compression != "none")
        paths.append(p)
    try:
        from PIL import Image
        arr = (rng.random((24, 24, 3)) * 255).astype(np.uint8)
        p = str(tmp_path / "pil_big.tif")
        Image.fromarray(arr).save(p, big_tiff=True)
        paths.append(p)
    except (ImportError, TypeError):
        pass  # old Pillow: skip this leg only

    reader = native_loader.NativeTileReader(paths, crop=24, n_threads=2)
    got = {idx: tile for idx, tile in reader}
    reader.close()
    assert sorted(got) == list(range(len(paths)))
    for i, p in enumerate(paths):
        ref, _ = read_geotiff(p, dn_scale=10000.0)
        np.testing.assert_allclose(got[i], ref, rtol=0, atol=1e-6)


@pytest.mark.parametrize("dtype", [np.float32, np.uint16, np.uint8])
def test_scene_cut_matches_numpy(dtype):
    """tileio_scene_cut ≡ the numpy window loop of inference/scene.py."""
    if not native_loader.available():
        pytest.skip("no C++ toolchain")
    rng = np.random.default_rng(21)
    pad = (rng.random((3, 90, 77)) * 200).astype(dtype)
    tile = 32
    wins = np.asarray([(0, 0), (58, 45), (17, 3), (58, 0)], np.int32)
    ref = np.stack([pad[:, y:y + tile, x:x + tile] for y, x in wins])
    ref = np.transpose(ref, (0, 2, 3, 1))
    got = native_loader.scene_cut(pad, wins, tile)
    assert got.dtype == dtype
    np.testing.assert_array_equal(got, ref)


def test_scene_blend_matches_numpy():
    """tileio_scene_blend ≡ the += plateau blend, incl. overlapping windows
    (row-stripe threading must not race)."""
    if not native_loader.available():
        pytest.skip("no C++ toolchain")
    from nirgan_tpu.inference.scene import plateau_weight

    rng = np.random.default_rng(22)
    Hp, Wp, tile = 96, 80, 32
    w1 = plateau_weight(tile, 8)
    w2d = np.outer(w1, w1)
    wins = np.asarray([(y, x) for y in (0, 16, 64) for x in (0, 24, 48)],
                      np.int32)
    preds = rng.random((len(wins), tile, tile)).astype(np.float32)

    num_ref = np.zeros((Hp, Wp), np.float32)
    den_ref = np.zeros((Hp, Wp), np.float32)
    for p, (y, x) in zip(preds, wins):
        num_ref[y:y + tile, x:x + tile] += p * w2d
        den_ref[y:y + tile, x:x + tile] += w2d

    num = np.zeros((Hp, Wp), np.float32)
    den = np.zeros((Hp, Wp), np.float32)
    native_loader.scene_blend(num, den, preds, wins, tile, w1)
    np.testing.assert_allclose(num, num_ref, rtol=0, atol=1e-6)
    np.testing.assert_allclose(den, den_ref, rtol=0, atol=1e-6)
