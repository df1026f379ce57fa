"""Self-contained GeoTIFF stack (nirgan_tpu/data/geotiff.py): reader/writer
round-trips, GeoKey parsing, UTM→WGS84 inversion, and the
GeoTiffFolderDataset → train-step path with no rasterio/tifffile installed
(reference contract: /root/reference/data/SR_dataset_RGB.py:29-43)."""

import math

import os

import numpy as np
import pytest

from nirgan_tpu.data.geotiff import (
    centroid_lonlat,
    read_geotiff,
    utm_to_lonlat,
    write_geotiff,
)


@pytest.mark.parametrize("dtype,planar,rps", [
    (np.uint16, False, None),
    (np.uint16, True, 4),
    (np.uint8, False, 3),
    (np.float32, False, None),
    (np.float32, True, None),
])
def test_write_read_roundtrip(tmp_path, dtype, planar, rps):
    rng = np.random.default_rng(5)
    if np.issubdtype(dtype, np.integer):
        img = rng.integers(0, 10000, (4, 11, 13)).astype(dtype)
    else:
        img = rng.random((4, 11, 13)).astype(dtype)
    p = str(tmp_path / "t.tif")
    write_geotiff(p, img, pixel_scale=(10.0, 10.0), origin=(699960.0, 5900040.0),
                  epsg=32632, planar=planar, rows_per_strip=rps)
    got, meta = read_geotiff(p)
    np.testing.assert_allclose(got, img.astype(np.float32))
    assert meta["epsg"] == 32632
    assert meta["pixel_scale"] == (10.0, 10.0)
    assert meta["tiepoint"][3:5] == (699960.0, 5900040.0)

    # DN scaling applies to integer samples only
    got2, _ = read_geotiff(p, dn_scale=10000.0)
    if np.issubdtype(dtype, np.integer):
        np.testing.assert_allclose(got2, img.astype(np.float32) / 10000.0)
    else:
        np.testing.assert_allclose(got2, img.astype(np.float32))


def _forward_utm(lon_deg, lat_deg, zone, north=True):
    """Independent forward Krüger series (test oracle for the inverse)."""
    a, f, k0 = 6378137.0, 1 / 298.257223563, 0.9996
    n = f / (2 - f)
    A = a / (1 + n) * (1 + n**2 / 4 + n**4 / 64)
    e = math.sqrt(f * (2 - f))
    lon0 = math.radians(zone * 6 - 183)
    lat, lon = math.radians(lat_deg), math.radians(lon_deg) - lon0
    t = math.sinh(math.atanh(math.sin(lat)) - e * math.atanh(e * math.sin(lat)))
    xi = math.atan2(t, math.cos(lon))
    eta = math.asinh(math.sin(lon) / math.hypot(t, math.cos(lon)))
    alpha = [n / 2 - 2 * n**2 / 3 + 5 * n**3 / 16 + 41 * n**4 / 180,
             13 * n**2 / 48 - 3 * n**3 / 5 + 557 * n**4 / 1440,
             61 * n**3 / 240 - 103 * n**4 / 140,
             49561 * n**4 / 161280]
    x, y = eta, xi
    for j, al in enumerate(alpha, start=1):
        y += al * math.sin(2 * j * xi) * math.cosh(2 * j * eta)
        x += al * math.cos(2 * j * xi) * math.sinh(2 * j * eta)
    easting = 500000.0 + k0 * A * x
    northing = k0 * A * y + (0.0 if north else 10000000.0)
    return easting, northing


def test_utm_to_lonlat_central_meridian():
    lon, lat = utm_to_lonlat(32632, 500000.0, 0.0)
    assert abs(lon - 9.0) < 1e-9 and abs(lat) < 1e-9
    lon, lat = utm_to_lonlat(32756, 500000.0, 10000000.0)
    assert abs(lon - 153.0) < 1e-9 and abs(lat) < 1e-9


@pytest.mark.parametrize("lon,lat,zone,north", [
    (9.5, 48.7, 32, True),     # Stuttgart-ish
    (7.1, 50.7, 32, True),
    (151.2, -33.85, 56, False),  # Sydney
    (-70.66, -33.45, 19, False),  # Santiago
])
def test_utm_roundtrip(lon, lat, zone, north):
    e, n = _forward_utm(lon, lat, zone, north)
    epsg = (32600 if north else 32700) + zone
    lon2, lat2 = utm_to_lonlat(epsg, e, n)
    assert abs(float(lon2) - lon) < 1e-8
    assert abs(float(lat2) - lat) < 1e-8


def test_centroid_lonlat_matches_rasterio_convention(tmp_path):
    """centroid = pixel-center of (h//2, w//2) — src.xy semantics."""
    img = np.zeros((4, 10, 10), np.uint16)
    p = str(tmp_path / "c.tif")
    # 10 m pixels; put the tile so its centroid sits at UTM 32N 500000, 5000000
    ox = 500000.0 - (10 // 2 + 0.5) * 10.0
    oy = 5000000.0 + (10 // 2 + 0.5) * 10.0
    write_geotiff(p, img, pixel_scale=(10.0, 10.0), origin=(ox, oy), epsg=32632)
    _, meta = read_geotiff(p)
    ll = centroid_lonlat(meta)
    assert abs(ll[0] - 9.0) < 1e-5  # central meridian
    exp_lon, exp_lat = utm_to_lonlat(32632, 500000.0, 5000000.0)
    assert abs(ll[0] - exp_lon) < 1e-5 and abs(ll[1] - exp_lat) < 1e-5


def test_geotiff_dataset_feeds_train_step(tmp_path):
    """End-to-end: GeoTIFF folder → dataset → real fused GAN train step,
    with neither rasterio nor tifffile installed."""
    import jax
    from nirgan_tpu.config import load_config
    from nirgan_tpu.data.datasets import GeoTiffFolderDataset
    from nirgan_tpu.tasks import Px2PxTask

    rng = np.random.default_rng(6)
    for i in range(3):
        img = rng.integers(0, 10000, (4, 40, 40)).astype(np.uint16)
        write_geotiff(str(tmp_path / f"tile{i}.tif"), img,
                      pixel_scale=(10.0, 10.0),
                      origin=(399960.0 + 400 * i, 5800020.0), epsg=32633)

    ds = GeoTiffFolderDataset(str(tmp_path), image_size=32, return_coords=True)
    assert len(ds) == 3
    item = ds[0]
    assert item["rgb"].shape == (3, 32, 32) and item["nir"].shape == (1, 32, 32)
    assert float(item["rgb"].max()) <= 1.0  # DN/10000
    assert 13.0 < item["coords"][0] < 17.0  # zone 33 longitudes
    assert 50.0 < item["coords"][1] < 55.0

    cfg = load_config("configs/config_px2px_SatCLIP.yaml")
    cfg.tpu.compute_dtype = "float32"
    cfg.Data.fake_settings.image_size = 32
    task = Px2PxTask(cfg)
    state = task.init_state(seed=0, image_size=32)
    step = task.make_train_step()
    batch = {k: np.stack([ds[i][k] for i in range(2)]) for k in ("rgb", "nir", "coords")}
    state, metrics = step(state, task.extract_batch(batch))
    assert np.isfinite(float(metrics["model_loss/generator_total_loss"]))


def test_sr_paired_dataset_reads_geotiff(tmp_path):
    """SRPairedDataset serves the reference SR contract from GeoTIFF pairs,
    coords from the LR raster's georeferencing (SR_dataset_RGB.py:29-43)."""
    from nirgan_tpu.data.datasets import SRPairedDataset

    rng = np.random.default_rng(7)
    (tmp_path / "LR").mkdir()
    (tmp_path / "HR").mkdir()
    ox = 500000.0 - (8 // 2 + 0.5) * 10.0
    oy = 5000000.0 + (8 // 2 + 0.5) * 10.0
    write_geotiff(str(tmp_path / "LR" / "a.tif"),
                  rng.integers(0, 10000, (4, 8, 8)).astype(np.uint16),
                  pixel_scale=(10.0, 10.0), origin=(ox, oy), epsg=32632)
    write_geotiff(str(tmp_path / "HR" / "a.tif"),
                  rng.integers(0, 10000, (3, 32, 32)).astype(np.uint16),
                  epsg=32632)
    ds = SRPairedDataset(str(tmp_path))
    item = ds[0]
    assert item["lr"].shape == (3, 8, 8)
    assert item["hr"].shape == (3, 32, 32)
    assert item["s2_nir"].shape == (1, 8, 8)
    assert item["id"] == "a"
    assert abs(item["coords"][0] - 9.0) < 1e-4  # UTM 32N central meridian

    # DN passthrough: same tiles, native uint16 (half the ingest bytes)
    raw = SRPairedDataset(str(tmp_path), dn_passthrough=True)[0]
    assert raw["hr"].dtype == np.uint16 and raw["s2_nir"].dtype == np.uint16
    np.testing.assert_allclose(raw["hr"].astype(np.float32) / 10000.0,
                               item["hr"], atol=1e-7)


def test_sr_paired_dataset_wide_int_dn_scaled_on_host(tmp_path):
    """Integer dtypes the serving ingest would NOT keep integer (int32 npz
    DN tiles) must be DN-scaled on host even under dn_passthrough —
    otherwise they reach the device as floats and skip the on-device
    DN/10000 (10^4-too-large generator inputs, found in review)."""
    from nirgan_tpu.data.datasets import SRPairedDataset

    rng = np.random.default_rng(3)
    (tmp_path / "LR").mkdir()
    (tmp_path / "HR").mkdir()
    np.savez(tmp_path / "LR" / "a.npz",
             image=rng.integers(0, 10000, (4, 8, 8)).astype(np.int32))
    np.savez(tmp_path / "HR" / "a.npz",
             image=rng.integers(0, 10000, (3, 32, 32)).astype(np.int32))
    item = SRPairedDataset(str(tmp_path), dn_passthrough=True)[0]
    assert item["hr"].dtype == np.float32
    assert item["hr"].max() <= 1.0  # DN scale applied on host


def test_synthesize_dn_passthrough_matches_float(tmp_path):
    """The serving pipeline on a uint16-DN passthrough dataset (scale on
    device) matches the float-reflectance path.

    Not bit-identical: XLA rewrites the on-device DN/10000 into a
    multiply-by-reciprocal, 1 ulp off numpy's division on some DN values;
    where that ulp splits a histogram-match tie group, the affected pixel
    moves by one fp16 quantum.  Bound: >=99% of pixels byte-identical, the
    rest within 2e-3 (one fp16 ulp at reflectance magnitudes)."""
    from nirgan_tpu.config import load_config
    from nirgan_tpu.data.datasets import SRPairedDataset
    from nirgan_tpu.inference import synthesize_dataset
    from nirgan_tpu.tasks import Px2PxTask

    rng = np.random.default_rng(11)
    (tmp_path / "LR").mkdir()
    (tmp_path / "HR").mkdir()
    for i in range(3):
        write_geotiff(str(tmp_path / "LR" / f"t{i}.tif"),
                      rng.integers(0, 10000, (4, 16, 16)).astype(np.uint16))
        write_geotiff(str(tmp_path / "HR" / f"t{i}.tif"),
                      rng.integers(0, 10000, (3, 64, 64)).astype(np.uint16))

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    cfg = load_config(os.path.join(repo, "configs/config_px2px.yaml"))
    cfg.base_configs.ngf = 8
    cfg.base_configs.ndf = 8
    cfg.Data.padding_amount = 2
    cfg.tpu.compute_dtype = "float32"
    cfg.tpu.shape_buckets = [64]
    task = Px2PxTask(cfg)
    task.bind(task.init_state(seed=0, image_size=64))

    out_f = str(tmp_path / "float")
    out_u = str(tmp_path / "uint")
    n1 = synthesize_dataset(task, SRPairedDataset(str(tmp_path)), out_f,
                            batch_size=2, plot_every=10 ** 9)
    n2 = synthesize_dataset(
        task, SRPairedDataset(str(tmp_path), dn_passthrough=True), out_u,
        batch_size=2, plot_every=10 ** 9)
    assert n1 == n2 == 3
    for f in sorted(os.listdir(out_f)):
        a = np.load(os.path.join(out_f, f))["nir"]
        b = np.load(os.path.join(out_u, f))["nir"]
        same = (a == b).mean()
        assert same >= 0.99, (f, same)
        np.testing.assert_allclose(a, b, rtol=0, atol=2e-3, err_msg=f)


@pytest.mark.parametrize("planar,predictor", [(False, False), (False, True),
                                              (True, True)])
def test_deflate_roundtrip(tmp_path, planar, predictor):
    """DEFLATE(+predictor-2) GeoTIFFs decode without rasterio — the common
    real-world Sentinel-2 tile encoding."""
    rng = np.random.default_rng(9)
    img = rng.integers(0, 10000, (4, 15, 12)).astype(np.uint16)
    p = str(tmp_path / "z.tif")
    write_geotiff(p, img, epsg=32632, planar=planar, rows_per_strip=4,
                  deflate=True, predictor=predictor)
    got, meta = read_geotiff(p)
    np.testing.assert_array_equal(got, img.astype(np.float32))
    assert meta["epsg"] == 32632


@pytest.mark.parametrize("compression,planar,predictor", [
    ("lzw", False, False), ("lzw", False, True), ("lzw", True, True),
    ("packbits", False, False), ("packbits", True, False),
    ("zstd", False, False), ("zstd", False, True), ("zstd", True, True),
])
def test_lzw_packbits_roundtrip(tmp_path, compression, planar, predictor):
    """LZW (early-change), PackBits, and ZSTD (tag 50000, system libzstd
    via ctypes) GeoTIFFs decode without rasterio."""
    rng = np.random.default_rng(11)
    img = rng.integers(0, 10000, (4, 21, 14)).astype(np.uint16)
    p = str(tmp_path / "c.tif")
    write_geotiff(p, img, epsg=32632, planar=planar, rows_per_strip=6,
                  predictor=predictor, compression=compression)
    got, meta = read_geotiff(p)
    np.testing.assert_array_equal(got, img.astype(np.float32))
    assert meta["epsg"] == 32632


def test_lzw_width_growth_and_table_reset(tmp_path):
    """A highly compressible large image drives the LZW code width through
    9→12 bits and across the 4094-entry table reset."""
    img = (np.arange(512 * 600, dtype=np.int64) % 97).astype(np.uint8)
    img = img.reshape(1, 512, 600)
    p = str(tmp_path / "big.tif")
    write_geotiff(p, img, compression="lzw")
    got, _ = read_geotiff(p)
    np.testing.assert_array_equal(got, img.astype(np.float32))


@pytest.mark.parametrize("compression", ["tiff_lzw", "packbits"])
def test_lzw_cross_check_against_pillow(tmp_path, compression):
    """Both directions against an independent TIFF codec (Pillow): our
    writer's streams decode in PIL, and PIL-encoded streams decode here."""
    PIL = pytest.importorskip("PIL.Image")
    rng = np.random.default_rng(12)
    a = rng.integers(0, 255, (40, 50)).astype(np.uint8)

    ours = str(tmp_path / "ours.tif")
    write_geotiff(ours, a[None],
                  compression={"tiff_lzw": "lzw", "packbits": "packbits"}[compression])
    np.testing.assert_array_equal(np.asarray(PIL.open(ours)), a)

    theirs = str(tmp_path / "theirs.tif")
    PIL.fromarray(a).save(theirs, compression=compression)
    got, _ = read_geotiff(theirs)
    np.testing.assert_array_equal(got[0], a.astype(np.float32))


@pytest.mark.parametrize("channels,planar", [(3, False), (1, False), (4, True)])
def test_jpeg_in_tiff_roundtrip(tmp_path, channels, planar):
    """New-style JPEG-in-TIFF (compression=7) writes and reads without
    rasterio.  Lossy: bound the error instead of asserting equality.
    Reference analogue: rasterio's free JPEG support at
    /root/reference/data/SR_dataset_RGB.py:29."""
    rng = np.random.default_rng(13)
    # smooth-ish data so JPEG error stays small and the bound is meaningful
    base = rng.random((channels, 1, 1)) * 128 + 64
    img = (base + rng.random((channels, 40, 56)) * 24).astype(np.uint8)
    p = str(tmp_path / "j.tif")
    write_geotiff(p, img, epsg=32632, planar=planar, rows_per_strip=16,
                  compression="jpeg", jpeg_quality=95)
    got, meta = read_geotiff(p)
    assert got.shape == img.shape
    assert meta["epsg"] == 32632
    err = np.abs(got - img.astype(np.float32))
    assert err.max() < 40 and err.mean() < 4, (err.max(), err.mean())
    # dn_scale applies to the uint8 samples like any integer raster
    got2, _ = read_geotiff(p, dn_scale=255.0)
    np.testing.assert_allclose(got2, got / 255.0, rtol=1e-6)


def test_jpeg_in_tiff_rejects_bad_combinations(tmp_path):
    rng = np.random.default_rng(14)
    img16 = rng.integers(0, 10000, (3, 8, 8)).astype(np.uint16)
    with pytest.raises(ValueError, match="uint8"):
        write_geotiff(str(tmp_path / "a.tif"), img16, compression="jpeg")
    img8 = (rng.random((3, 8, 8)) * 255).astype(np.uint8)
    with pytest.raises(ValueError, match="predictor"):
        write_geotiff(str(tmp_path / "b.tif"), img8, compression="jpeg",
                      predictor=True)
    with pytest.raises(ValueError, match="1 or 3"):
        write_geotiff(str(tmp_path / "c.tif"),
                      (rng.random((4, 8, 8)) * 255).astype(np.uint8),
                      compression="jpeg")  # 4-band chunky: use planar


def test_jpeg_in_tiff_cross_check_against_pillow(tmp_path):
    """Both directions against Pillow's libtiff-backed JPEG-in-TIFF codec.
    PIL→ours exercises the JPEGTables (tag 347) splicing and the
    RGB-coded-stream case (libtiff writes photometric=2 with component ids
    'R','G','B'); ours→PIL checks the photometric-6 + 4:4:4 tags we emit."""
    PIL = pytest.importorskip("PIL.Image")
    from PIL import features
    if not features.check("libtiff"):
        pytest.skip("Pillow built without libtiff")
    rng = np.random.default_rng(15)
    a = (rng.random((40, 56, 3)) * 200 + 20).astype(np.uint8)

    theirs = str(tmp_path / "theirs.tif")
    PIL.fromarray(a).save(theirs, compression="jpeg", quality=95)
    ours_read, _ = read_geotiff(theirs)
    pil_read = np.asarray(PIL.open(theirs).convert("RGB"))
    # same decode path family (libjpeg) → bit-identical
    np.testing.assert_array_equal(
        ours_read, pil_read.transpose(2, 0, 1).astype(np.float32))

    ours = str(tmp_path / "ours.tif")
    write_geotiff(ours, a.transpose(2, 0, 1), compression="jpeg",
                  jpeg_quality=95)
    back = np.asarray(PIL.open(ours).convert("RGB"))
    err = np.abs(back.astype(np.float32) - a.astype(np.float32))
    assert err.max() < 40 and err.mean() < 4, (err.max(), err.mean())


def test_zstd_unknown_content_size_falls_back():
    """Streaming ZSTD frames omit the content size; the decoder must fall
    back to the segment's expected byte count instead of failing."""
    import ctypes

    from nirgan_tpu.data.geotiff import (_ZSTD_CONTENTSIZE_UNKNOWN, _zstd,
                                         _zstd_decode, _zstd_encode)

    payload = bytes(range(256)) * 8
    frame = _zstd_encode(payload)
    assert _zstd_decode(frame, len(payload)) == payload
    # corrupt stream raises instead of returning garbage
    with pytest.raises(ValueError):
        _zstd_decode(b"\x00\x01\x02\x03nonsense", 64)

    # build a frame through the streaming API (no pledged size → the frame
    # header records no content size)
    class _Buf(ctypes.Structure):
        _fields_ = [("p", ctypes.c_void_p), ("size", ctypes.c_size_t),
                    ("pos", ctypes.c_size_t)]

    lib = _zstd()
    lib.ZSTD_createCCtx.restype = ctypes.c_void_p
    lib.ZSTD_freeCCtx.argtypes = [ctypes.c_void_p]
    lib.ZSTD_compressStream2.restype = ctypes.c_size_t
    lib.ZSTD_compressStream2.argtypes = [ctypes.c_void_p,
                                         ctypes.POINTER(_Buf),
                                         ctypes.POINTER(_Buf), ctypes.c_int]
    cctx = lib.ZSTD_createCCtx()
    src = ctypes.create_string_buffer(payload, len(payload))
    dst = ctypes.create_string_buffer(len(payload) + 1024)
    outb = _Buf(ctypes.cast(dst, ctypes.c_void_p), len(dst), 0)
    # feed in two chunks (continue, then end) — a one-shot e_end still
    # records the content size in the frame header; split input cannot
    half = len(payload) // 2
    inb = _Buf(ctypes.cast(src, ctypes.c_void_p), half, 0)
    rc = lib.ZSTD_compressStream2(cctx, ctypes.byref(outb),
                                  ctypes.byref(inb), 0)  # ZSTD_e_continue
    assert not lib.ZSTD_isError(rc) and inb.pos == half
    inb = _Buf(ctypes.c_void_p(ctypes.addressof(src) + half),
               len(payload) - half, 0)
    rc = lib.ZSTD_compressStream2(cctx, ctypes.byref(outb),
                                  ctypes.byref(inb), 2)  # ZSTD_e_end
    lib.ZSTD_freeCCtx(cctx)
    assert rc == 0 and inb.pos == len(payload) - half
    stream_frame = dst.raw[:outb.pos]
    assert (lib.ZSTD_getFrameContentSize(stream_frame, len(stream_frame))
            == _ZSTD_CONTENTSIZE_UNKNOWN)
    assert _zstd_decode(stream_frame, len(payload)) == payload


@pytest.mark.parametrize("compression,predictor,planar", [
    ("none", False, False), ("deflate", True, False), ("zstd", True, True),
])
def test_bigtiff_roundtrip(tmp_path, compression, predictor, planar):
    """BigTIFF (magic 43, u64 offsets, 20-byte IFD entries, LONG8 strip
    offsets/counts) — what >4 GB satellite mosaics ship as.  Full reader,
    header-only metadata reader, and compression/predictor all compose."""
    from nirgan_tpu.data.geotiff import read_geotiff_meta

    rng = np.random.default_rng(16)
    img = rng.integers(0, 10000, (4, 33, 29)).astype(np.uint16)
    p = str(tmp_path / "bt.tif")
    write_geotiff(p, img, epsg=32632, origin=(699960.0, 5900040.0),
                  bigtiff=True, compression=compression, predictor=predictor,
                  planar=planar, rows_per_strip=9)
    with open(p, "rb") as f:
        assert f.read(4) == b"II+\x00"  # magic 43
    got, meta = read_geotiff(p)
    np.testing.assert_array_equal(got, img.astype(np.float32))
    assert meta["epsg"] == 32632
    assert meta["tiepoint"][3:5] == (699960.0, 5900040.0)
    m2 = read_geotiff_meta(p)
    assert m2["epsg"] == 32632 and (m2["width"], m2["height"]) == (29, 33)


def test_bigtiff_cross_check_against_pillow(tmp_path):
    """PIL-written BigTIFFs decode here; our BigTIFFs decode in PIL."""
    PIL = pytest.importorskip("PIL.Image")
    rng = np.random.default_rng(17)
    a = (rng.random((40, 56, 3)) * 255).astype(np.uint8)

    theirs = str(tmp_path / "theirs.tif")
    try:
        PIL.fromarray(a).save(theirs, big_tiff=True)
    except TypeError:
        pytest.skip("Pillow without BigTIFF write support")
    ours_read, _ = read_geotiff(theirs)
    np.testing.assert_array_equal(ours_read,
                                  a.transpose(2, 0, 1).astype(np.float32))

    # ours→PIL: single band (PIL has no mode for 3-sample BlackIsZero)
    ours = str(tmp_path / "ours.tif")
    write_geotiff(ours, a[None, :, :, 0], bigtiff=True, compression="deflate")
    np.testing.assert_array_equal(np.asarray(PIL.open(ours)), a[:, :, 0])


def test_srpaired_geotiff_dn_scaling(tmp_path):
    """SRPairedDataset must scale uint16-DN GeoTIFFs to reflectance
    (read_geotiff returns float32, so the caller has to pass dn_scale)."""
    from nirgan_tpu.data.datasets import SRPairedDataset
    from nirgan_tpu.data.geotiff import write_geotiff

    (tmp_path / "LR").mkdir()
    (tmp_path / "HR").mkdir()
    rng = np.random.default_rng(5)
    lr = rng.integers(0, 10000, (4, 8, 8)).astype(np.uint16)
    hr = rng.integers(0, 10000, (3, 16, 16)).astype(np.uint16)
    write_geotiff(str(tmp_path / "LR" / "a.tif"), lr)
    write_geotiff(str(tmp_path / "HR" / "a.tif"), hr)

    item = SRPairedDataset(str(tmp_path))[0]
    np.testing.assert_allclose(item["lr"], lr[:3].astype(np.float32) / 10000.0)
    np.testing.assert_allclose(item["hr"], hr.astype(np.float32) / 10000.0)
    np.testing.assert_allclose(item["s2_nir"], lr[3:4].astype(np.float32) / 10000.0)


def test_geokey_directory_count_matches_entries(tmp_path):
    """The GeoKeyDirectory header's NumberOfKeys must equal the key entries
    written (GDAL reads count*4 uint16s past a short directory)."""
    import struct

    from nirgan_tpu.data.geotiff import _GEO_KEY_DIRECTORY, write_geotiff

    path = str(tmp_path / "k.tif")
    write_geotiff(path, np.zeros((1, 4, 4), np.float32), epsg=32633)
    buf = open(path, "rb").read()
    # parse the IFD for the GeoKeyDirectory tag
    (off,) = struct.unpack("<I", buf[4:8])
    (n,) = struct.unpack("<H", buf[off:off + 2])
    for i in range(n):
        e = buf[off + 2 + 12 * i: off + 14 + 12 * i]
        tag, typ, count = struct.unpack("<HHI", e[:8])
        if tag == _GEO_KEY_DIRECTORY:
            (doff,) = struct.unpack("<I", e[8:12])
            gk = struct.unpack(f"<{count}H", buf[doff:doff + 2 * count])
            n_keys = gk[3]
            assert len(gk) == 4 + 4 * n_keys, (n_keys, len(gk))
            break
    else:
        raise AssertionError("GeoKeyDirectory tag missing")
