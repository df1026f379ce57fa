"""Whole-scene sliding-window synthesis (nirgan_tpu/inference/scene.py).

The reference has no scene-level API (``create_synthetic_dataset.py`` loops
pre-tiled datasets); these tests pin the tiling/blending machinery exactly
(identity-generator equality), the per-window SatCLIP coordinate path, mesh
sharding, and the GeoTIFF-in → GeoTIFF-out CLI."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from nirgan_tpu.config import load_config
from nirgan_tpu.inference.scene import (plateau_weight, synthesize_scene,
                                        tile_origins)
from nirgan_tpu.tasks import Px2PxTask


def _task(satclip=False, ngf=8):
    cfg = load_config("configs/config_px2px_SatCLIP.yaml" if satclip
                      else "configs/config_px2px.yaml")
    cfg.base_configs.ngf = ngf
    cfg.base_configs.ndf = 8
    cfg.Data.padding_amount = 2
    cfg.tpu.compute_dtype = "float32"
    task = Px2PxTask(cfg)
    task.bind(task.init_state(seed=0, image_size=32))
    return task


def _identity(task):
    """Replace the generator with a per-pixel, shift-invariant map: tiled +
    blended output must then equal the map of the whole scene exactly."""
    task.g_apply = lambda params, x, embeds=None, **kw: (
        x.mean(axis=-1, keepdims=True) * 0.5 - 0.1)
    return task


# ------------------------------------------------------------ pure tiling

@pytest.mark.parametrize("length,tile,overlap", [
    (512, 128, 16), (1000, 256, 32), (128, 128, 16), (130, 128, 8),
])
def test_plateau_coverage(length, tile, overlap):
    """Every padded-interior pixel lies in ≥1 window plateau: accumulated
    weight ≥ 1 over the original region after padding by `overlap`."""
    stride = tile - 2 * overlap
    padded = length + 2 * overlap
    origins = tile_origins(padded, tile, stride)
    w = plateau_weight(tile, overlap)
    den = np.zeros(padded, np.float64)
    for o in origins:
        den[o:o + tile] += w
    interior = den[overlap:overlap + length]
    assert interior.min() >= 1.0 - 1e-6
    assert (den > 0).all()
    # windows stay in range and flush to the end
    assert origins[0] == 0 and origins[-1] == padded - tile
    assert all(0 <= o <= padded - tile for o in origins)


def test_plateau_weight_shape():
    w = plateau_weight(64, 16)
    assert w.shape == (64,) and (w > 0).all() and w.max() == 1.0
    assert np.allclose(w, w[::-1])  # symmetric
    assert (plateau_weight(64, 0) == 1).all()


# ------------------------------------------------------- blending equality

def test_scene_identity_blend_exact():
    """With a per-pixel generator, seams must vanish identically: tiled +
    plateau-blended output == the map applied to the whole scene."""
    task = _identity(_task())
    rng = np.random.default_rng(0)
    scene = rng.integers(0, 10000, size=(3, 96, 130)).astype(np.uint16)
    out = synthesize_scene(task, scene, tile=64, overlap=16, batch_size=4)
    expect = (scene.astype(np.float32) / 10000.0).mean(0) * 0.5 - 0.1
    assert out.shape == (1, 96, 130)
    np.testing.assert_allclose(out[0], expect, atol=2e-6)


def test_scene_smaller_than_tile():
    task = _identity(_task())
    scene = np.random.default_rng(1).random((3, 40, 56)).astype(np.float32)
    out = synthesize_scene(task, scene, tile=64, overlap=8, batch_size=2)
    expect = scene.mean(0) * 0.5 - 0.1
    assert out.shape == (1, 40, 56)
    np.testing.assert_allclose(out[0], expect, atol=2e-6)


def test_scene_mesh_matches_single():
    from nirgan_tpu.parallel import create_mesh

    task = _identity(_task())
    scene = np.random.default_rng(2).random((3, 96, 96)).astype(np.float32)
    ref = synthesize_scene(task, scene, tile=64, overlap=16, batch_size=4)
    mesh = create_mesh(("data",))
    out = synthesize_scene(task, scene, tile=64, overlap=16, batch_size=4,
                           mesh=mesh)
    np.testing.assert_allclose(out, ref, atol=1e-6)


def test_scene_blend_attenuates_window_disagreement():
    """The production seam mechanism is per-window normalisation (instance
    norm): windows see different statistics and disagree at their borders.
    Model it exactly — a stub generator that standardises per window — on a
    curved surface (so per-window std genuinely differs), and require the
    blended output's jump at window edges to be far below the naive seam
    step.  Pins the claim measured in benchmarks/scene_seam_ab.py."""
    task = _task()

    def per_window_standardise(params, x, embeds=None, **kw):
        m = x.mean(axis=-1, keepdims=True)
        mu = m.mean(axis=(1, 2), keepdims=True)
        sd = m.std(axis=(1, 2), keepdims=True) + 1e-6
        return (m - mu) / sd

    task.g_apply = per_window_standardise
    yy, xx = np.meshgrid(np.linspace(0, 1, 128), np.linspace(0, 1, 128),
                         indexing="ij")
    scene = np.broadcast_to(((yy + xx) / 2) ** 2, (3, 128, 128)).astype(
        np.float32).copy()

    naive = synthesize_scene(task, scene, tile=64, overlap=0, batch_size=4)[0]
    blend = synthesize_scene(task, scene, tile=64, overlap=16, batch_size=4)[0]

    def jump(img, cols):
        gx = np.abs(np.diff(img, axis=1))
        gy = np.abs(np.diff(img, axis=0))
        return max(float(gx[:, c].mean()) for c in cols) if cols else 0.0, \
            max(float(gy[c, :].mean()) for c in cols) if cols else 0.0

    n_jump = max(jump(naive, [63]))          # the single abutment line
    # blended window entry/exit edges: origins k·32 span original
    # [k·32−16, k·32−16+64) → edges at 32k±16 within (0, 128)
    edges = [e - 1 for e in (16, 48, 80, 112) if 0 < e < 128]
    b_jump = max(jump(blend, edges))
    assert n_jump > 5e-3, n_jump              # the stub does produce seams
    assert b_jump < 0.2 * n_jump, (n_jump, b_jump)


def test_scene_rejects_bad_args():
    task = _task()
    scene = np.zeros((3, 64, 64), np.float32)
    with pytest.raises(ValueError):
        synthesize_scene(task, scene, tile=64, overlap=32)
    with pytest.raises(ValueError):
        synthesize_scene(task, np.zeros((4, 8, 8), np.float32))


def test_scene_unet_family():
    """The scene API spans model families: a UNet generator (fixed-depth
    bottleneck — windows must be exactly tile², which the sliding-window
    cutter guarantees) synthesizes a non-multiple-size scene seamlessly."""
    cfg = load_config("configs/config_px2px.yaml")
    cfg.base_configs.netG = "unet_128"
    cfg.base_configs.ngf = 8
    cfg.base_configs.ndf = 8
    # UNet bottlenecks need power-of-two inputs: reflect-pad would break the
    # reference's torch UNet identically (model/pix2pix.py:91-108), so UNet
    # serving runs unpadded
    cfg.Data.padding = False
    cfg.tpu.compute_dtype = "float32"
    task = Px2PxTask(cfg)
    task.bind(task.init_state(seed=0, image_size=128))
    scene = np.random.default_rng(10).integers(
        0, 10000, size=(3, 150, 170)).astype(np.uint16)
    out = synthesize_scene(task, scene, tile=128, overlap=16, batch_size=2)
    assert out.shape == (1, 150, 170) and np.isfinite(out).all()

    # pad-incompatible UNet serving is rejected with guidance, not a cryptic
    # XLA concat error (a padded-config UNet task cannot even init — same as
    # the torch reference — so flip the serving pad on a built task)
    task.use_padding, task.pad_amount = True, 10
    with pytest.raises(ValueError, match="unet_128"):
        synthesize_scene(task, scene, tile=128, overlap=16, batch_size=2)
    with pytest.raises(ValueError, match="power-of-two"):
        task.use_padding, task.pad_amount = False, 0
        synthesize_scene(task, scene, tile=96, overlap=16, batch_size=2)


# --------------------------------------------- multi-host scene banding

def test_scene_banded_matches_full():
    """process_index/process_count banding (halo recompute, zero
    communication): the disjoint bands tile [0, H) and stitch bit-close to
    the single-process scene — the multi-host contract of the CLI."""
    task = _task()
    rng = np.random.default_rng(7)
    scene = rng.integers(0, 10000, size=(3, 150, 96)).astype(np.uint16)
    full = synthesize_scene(task, scene, tile=64, overlap=16, batch_size=4)

    for nproc in (2, 3):
        got = np.full((150, 96), np.nan, np.float32)
        covered = np.zeros(150, bool)
        for p in range(nproc):
            band, off = synthesize_scene(task, scene, tile=64, overlap=16,
                                         batch_size=4, process_index=p,
                                         process_count=nproc)
            rows = band.shape[1]
            assert not covered[off:off + rows].any()   # disjoint
            covered[off:off + rows] = True
            got[off:off + rows] = band[0]
        assert covered.all()                            # tiles [0, H)
        np.testing.assert_allclose(got, full[0], atol=1e-5)


def test_scene_banded_empty_band():
    """Absurd process counts: bands entirely inside the padding margin
    return an empty (1, 0, W) band instead of dividing by zero."""
    task = _identity(_task())
    scene = np.random.default_rng(8).random((3, 40, 48)).astype(np.float32)
    bands = [synthesize_scene(task, scene, tile=64, overlap=16, batch_size=2,
                              process_index=p, process_count=8)
             for p in range(8)]
    got = np.full((40, 48), np.nan, np.float32)
    for band, off in bands:
        got[off:off + band.shape[1]] = band[0]
    expect = scene.mean(0) * 0.5 - 0.1
    np.testing.assert_allclose(got, expect, atol=2e-6)
    assert any(b.shape[1] == 0 for b, _ in bands)       # exercised


def test_scene_banded_int8_shared_calibration():
    """Banded int8 synthesis calibrates every process on the GLOBAL first
    window batch: fresh tasks per band derive the same quantised trunk and
    the stitched scene equals the single-process int8 run exactly."""
    def fresh():
        cfg = load_config("configs/config_px2px.yaml")
        cfg.base_configs.ngf = 8
        cfg.base_configs.ndf = 8
        cfg.Data.padding_amount = 2
        cfg.tpu.compute_dtype = "float32"
        cfg.tpu.serving_quant = "int8"
        t = Px2PxTask(cfg)
        t.bind(t.init_state(seed=0, image_size=32))
        return t

    scene = np.random.default_rng(9).integers(
        0, 10000, size=(3, 128, 64)).astype(np.uint16)
    full = synthesize_scene(fresh(), scene, tile=64, overlap=16, batch_size=4)
    got = np.full((128, 64), np.nan, np.float32)
    for p in range(2):
        band, off = synthesize_scene(fresh(), scene, tile=64, overlap=16,
                                     batch_size=4, process_index=p,
                                     process_count=2)
        got[off:off + band.shape[1]] = band[0]
    np.testing.assert_allclose(got, full[0], atol=1e-6)


# --------------------------------------------------------- SatCLIP routes

def _meta(h, w, epsg=4326, scale=0.001):
    return {"width": w, "height": h, "pixel_scale": (scale, scale),
            "tiepoint": (0.0, 0.0, 0.0, 10.0, 50.0, 0.0), "epsg": epsg}


def test_scene_satclip_per_window_coords():
    """Each window is conditioned on its own centroid, not the scene's."""
    task = _task(satclip=True)
    seen = []
    real_predict = task.satclip_model.predict

    def spy(coords):
        seen.append(np.asarray(coords))
        return real_predict(coords)

    task.satclip_model.predict = spy
    scene = np.random.default_rng(3).integers(
        0, 10000, size=(3, 96, 96)).astype(np.uint16)
    out = synthesize_scene(task, scene, tile=64, overlap=16, batch_size=16,
                           meta=_meta(96, 96))
    assert out.shape == (1, 96, 96) and np.isfinite(out).all()
    coords = np.concatenate(seen)      # (n_windows, 2) lon/lat
    assert len(np.unique(coords, axis=0)) > 1   # per-window, not per-scene
    # all centroids inside the scene's geographic footprint
    assert (coords[:, 0] >= 10.0).all() and (coords[:, 0] <= 10.0 + 0.096).all()
    assert (coords[:, 1] <= 50.0).all() and (coords[:, 1] >= 50.0 - 0.096).all()


def test_scene_satclip_requires_meta():
    task = _task(satclip=True)
    with pytest.raises(ValueError, match="coordinates"):
        synthesize_scene(task, np.zeros((3, 96, 96), np.float32),
                         tile=64, overlap=16)


def test_scene_int8_composes():
    """The scene path calibrates and serves the int8 trunk; output stays
    within the serving PSNR guard of the float path (ops/int8_trunk.py)."""
    cfg = load_config("configs/config_px2px.yaml")
    cfg.base_configs.ngf = 8
    cfg.base_configs.ndf = 8
    cfg.Data.padding_amount = 2
    cfg.tpu.compute_dtype = "float32"
    scene = np.random.default_rng(5).integers(
        0, 10000, size=(3, 96, 96)).astype(np.uint16)

    outs = {}
    for quant in ("none", "int8"):
        cfg.tpu.serving_quant = quant
        task = Px2PxTask(cfg)
        task.bind(task.init_state(seed=0, image_size=32))
        if quant == "int8":
            assert task.wants_int8_serving()
        outs[quant] = synthesize_scene(task, scene, tile=64, overlap=16,
                                       batch_size=4)
    a, b = outs["int8"], outs["none"]
    mse = float(np.mean((a - b) ** 2))
    psnr = 10 * np.log10(4.0 / max(mse, 1e-12))  # range 2 ([-1, 1] output)
    assert psnr > 36.0, psnr


# ----------------------------------------------------------------- CLI

def test_scene_cli_geotiff_roundtrip(tmp_path):
    from nirgan_tpu.config import save_config
    from nirgan_tpu.data.geotiff import read_geotiff, write_geotiff

    cfg = load_config("configs/config_px2px.yaml")
    cfg.base_configs.ngf = 8
    cfg.base_configs.ndf = 8
    cfg_path = tmp_path / "cfg.yaml"
    save_config(cfg, str(cfg_path))

    rng = np.random.default_rng(4)
    scene = rng.integers(0, 10000, size=(3, 80, 96)).astype(np.uint16)
    src = tmp_path / "rgb.tif"
    dst = tmp_path / "nir.tif"
    write_geotiff(str(src), scene, pixel_scale=(10.0, 10.0),
                  origin=(500000.0, 4649776.0), epsg=32633)

    import synthesize_scene as cli

    cli.main([str(src), str(dst), "--config", str(cfg_path),
              "--tile", "64", "--overlap", "8", "--batch-size", "4"])

    nir, meta = read_geotiff(str(dst))
    assert nir.shape == (1, 80, 96) and nir.dtype == np.float32
    assert np.isfinite(nir).all()
    # georeferencing carried over from the input grid
    assert meta["epsg"] == 32633
    assert tuple(meta["pixel_scale"][:2]) == (10.0, 10.0)
    assert meta["tiepoint"][3:5] == (500000.0, 4649776.0)
    # the CLI must feed DN-SCALED reflectance to the generator: output equals
    # the library path given the raw uint16 scene (scaled on device) — a
    # default float32 read would silently pass unscaled DN as reflectance
    task = Px2PxTask(load_config(str(cfg_path)))
    task.bind(task.init_state(seed=0, image_size=64))
    direct = synthesize_scene(task, scene, tile=64, overlap=8, batch_size=4)
    np.testing.assert_allclose(nir, direct, atol=1e-5)


def test_scene_cli_match_histogram(tmp_path):
    """--match-histogram REF.tif pulls the output's distribution onto the
    reference band's (the reference pipeline's skimage match, applied once
    scene-level); integer references are DN-scaled like inputs."""
    from nirgan_tpu.config import save_config
    from nirgan_tpu.data.geotiff import read_geotiff, write_geotiff

    cfg = load_config("configs/config_px2px.yaml")
    cfg.base_configs.ngf = 8
    cfg.base_configs.ndf = 8
    cfg_path = tmp_path / "cfg.yaml"
    save_config(cfg, str(cfg_path))

    rng = np.random.default_rng(6)
    scene = rng.integers(0, 10000, size=(3, 80, 96)).astype(np.uint16)
    # reference NIR: a shifted/squeezed DN distribution, different raster size
    ref = (2000 + rng.integers(0, 3000, size=(1, 50, 60))).astype(np.uint16)
    src, refp, dst = tmp_path / "rgb.tif", tmp_path / "ref.tif", tmp_path / "nir.tif"
    write_geotiff(str(src), scene, pixel_scale=(10.0, 10.0),
                  origin=(500000.0, 4649776.0), epsg=32633)
    write_geotiff(str(refp), ref, pixel_scale=(10.0, 10.0),
                  origin=(500000.0, 4649776.0), epsg=32633)

    import synthesize_scene as cli

    cli.main([str(src), str(dst), "--config", str(cfg_path),
              "--tile", "64", "--overlap", "8", "--batch-size", "4",
              "--match-histogram", str(refp)])

    nir, _ = read_geotiff(str(dst))
    want = ref.astype(np.float32).ravel() / 10000.0
    got = nir.ravel()
    for q in (0.05, 0.25, 0.5, 0.75, 0.95):
        assert abs(np.quantile(got, q) - np.quantile(want, q)) < 5e-3, q
    assert got.min() >= want.min() - 1e-6 and got.max() <= want.max() + 1e-6
