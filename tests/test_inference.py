"""Histogram matching + bulk synthesis pipeline tests."""

import os

import numpy as np

import jax.numpy as jnp

import jax
from nirgan_tpu.config import load_config
from nirgan_tpu.inference import histogram_match, synthesize_dataset
from nirgan_tpu.tasks import Px2PxTask


def test_histogram_match_transfers_distribution():
    rng = np.random.default_rng(0)
    src = rng.normal(0.3, 0.05, (2, 32, 32, 1)).astype(np.float32)
    ref = rng.normal(0.7, 0.15, (2, 32, 32, 1)).astype(np.float32)
    out = np.asarray(histogram_match(jnp.asarray(src), jnp.asarray(ref)))
    # exact distribution transfer: sorted output == sorted reference
    for b in range(2):
        np.testing.assert_allclose(np.sort(out[b].ravel()),
                                   np.sort(ref[b].ravel()), rtol=1e-6)
    # rank order preserved
    b0s, b0o = src[0].ravel(), out[0].ravel()
    i, j = np.argmax(b0s), np.argmin(b0s)
    assert b0o[i] == out[0].ravel().max() and b0o[j] == out[0].ravel().min()


def _skimage_match_cumulative_cdf(source, template):
    """Literal transcription of ``skimage.exposure._match_cumulative_cdf``
    (float path) — the exact function behind the reference's
    ``match_histograms(img_np, ref_np, channel_axis=None)`` call at
    ``create_synthetic_dataset.py:40-46``.  skimage itself is not in the
    image; the transcription is the oracle (the kornia-SSIM playbook)."""
    src_values, src_unique_indices, src_counts = np.unique(
        source.ravel(), return_inverse=True, return_counts=True)
    tmpl_values, tmpl_counts = np.unique(template.ravel(), return_counts=True)
    src_quantiles = np.cumsum(src_counts) / source.size
    tmpl_quantiles = np.cumsum(tmpl_counts) / template.size
    interp_a_values = np.interp(src_quantiles, tmpl_quantiles, tmpl_values)
    return interp_a_values[src_unique_indices].reshape(source.shape)


def test_histogram_match_exact_vs_skimage_oracle():
    """The device matcher reproduces skimage's quantile mapping to f32
    rounding — including its tie semantics (all equal source pixels share
    one output; tied template values collapse to one interp node), on
    continuous, DN-quantised (the production uint16/10000 data), coarsely
    quantised, and different-size inputs."""
    rng = np.random.default_rng(0)
    cases = []
    for q in (None, 1e-4, 1 / 255):
        src = rng.uniform(0, 1, (1, 64, 64, 1)).astype(np.float32)
        ref = rng.beta(2, 5, (1, 64, 64, 1)).astype(np.float32)
        if q is not None:
            src = (np.round(src / q) * q).astype(np.float32)
            ref = (np.round(ref / q) * q).astype(np.float32)
        cases.append((src, ref))
    cases.append((rng.uniform(0, 1, (1, 64, 64, 1)).astype(np.float32),
                  rng.uniform(0, 1, (1, 32, 32, 1)).astype(np.float32)))
    for src, ref in cases:
        ours = np.asarray(histogram_match(jnp.asarray(src), jnp.asarray(ref)))
        oracle = _skimage_match_cumulative_cdf(src[0, ..., 0], ref[0, ..., 0])
        np.testing.assert_allclose(ours[0, ..., 0], oracle, rtol=0, atol=1e-6)


def test_histogram_match_different_sizes():
    rng = np.random.default_rng(1)
    src = rng.random((1, 40, 40, 1)).astype(np.float32)
    ref = rng.random((1, 10, 10, 1)).astype(np.float32)  # fewer pixels
    out = np.asarray(histogram_match(jnp.asarray(src), jnp.asarray(ref)))
    assert out.shape == src.shape
    assert abs(out.mean() - ref.mean()) < 0.02


class _TinySRDataset:
    """In-memory SRPairedDataset stand-in (contract of data/SR_dataset_RGB.py)."""

    def __init__(self, n=5, hr=64, lr=16):
        self.n, self.hr, self.lr = n, hr, lr

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        rng = np.random.default_rng(i)
        return {
            "lr": rng.random((3, self.lr, self.lr), dtype=np.float32),
            "hr": rng.random((3, self.hr, self.hr), dtype=np.float32),
            "s2_nir": rng.random((1, self.lr, self.lr), dtype=np.float32),
            "coords": np.zeros(2, np.float32),
            "id": f"tile_{i:03d}",
        }


def test_synthesize_dataset_end_to_end(tmp_path):
    cfg = load_config("configs/config_px2px.yaml")
    cfg.base_configs.ngf = 8
    cfg.base_configs.ndf = 8
    cfg.Data.padding_amount = 2
    cfg.tpu.compute_dtype = "float32"
    cfg.tpu.shape_buckets = [64]
    task = Px2PxTask(cfg)
    task.bind(task.init_state(seed=0, image_size=64))

    ds = _TinySRDataset()
    out = str(tmp_path / "synth")
    n = synthesize_dataset(task, ds, out, batch_size=2,
                           plot_dir=str(tmp_path / "plots"), plot_every=2)
    assert n == 5
    files = sorted(os.listdir(out))
    assert len(files) == 5 and files[0] == "tile_000.npz"
    z = np.load(os.path.join(out, files[0]))
    assert z["nir"].dtype == np.float16 and z["nir"].shape == (1, 64, 64)
    assert os.path.exists(tmp_path / "plots" / "example_0.png")


def test_synthesize_dataset_sharded_matches_single_device(tmp_path):
    """Mesh-sharded bulk serving (incl. a ragged tail batch padded to the
    mesh and trimmed) writes the same tiles as single-device."""
    from nirgan_tpu.parallel import create_mesh

    cfg = load_config("configs/config_px2px.yaml")
    cfg.base_configs.ngf = 8
    cfg.base_configs.ndf = 8
    cfg.Data.padding_amount = 2
    cfg.tpu.compute_dtype = "float32"
    cfg.tpu.shape_buckets = [64]
    task = Px2PxTask(cfg)
    task.bind(task.init_state(seed=0, image_size=64))
    ds = _TinySRDataset()  # 5 items, batch 4 → ragged tail of 1

    out1 = str(tmp_path / "single")
    n1 = synthesize_dataset(task, ds, out1, batch_size=4, plot_dir=None)
    out2 = str(tmp_path / "mesh")
    n2 = synthesize_dataset(task, ds, out2, batch_size=4, plot_dir=None,
                            mesh=create_mesh(("data",)))
    assert n1 == n2 == 5
    for f in sorted(os.listdir(out1)):
        a = np.load(os.path.join(out1, f))["nir"]
        b = np.load(os.path.join(out2, f))["nir"]
        np.testing.assert_allclose(a, b, rtol=2e-3, atol=2e-3)  # fp16 tiles


def test_export_generator_roundtrip(tmp_path):
    """jax.export serving artifact: serialize → (bytes on disk) →
    deserialize → run equals the live predict path, for both the plain and
    SatCLIP-inject models."""
    from nirgan_tpu.inference.export import export_generator, run_exported

    rng = np.random.default_rng(0)
    rgb = rng.random((2, 3, 32, 32)).astype(np.float32)

    # plain model
    cfg = load_config("configs/config_px2px.yaml")
    cfg.base_configs.ngf = 8
    cfg.base_configs.ndf = 8
    cfg.Data.padding_amount = 2
    cfg.tpu.compute_dtype = "float32"
    task = Px2PxTask(cfg)
    state = task.init_state(seed=0, image_size=32)
    params = jax.device_get(state.params_g)

    blob = export_generator(task, params, image_size=32, batch_size=2)
    path = tmp_path / "gen.stablehlo"
    path.write_bytes(blob)
    out = np.asarray(run_exported(path.read_bytes(), params, rgb))

    import jax.numpy as jnp2
    x = jnp2.transpose(jnp2.asarray(rgb), (0, 2, 3, 1))
    want = np.transpose(np.asarray(task.g_apply(state.params_g, x, train=False)),
                        (0, 3, 1, 2))
    assert out.shape == (2, 1, 32, 32)
    np.testing.assert_allclose(out, want, rtol=2e-5, atol=2e-5)

    # inject model (embeds argument live)
    cfg2 = load_config("configs/config_px2px_SatCLIP.yaml")
    cfg2.base_configs.ngf = 8
    cfg2.base_configs.ndf = 8
    cfg2.Data.padding_amount = 2
    cfg2.tpu.compute_dtype = "float32"
    task2 = Px2PxTask(cfg2)
    state2 = task2.init_state(seed=0, image_size=32)
    params2 = jax.device_get(state2.params_g)
    embeds = rng.standard_normal((2, 256)).astype(np.float32)
    blob2 = export_generator(task2, params2, image_size=32, batch_size=2)
    out2 = np.asarray(run_exported(blob2, params2, rgb, embeds))
    x2 = jnp2.transpose(jnp2.asarray(rgb), (0, 2, 3, 1))
    want2 = np.transpose(np.asarray(
        task2.g_apply(state2.params_g, x2, jnp2.asarray(embeds), train=False)),
        (0, 3, 1, 2))
    np.testing.assert_allclose(out2, want2, rtol=2e-5, atol=2e-5)
