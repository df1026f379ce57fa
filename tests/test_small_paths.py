"""Coverage for smaller paths: per-epoch radar folder driver, loader
tail-batch handling, config merge/save round-trip, runtime setup."""

import json
import os

import numpy as np

from nirgan_tpu.config import ConfigNode, load_config, merge, save_config
from nirgan_tpu.data.datasets import FakeDataset
from nirgan_tpu.data.pipeline import Loader
from nirgan_tpu.validation.geo_ablation import points_to_geojson
from nirgan_tpu.validation.spiders import plot_epoch_folder
import pandas as pd


def test_plot_epoch_folder(tmp_path):
    df = pd.DataFrame({
        "x": np.linspace(-10, 10, 12), "y": np.linspace(40, 50, 12),
        "psnr": np.random.default_rng(0).uniform(20, 30, 12),
        "ssim": np.random.default_rng(1).uniform(0.5, 0.9, 12),
        "Continent": ["Europe", "Africa", "Asia"] * 4,
        "Koppen_Class": ["C", "B", "A"] * 4,
        "economy": ["Developing", "Developed: G7"] * 6,
    })
    base = tmp_path / "base.geojson"
    points_to_geojson(df, str(base))
    run = tmp_path / "run"
    run.mkdir()
    points_to_geojson(df, str(run / "validation_metrics_ablation_satclip_True_e7.geojson"))
    outs = plot_epoch_folder(str(run), str(base), str(tmp_path / "plots"))
    assert len(outs) == 3 and all(os.path.exists(o) for o in outs)
    assert any("E007" in o for o in outs)


def test_loader_keeps_tail_batch():
    ds = FakeDataset(image_size=8, length=10)
    batches = list(Loader(ds, 4, drop_last=False))
    assert [b["rgb"].shape[0] for b in batches] == [4, 4, 2]


def test_config_merge_and_save_roundtrip(tmp_path):
    cfg = load_config("configs/config_px2px.yaml")
    cfg2 = merge(cfg, {"base_configs": {"ngf": 16}, "new_section": {"a": 1}})
    assert cfg2.base_configs.ngf == 16
    assert cfg2.base_configs.ndf == 64          # untouched survives merge
    assert cfg2.new_section.a == 1
    assert cfg.base_configs.ngf == 64           # original unmodified
    p = tmp_path / "cfg.yaml"
    save_config(cfg2, str(p))
    again = load_config(str(p))
    assert again.base_configs.ngf == 16
    assert "satclip" in again


def test_runtime_setup_idempotent(tmp_path):
    from nirgan_tpu.runtime import setup_runtime

    setup_runtime(cache_dir=str(tmp_path / "cache"))
    setup_runtime(cache_dir=str(tmp_path / "cache"))  # second call harmless
    assert (tmp_path / "cache").is_dir()
