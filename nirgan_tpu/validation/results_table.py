"""Offline results-table driver (reference
``validation_utils/get_results_table.py``): load a config + checkpoint,
sweep a validation dataset into the per-sample metric GeoJSON, and emit the
radar comparison plots for SatCLIP vs no-SatCLIP runs.
"""

from __future__ import annotations

import datetime
import os

import numpy as np

__all__ = ["create_val_metrics", "run_comparison"]


def create_val_metrics(config_path: str, folder: str, dataset=None,
                       weights_path: str | None = None, max_samples=None,
                       quant: str | None = None):
    """One model sweep → CSV + context GeoJSON in ``folder``.

    ``quant`` overrides ``tpu.serving_quant`` — sweeping the same weights
    with ``none`` vs ``int8`` is the operator's offline quality check for
    enabling the quantised serving mode."""
    from nirgan_tpu.config import load_config
    from nirgan_tpu.data.select_dataset import dataset_selector
    from nirgan_tpu.tasks import Px2PxTask
    from nirgan_tpu.train.checkpoint import merge_params
    from nirgan_tpu.validation.spider import spider_validation_callback

    config = load_config(config_path)
    if quant is not None:
        # reference-schema configs have no tpu: section — create it
        config["tpu"] = config.get("tpu") or {}
        config.tpu.serving_quant = quant
    task = Px2PxTask(config)
    state = task.init_state(seed=0, image_size=64)
    params_g = state.params_g
    wp = weights_path or config.custom_configs.Model.get("weights_path")
    if wp and os.path.exists(wp):
        if wp.endswith((".ckpt", ".pt", ".pth")):
            loaded = task.load_torch_weights(wp)
        elif os.path.isdir(wp):
            # an orbax checkpoint: either .../best|last directly, or a run
            # dir (prefer best — PL's `ModelCheckpoint` validation protocol)
            import orbax.checkpoint as ocp

            p = wp.rstrip("/")
            if os.path.basename(p) not in ("best", "last"):
                for which in ("best", "last"):
                    if os.path.isdir(os.path.join(p, which)):
                        p = os.path.join(p, which)
                        break
            restored = ocp.StandardCheckpointer().restore(os.path.abspath(p))
            loaded = {"params_g": restored["params_g"]} if "params_g" in restored else None
        else:
            loaded = None
        if loaded and "params_g" in loaded:
            params_g = merge_params(params_g, loaded["params_g"])
            print("Loaded (only) Weights from:", wp)
    task.bind(params_g)

    if dataset is None:
        dataset = dataset_selector(config).val_ds
    return spider_validation_callback(task, dataset, satclip=task.satclip,
                                      folder=folder, epoch_no=0,
                                      max_samples=max_samples)


def filter_for_countries(df, world_path: str):
    """Inner spatial filter: keep only samples whose (x, y) falls inside a
    polygon of the countries layer (reference ``get_results_table.py:149-152``
    drops ocean/Antarctica points before the radar plots).  Uses geopandas
    when installed, else the built-in point-in-polygon join for GeoJSON."""
    try:
        import geopandas as gpd

        gdf = gpd.GeoDataFrame(df, geometry=gpd.points_from_xy(df.x, df.y),
                               crs="EPSG:4326")
        world = gpd.read_file(world_path)
        import pandas as pd

        return pd.DataFrame(gpd.sjoin(gdf, world, how="inner"))
    except ImportError:
        import json

        from nirgan_tpu.validation.geo_ablation import _geom_contains

        with open(world_path) as f:
            feats = json.load(f).get("features", [])
        keep = [
            any(_geom_contains(ft["geometry"], float(x), float(y)) for ft in feats)
            for x, y in zip(df.x, df.y)
        ]
        return df[np.asarray(keep)].reset_index(drop=True)


def run_comparison(satclip_config: str, plain_config: str, dataset=None,
                   out_root: str = "validation_metrics", max_samples=None,
                   satclip_weights: str | None = None,
                   plain_weights: str | None = None):
    """Both sweeps + the three radar comparisons (Continent / Köppen /
    economy), mirroring the reference's main flow (``:155-183``).
    ``*_weights`` may each be a torch .ckpt/.pt or an orbax run dir."""
    from nirgan_tpu.validation.spiders import plot_radar_comparison, read_metric_geojson

    folder = os.path.join(out_root,
                          datetime.datetime.now().strftime("%d_%m_%Y_%H_%M_%S"))
    os.makedirs(folder, exist_ok=True)
    create_val_metrics(plain_config, folder, dataset=dataset,
                       weights_path=plain_weights, max_samples=max_samples)
    nosc = os.path.join(folder, "validation_metrics_ablation_satclip_False_e0.geojson")
    create_val_metrics(satclip_config, folder, dataset=dataset,
                       weights_path=satclip_weights, max_samples=max_samples)
    sc = os.path.join(folder, "validation_metrics_ablation_satclip_True_e0.geojson")

    gdf_sc, gdf_nosc = read_metric_geojson(sc), read_metric_geojson(nosc)
    outs = []
    for dt in ("Continent", "Koppen_Class", "economy"):
        try:
            outs.append(plot_radar_comparison(gdf_sc, gdf_nosc, dt, folder=folder))
        except Exception as e:
            print(f"radar {dt} skipped:", e)
    return folder, outs
