"""Geographic context joins for per-sample validation metrics
(reference ``validation_utils/geo_ablation.py``): attach country / continent
/ economy (vector join) and Köppen climate class (raster point query) to a
metric table, then clean the economy labels.

Dependency gating: geopandas / rasterstats are not in this image.  The
pure-pandas parts (``clean_economy``) always run; the spatial joins run only
when the libraries *and* the ancillary layers (countries shapefile, Köppen
raster + legend) are available — otherwise the columns are filled with
"Unknown" so downstream radar plots still work.
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np
import pandas as pd

__all__ = ["append_info_to_df", "clean_economy", "points_to_geojson"]

ECONOMY_CLASSES = {
    1: "Developed: G7",
    2: "Developed: Non G7",
    3: "Emerging: BRIC",
    4: "Emerging: MIKT",
    5: "Emerging: G20",
    6: "Developing",
    7: "Least Developed",
}


def clean_economy(df: pd.DataFrame) -> pd.DataFrame:
    """Map Natural-Earth 'ECONOMY' strings ("1. Developed region: G7", …) to
    the seven display classes (reference ``geo_ablation.py:76-103``)."""
    out = []
    for v in df.get("ECONOMY", pd.Series([None] * len(df))):
        num = int(v[0]) if isinstance(v, str) and v[:1].isdigit() else 999
        out.append(ECONOMY_CLASSES.get(num, "Unknown"))
    df = df.copy()
    df["economy"] = out
    if "ECONOMY" in df.columns:
        df = df.drop(columns=["ECONOMY"])
    return df


def append_info_to_df(df: pd.DataFrame,
                      world_path: Optional[str] = None,
                      koppen_path: Optional[str] = None,
                      koppen_legend: Optional[str] = None) -> pd.DataFrame:
    """Add Country / Continent / ECONOMY / Koppen_Class columns from the
    sample x/y (lon/lat) columns.  Falls back to "Unknown" columns when the
    geo stack or data layers are missing."""
    df = df.copy()
    joined = False
    if world_path and os.path.exists(world_path):
        try:
            import geopandas as gpd

            gdf = gpd.GeoDataFrame(df, geometry=gpd.points_from_xy(df.x, df.y),
                                   crs="EPSG:4326")
            world = gpd.read_file(world_path)
            world = world.rename(columns={"SOV_A3": "Country",
                                          "CONTINENT": "Continent"})
            world = world[["Country", "Continent", "ECONOMY", "geometry"]]
            df = pd.DataFrame(gpd.sjoin(gdf, world.set_crs("EPSG:4326"), how="left"))
            joined = True
        except Exception as e:
            print("country join unavailable:", e)
    if not joined:
        df["Country"] = "Unknown"
        df["Continent"] = "Unknown"
        df["ECONOMY"] = None

    df["Koppen_Class"] = _koppen_classes(df, koppen_path, koppen_legend)
    return df


def _koppen_classes(df, koppen_path, koppen_legend):
    if koppen_path and os.path.exists(koppen_path):
        try:
            from rasterstats import point_query
            from shapely.geometry import Point

            pts = [Point(x, y) for x, y in zip(df.x, df.y)]
            vals = point_query(pts, koppen_path)
            legend = pd.read_csv(koppen_legend) if koppen_legend else None
            out = []
            for v in vals:
                idx = int(v) if v is not None else 0
                if legend is not None and (legend["id"] == idx).any():
                    code = legend.loc[legend["id"] == idx, "Code"].values[0]
                    out.append(code[0].upper())
                else:
                    out.append("U")
            return out
        except Exception as e:
            print("Köppen join unavailable:", e)
    return ["U"] * len(df)


def points_to_geojson(df: pd.DataFrame, path: str):
    """Write a per-sample metric table as a GeoJSON point collection using
    plain json — no geopandas required (geopandas writes the same structure
    when present upstream)."""
    import json

    skip = {"x", "y", "geometry", "index_right"}
    features = []
    for _, row in df.iterrows():
        props = {}
        for k, v in row.items():
            if k in skip:
                continue
            if isinstance(v, (np.floating, np.integer)):
                v = v.item()
            elif not isinstance(v, (str, int, float, bool, type(None))):
                continue
            props[k] = v
        features.append({
            "type": "Feature",
            "geometry": {"type": "Point",
                         "coordinates": [float(row["x"]), float(row["y"])]},
            "properties": props,
        })
    with open(path, "w") as f:
        json.dump({"type": "FeatureCollection", "features": features}, f)
