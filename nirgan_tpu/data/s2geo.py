"""S2-100K (image, location) dataset for SatCLIP pretraining — the contract
of the reference's vendored ``datamodules/s2geo_dataset.py`` +
``datamodules/transforms.py`` (SURVEY.md §2 row 19): items are
``{"image": (C,H,W) float, "point": (2,) lon/lat}``, with train-time
random crop / horizontal flip / gaussian blur and ±0.01° coordinate jitter
(``transforms.py:78-82``).
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np

from nirgan_tpu.data.pipeline import Loader

__all__ = ["S2GeoDataset", "FakeS2GeoDataset", "S2GeoDataModule",
           "train_transform"]


def _gaussian_blur_chw(img: np.ndarray, sigma: float) -> np.ndarray:
    from scipy.ndimage import gaussian_filter

    return np.stack([gaussian_filter(c, sigma) for c in img])


def train_transform(item: dict, rng: np.random.Generator, crop: int = 256,
                    blur_p: float = 0.5, jitter: float = 0.01) -> dict:
    """Random crop + horizontal flip + gaussian blur + coordinate jitter."""
    img = item["image"]
    c, h, w = img.shape
    if h > crop and w > crop:
        y = rng.integers(0, h - crop)
        x = rng.integers(0, w - crop)
        img = img[:, y:y + crop, x:x + crop]
    if rng.random() < 0.5:
        img = img[:, :, ::-1].copy()
    if rng.random() < blur_p:
        img = _gaussian_blur_chw(img, sigma=float(rng.uniform(0.1, 2.0)))
    point = item["point"] + rng.uniform(-jitter, jitter, size=2).astype(np.float32)
    return {"image": img.astype(np.float32), "point": point.astype(np.float32)}


class S2GeoDataset:
    """Folder of .npz tiles with ``image`` (C,H,W, uint16 DN or float) and
    ``point``/``coords`` (2,)."""

    def __init__(self, base_path: str, crop: int = 256, augment: bool = True,
                 seed: int = 0, dn_scale: float = 10000.0):
        self.files = sorted(os.path.join(base_path, f)
                            for f in os.listdir(base_path) if f.endswith(".npz"))
        if not self.files:
            raise FileNotFoundError(f"no .npz tiles under {base_path!r}")
        self.crop, self.augment, self.seed, self.dn_scale = crop, augment, seed, dn_scale

    def __len__(self):
        return len(self.files)

    def __getitem__(self, idx):
        z = np.load(self.files[idx])
        img = np.asarray(z["image"])
        if img.dtype.kind in "ui":
            img = img.astype(np.float32) / self.dn_scale
        point = np.asarray(z["point"] if "point" in z else z["coords"], np.float32)
        item = {"image": img.astype(np.float32), "point": point}
        if self.augment:
            rng = np.random.default_rng(self.seed * 7_919 + idx)
            item = train_transform(item, rng, crop=self.crop)
        else:
            item["image"] = item["image"][:, :self.crop, :self.crop]
        return item


class FakeS2GeoDataset:
    """Procedural stand-in for tests / smoke training."""

    def __init__(self, length: int = 32, crop: int = 64, channels: int = 4,
                 augment: bool = True, seed: int = 0):
        self.length, self.crop, self.channels = length, crop, channels
        self.augment, self.seed = augment, seed

    def __len__(self):
        return self.length

    def __getitem__(self, idx):
        rng = np.random.default_rng(self.seed * 104_729 + idx)
        img = rng.random((self.channels, self.crop + 16, self.crop + 16),
                         dtype=np.float32)
        point = np.asarray([rng.uniform(-180, 180), rng.uniform(-90, 90)],
                           np.float32)
        item = {"image": img, "point": point}
        return (train_transform(item, rng, crop=self.crop, blur_p=0.3)
                if self.augment else
                {"image": img[:, :self.crop, :self.crop], "point": point})


class S2GeoDataModule:
    """train/val loader pair (reference ``S2GeoDataModule`` contract)."""

    def __init__(self, dataset=None, base_path: Optional[str] = None,
                 batch_size: int = 32, crop: int = 256, num_workers: int = 4):
        if dataset is None:
            dataset = S2GeoDataset(base_path, crop=crop)
        self.dataset = dataset
        self.batch_size = batch_size
        self.num_workers = num_workers

    def train_dataloader(self):
        return Loader(self.dataset, self.batch_size, shuffle=True,
                      num_workers=self.num_workers, drop_last=True)

    def val_dataloader(self):
        return Loader(self.dataset, self.batch_size, shuffle=False,
                      num_workers=self.num_workers, drop_last=True)
