"""Dataset selection from config (the contract of the reference's gitignored
``data/select_dataset.py`` observed at ``train.py:77-78``): config →
DataModule with ``train_dataloader()`` / ``val_dataloader()``, honoring
``config.Data.dataset_type`` as a string or a list (mixed datasets).
"""

from __future__ import annotations

from typing import Optional

import numpy as np

from nirgan_tpu.data.datasets import (
    FakeDataset,
    GeoTiffFolderDataset,
    MixedDataset,
    NpzFolderDataset,
)
from nirgan_tpu.data.pipeline import Loader

__all__ = ["dataset_selector", "DataModule", "build_dataset"]

_SETTINGS_KEY = {
    "SEN2NAIP": "sen2naip_settings",
    "S2NAIP": "sen2naip_settings",
    "S2_rand": "S2_rand_settings",
    "S2_75k": "S2_75k_settings",
    "S2_100k": "S2_100k_settings",
    "worldstrat": "worldstrat_settings",
    "L8_15k": "L8_15k_settings",
    "fake": "fake_settings",
}


def build_dataset(name: str, data_cfg, split: str = "train"):
    """One dataset by reference type name.  File-backed types auto-pick the
    reader by what's on disk (.npz/.npy first, GeoTIFF fallback)."""
    key = _SETTINGS_KEY.get(name)
    if key is None:
        raise NotImplementedError(f"dataset_type '{name}' is not recognised")
    st = data_cfg.get(key, {})
    image_size = int(st.get("image_size", 256))
    return_coords = bool(st.get("return_coords", False))

    if name == "fake":
        length = int(st.get("length", 64))
        if split == "val":
            length = max(8, length // 8)
        return FakeDataset(image_size=image_size, length=length,
                           return_coords=return_coords,
                           seed=0 if split == "train" else 1,
                           mode=st.get("mode", "rgb"))

    base = st.get("base_path", None)
    if base is None:
        raise ValueError(f"dataset '{name}' needs {key}.base_path")
    try:
        return NpzFolderDataset(base, image_size=image_size, return_coords=return_coords)
    except FileNotFoundError:
        return GeoTiffFolderDataset(base, image_size=image_size,
                                    return_coords=return_coords)


class DataModule:
    """Train/val loader pair over the host pipeline.  When a native train
    iterable is attached (C++ tileio fast path), it replaces the Python
    loader for training; validation always uses the Python loader."""

    def __init__(self, train_ds, val_ds, train_batch_size: int,
                 val_batch_size: int, num_workers: int = 0, seed: int = 0,
                 native_train_iter=None):
        self.train_ds, self.val_ds = train_ds, val_ds
        self.train_batch_size = train_batch_size
        self.val_batch_size = val_batch_size
        self.num_workers = num_workers
        self.seed = seed
        self.native_train_iter = native_train_iter

    def train_dataloader(self) -> Loader:
        if self.native_train_iter is not None:
            return self.native_train_iter
        import jax

        # multi-host: every process loads only its disjoint shard of each
        # epoch (identical seeded permutation, strided slice — pipeline.py)
        return Loader(self.train_ds, self.train_batch_size, shuffle=True,
                      num_workers=self.num_workers, seed=self.seed, drop_last=True,
                      process_index=jax.process_index(),
                      process_count=jax.process_count())

    def val_dataloader(self) -> Loader:
        import jax

        # per-process slice like training (PL-DDP uses a DistributedSampler
        # on val too): without it every host evaluates the full val set and
        # shard_batch assembles duplicated global batches
        return Loader(self.val_ds, self.val_batch_size, shuffle=False,
                      num_workers=self.num_workers, drop_last=True,
                      process_index=jax.process_index(),
                      process_count=jax.process_count())


def dataset_selector(config, seed: int = 0) -> DataModule:
    """config → DataModule (mirrors the reference call site
    ``train.py:77-78``).  ``dataset_type`` may be a string or a list; a list
    becomes a uniformly-sampled mixed dataset (``README.md:54``).

    Val split: a held-out slice of the same source(s) — the upstream split
    policy is unrecoverable (gitignored), so we take every 17th item for val
    deterministically."""
    data_cfg = config.Data
    dtype_ = data_cfg.dataset_type
    names = list(dtype_) if isinstance(dtype_, (list, tuple)) else [dtype_]

    trains, vals = [], []
    for n in names:
        trains.append(build_dataset(n, data_cfg, "train"))
        vals.append(build_dataset(n, data_cfg, "val"))
    train_ds = trains[0] if len(trains) == 1 else MixedDataset(trains)
    val_base = vals[0] if len(vals) == 1 else MixedDataset(vals)
    if not any(n == "fake" for n in names):
        train_ds, val_base = _holdout_split(train_ds)

    # optional C++ decode fast path (Data.native_loader: true) — applies to
    # single .npy-folder datasets without coords
    native_iter = None
    if data_cfg.get("native_loader", False) and len(names) == 1 and names[0] != "fake":
        st = data_cfg.get(_SETTINGS_KEY[names[0]], {})
        base = st.get("base_path")
        if base and not st.get("return_coords", False):
            try:
                from nirgan_tpu.data.native_loader import NativeNpyDataset, available

                if available():
                    native_iter = NativeNpyDataset(
                        base, image_size=int(st.get("image_size", 256)),
                        batch_size=int(data_cfg.train_batch_size), seed=seed,
                        n_threads=int(data_cfg.get("num_workers", 8)))
            except (FileNotFoundError, RuntimeError) as e:
                print("native loader unavailable, using Python pipeline:", e)

    return DataModule(
        train_ds,
        val_base,
        train_batch_size=int(data_cfg.train_batch_size),
        val_batch_size=int(data_cfg.val_batch_size),
        num_workers=int(data_cfg.get("num_workers", 0)),
        seed=seed,
        native_train_iter=native_iter,
    )


class _Subset:
    def __init__(self, ds, indices):
        self.ds, self.indices = ds, indices

    def __len__(self):
        return len(self.indices)

    def __getitem__(self, i):
        return self.ds[int(self.indices[i])]


def _holdout_split(ds, every: int = 17):
    idx = np.arange(len(ds))
    val_idx = idx[::every]
    train_idx = np.setdiff1d(idx, val_idx)
    return _Subset(ds, train_idx), _Subset(ds, val_idx)
