from nirgan_tpu.data.select_dataset import dataset_selector
from nirgan_tpu.data.datasets import FakeDataset, ArrayDataset, NpzFolderDataset
from nirgan_tpu.data.pipeline import Loader, DeviceFeed

__all__ = [
    "dataset_selector",
    "FakeDataset",
    "ArrayDataset",
    "NpzFolderDataset",
    "Loader",
    "DeviceFeed",
]
