from uwudiff_tpu.data.base import (
    UwUBaseDataset,
    DummyDataset,
    TrainDataModule,
    DataLoader,
)
from uwudiff_tpu.data.local import (
    LocalImageDataset,
    LocalImageDatasetFromFolder,
    LocalTextImageDataset,
    LocalClassImageDataset,
)
from uwudiff_tpu.data.aspect_buckets import (
    AspectBucketDataset,
    BucketBatchLoader,
    make_buckets,
)
from uwudiff_tpu.data.dreambooth import PriorPreservationDataset
from uwudiff_tpu.data.webdataset import TarIndex, WebDatasetTarDataset

__all__ = [
    "UwUBaseDataset",
    "DummyDataset",
    "TrainDataModule",
    "DataLoader",
    "LocalImageDataset",
    "LocalImageDatasetFromFolder",
    "LocalTextImageDataset",
    "LocalClassImageDataset",
    "AspectBucketDataset",
    "BucketBatchLoader",
    "make_buckets",
    "PriorPreservationDataset",
    "TarIndex",
    "WebDatasetTarDataset",
]
