from uwudiff_tpu.data.base import (
    UwUBaseDataset,
    DummyDataset,
    TrainDataModule,
    DataLoader,
)

__all__ = ["UwUBaseDataset", "DummyDataset", "TrainDataModule", "DataLoader"]
