"""Dataset factory (reference parity: rmvd/data/factory.py:10-129)."""

from __future__ import annotations

import os

from .registry import get_dataset


def create_dataset(dataset_name_or_path, dataset_type=None, split=None, **kwargs):
    """Create a dataset from a registry name or a saved ``dataset.cfg`` path.

    A path argument re-opens a previously written evaluation dataset config
    (reference: rmvd/data/factory.py:10-34 + dataset.py:256-304).
    """
    if os.path.exists(dataset_name_or_path):
        from .dataset import Dataset

        return Dataset.from_config(dataset_name_or_path, **kwargs)
    cls = get_dataset(dataset_name_or_path, dataset_type=dataset_type, split=split)
    return cls(**kwargs)


def create_compound_dataset(datasets, common_keys=None, **kwargs):
    """Concatenate datasets (reference: rmvd/data/factory.py:93)."""
    from .compound_dataset import CompoundDataset

    return CompoundDataset(datasets=datasets, common_keys=common_keys, **kwargs)


def create_dataloader(
    dataset,
    batch_size=1,
    shuffle=False,
    num_workers=0,
    drop_last=False,
    collate_fn=None,
    seed=None,
):
    """Create a loader over a dataset (reference: rmvd/data/factory.py:36-91).

    See :class:`robustmvd_tpu.data.loader.DataLoader` for the TPU-native
    prefetching loader.
    """
    from .loader import DataLoader

    return DataLoader(
        dataset,
        batch_size=batch_size,
        shuffle=shuffle,
        num_workers=num_workers,
        drop_last=drop_last,
        collate_fn=collate_fn,
        seed=seed,
    )
