from .registry import (
    register_dataset,
    register_default_dataset,
    register_augmentation,
    register_batch_augmentation,
    list_datasets,
    list_base_datasets,
    list_dataset_types,
    list_splits,
    list_augmentations,
    list_batch_augmentations,
    has_dataset,
    has_augmentation,
    has_batch_augmentation,
    create_augmentation,
    create_batch_augmentation,
)
from .factory import create_dataset, create_compound_dataset, create_dataloader

# Dataset / augmentation definitions self-register on import.
from . import augmentations  # noqa: F401
from . import batch_augmentations  # noqa: F401
from . import datasets  # noqa: F401

__all__ = [
    "register_dataset",
    "register_default_dataset",
    "register_augmentation",
    "register_batch_augmentation",
    "list_datasets",
    "list_base_datasets",
    "list_dataset_types",
    "list_splits",
    "list_augmentations",
    "list_batch_augmentations",
    "has_dataset",
    "has_augmentation",
    "has_batch_augmentation",
    "create_augmentation",
    "create_batch_augmentation",
    "create_dataset",
    "create_compound_dataset",
    "create_dataloader",
]
