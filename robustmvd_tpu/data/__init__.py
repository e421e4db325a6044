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

# package-level class / preset re-exports (reference: rmvd/data/__init__.py)
from .kitti import KITTIRobustMVD, KITTIEigenDenseDepthTest, KITTIEigenDenseDepthTrain  # noqa: F401
from .eth3d import ETH3DTrainRobustMVD  # noqa: F401
from .dtu import DTURobustMVD, DTUMvsnetTrain  # noqa: F401
from .scannet import ScanNetRobustMVD  # noqa: F401
from .tanks_and_temples import TanksAndTemplesTrainRobustMVD  # noqa: F401
from .staticthings3d import StaticThings3DSeq4Train  # noqa: F401
from .blendedmvs import BlendedMVSSeq4TrainSmall, BlendedMVSMVSNetTrain  # noqa: F401
from .flyingthings3d import FlyingThings3DSeq4Train  # noqa: F401
from .augmentations import (  # noqa: F401
    robust_mvd_augmentations_staticthings3d,
    robust_mvd_augmentations_blendedmvs,
    mvsnet_augmentations,
    mvsnet_sai_augmentations,
    supervised_monodepth2_augmentations,
    dpt_augmentations,
)
from .batch_augmentations import robust_mvd_batch_augmentations  # noqa: F401

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
