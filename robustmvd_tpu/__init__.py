"""robustmvd_tpu — a TPU-native (JAX/XLA/Pallas/pjit) multi-view depth framework.

A from-scratch re-design of the Robust Multi-view Depth benchmark + framework
("A Benchmark and a Baseline for Robust Multi-view Depth Estimation",
3DV 2022, arXiv:2209.06681) for TPU hardware: functional flax models, fused
XLA/Pallas plane-sweep kernels, pjit/shard_map parallelism over device
meshes, and a numpy-only host data path.

The public facade mirrors the reference's string interfaces
(reference: rmvd/__init__.py:1-25) so capability parity is directly
checkable: `create_model`, `create_dataset`, `create_evaluation`,
`create_training`, `create_optimizer`, `create_scheduler`, `create_loss`.
"""

__version__ = "0.1.0"

from .models import (  # noqa: F401
    create_model,
    list_models,
    has_model,
    prepare_custom_model,
)
from .data import (  # noqa: F401
    create_dataset,
    create_compound_dataset,
    create_dataloader,
    list_datasets,
    list_base_datasets,
    list_dataset_types,
    list_splits,
    has_dataset,
    list_augmentations,
    has_augmentation,
    create_augmentation,
    list_batch_augmentations,
    has_batch_augmentation,
    create_batch_augmentation,
)
from .loss import create_loss, list_losses, has_loss  # noqa: F401
from .optim import (  # noqa: F401
    create_optimizer,
    create_scheduler,
    list_optimizers,
    list_schedulers,
)
from .eval import create_evaluation, list_evaluations  # noqa: F401
from .train import create_training, list_trainings  # noqa: F401


def run_viewer(*args, **kwargs):
    """Start the dataset viewer GUI (reference: rmvd/__init__.py:24).

    Imported lazily so headless installs do not pay the matplotlib import.
    """
    from .viewer import run_viewer as _run_viewer

    return _run_viewer(*args, **kwargs)
