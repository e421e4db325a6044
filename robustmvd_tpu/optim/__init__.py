from .registry import (
    register_optimizer,
    register_scheduler,
    list_optimizers,
    list_schedulers,
    has_optimizer,
    has_scheduler,
)
from .factory import create_optimizer, create_scheduler
from . import optims  # noqa: F401  (self-registration)
from .optims import adam, rmsprop, flownet_scheduler, mvsnet_scheduler  # noqa: F401

__all__ = [
    "register_optimizer",
    "register_scheduler",
    "list_optimizers",
    "list_schedulers",
    "has_optimizer",
    "has_scheduler",
    "create_optimizer",
    "create_scheduler",
    "adam",
    "rmsprop",
    "flownet_scheduler",
    "mvsnet_scheduler",
]
