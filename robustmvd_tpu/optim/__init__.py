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

__all__ = [
    "register_optimizer",
    "register_scheduler",
    "list_optimizers",
    "list_schedulers",
    "has_optimizer",
    "has_scheduler",
    "create_optimizer",
    "create_scheduler",
]
