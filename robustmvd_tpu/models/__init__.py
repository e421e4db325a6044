from .factory import create_model, prepare_custom_model
from .registry import has_model, list_models, register_model
from .helpers import ModelBase, add_run_function

# Import model definitions so they self-register.
from . import robust_mvd  # noqa: F401
from . import mvsnet  # noqa: F401
from . import vis_mvsnet  # noqa: F401
from . import cvp_mvsnet  # noqa: F401
from . import wrappers  # noqa: F401

__all__ = [
    "create_model",
    "prepare_custom_model",
    "has_model",
    "list_models",
    "register_model",
    "ModelBase",
    "add_run_function",
]
