from .factory import cli_model_kwargs, create_model, prepare_custom_model
from .registry import has_model, list_models, register_model
from .helpers import ModelBase, add_run_function

# Import model definitions so they self-register.
from . import robust_mvd as _robust_mvd_module  # noqa: F401
from . import mvsnet as _mvsnet_module  # noqa: F401
from . import vis_mvsnet as _vis_mvsnet_module  # noqa: F401
from . import cvp_mvsnet as _cvp_mvsnet_module  # noqa: F401
from . import wrappers  # noqa: F401

# package-level entrypoint re-exports (reference: rmvd/models/__init__.py)
from .robust_mvd import robust_mvd, robust_mvd_5M  # noqa: F401
from .mvsnet import mvsnet_train  # noqa: F401
from .vis_mvsnet import vis_mvsnet  # noqa: F401
from .cvp_mvsnet import cvp_mvsnet  # noqa: F401
from .wrappers.monodepth2 import (  # noqa: F401
    monodepth2_mono_stereo_1024x320_wrapped,
    monodepth2_mono_stereo_640x192_wrapped,
)
from .wrappers.midas import midas_big_v2_1_wrapped  # noqa: F401
from .wrappers.mvsnet_pl import mvsnet_pl_wrapped  # noqa: F401
from .wrappers.vis_mvsnet import vis_mvsnet_wrapped  # noqa: F401
from .wrappers.cvp_mvsnet import cvp_mvsnet_wrapped  # noqa: F401
from .wrappers.patchmatchnet import patchmatchnet_wrapped  # noqa: F401

__all__ = [
    "create_model",
    "prepare_custom_model",
    "has_model",
    "list_models",
    "register_model",
    "ModelBase",
    "add_run_function",
]
