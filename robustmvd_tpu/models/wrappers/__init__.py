from .wrappers import ModelWrappers, add_repo_to_path, get_wrapper_path

# Wrapped-model entrypoints self-register on import; the external repos are
# only touched when a wrapped model is actually created.
from . import monodepth2  # noqa: F401
from . import midas  # noqa: F401
from . import mvsnet_pl  # noqa: F401
from . import vis_mvsnet  # noqa: F401
from . import cvp_mvsnet  # noqa: F401
from . import patchmatchnet  # noqa: F401

__all__ = ["ModelWrappers", "add_repo_to_path", "get_wrapper_path"]
