"""Imports dataset definitions so they self-register."""

from . import kitti  # noqa: F401
from . import eth3d  # noqa: F401
from . import dtu  # noqa: F401
from . import scannet  # noqa: F401
from . import tanks_and_temples  # noqa: F401
from . import staticthings3d  # noqa: F401
from . import blendedmvs  # noqa: F401
from . import flyingthings3d  # noqa: F401
from . import synthetic  # noqa: F401
