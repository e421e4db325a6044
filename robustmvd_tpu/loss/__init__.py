from .registry import register_loss, list_losses, has_loss, get_loss
from .factory import create_loss

# Loss definitions self-register on import.
from . import multi_scale_uni_laplace  # noqa: F401
from . import single_scale_mae  # noqa: F401
from . import multi_scale_mae  # noqa: F401
from . import vismvsnet_multiscale_multiview_aggregate  # noqa: F401
from . import mvsnet_sl1  # noqa: F401

# package-level class re-exports (reference: rmvd/loss/__init__.py)
from .multi_scale_uni_laplace import MultiScaleUniLaplace  # noqa: F401
from .single_scale_mae import SingleScaleMAE  # noqa: F401
from .multi_scale_mae import MultiScaleMAE  # noqa: F401
from .vismvsnet_multiscale_multiview_aggregate import (  # noqa: F401
    VismvnsetMultiscaleMultiviewAggregate,
)
from .mvsnet_sl1 import SL1Loss  # noqa: F401

__all__ = [
    "register_loss",
    "list_losses",
    "has_loss",
    "get_loss",
    "create_loss",
    "MultiScaleUniLaplace",
    "SingleScaleMAE",
    "MultiScaleMAE",
    "VismvnsetMultiscaleMultiviewAggregate",
    "SL1Loss",
]
