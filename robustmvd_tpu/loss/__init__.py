from .registry import register_loss, list_losses, has_loss, get_loss
from .factory import create_loss

# Loss definitions self-register on import.
from . import multi_scale_uni_laplace  # noqa: F401
from . import single_scale_mae  # noqa: F401
from . import multi_scale_mae  # noqa: F401
from . import vismvsnet_multiscale_multiview_aggregate  # noqa: F401
from . import mvsnet_sl1  # noqa: F401

__all__ = ["register_loss", "list_losses", "has_loss", "get_loss", "create_loss"]
