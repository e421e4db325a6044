"""Loss factory (reference interface parity: rmvd/loss/factory.py:4)."""

from .registry import get_loss


def create_loss(name, model=None, **kwargs):
    """Create a loss by name. ``model`` lets losses bind regularization

    parameter sets (reference: rmvd/loss/multi_scale_uni_laplace.py:58-77).
    """
    entrypoint = get_loss(name)
    return entrypoint(model=model, **kwargs)
