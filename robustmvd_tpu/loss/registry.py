"""Loss registry (reference interface parity: rmvd/loss/registry.py)."""

from ..utils.registry import Registry

_registry = Registry("loss")


def register_loss(fn=None, /, **meta):
    return _registry.register(fn, **meta) if fn is not None else _registry.register(**meta)


def list_losses():
    return _registry.list()


def has_loss(name):
    return _registry.has(name)


def get_loss(name):
    return _registry.get(name)
