"""Generic registry + factory machinery.

Every pluggable family (models, datasets, augmentations, losses, optimizers,
schedulers, evaluations, trainings) uses the same timm-style pattern the
reference uses (rmvd/models/registry.py:7-53, rmvd/data/registry.py:8-252):
a dict of entrypoint callables populated by a decorator, with
list/has/get helpers.
"""

from __future__ import annotations

from typing import Callable, Dict


class Registry:
    def __init__(self, kind: str):
        self.kind = kind
        self._entrypoints: Dict[str, Callable] = {}
        self._meta: Dict[str, dict] = {}

    def register(self, fn=None, /, **meta):
        """Use as ``@reg.register`` or ``@reg.register(key=value, ...)``."""

        def deco(f):
            name = meta.pop("name", f.__name__)
            self._entrypoints[name] = f
            self._meta[name] = dict(meta)
            return f

        if fn is not None:
            return deco(fn)
        return deco

    def get(self, name: str) -> Callable:
        if name not in self._entrypoints:
            raise ValueError(
                f"unknown {self.kind} '{name}'. Available: {sorted(self._entrypoints)}"
            )
        return self._entrypoints[name]

    def meta(self, name: str) -> dict:
        return self._meta.get(name, {})

    def has(self, name: str) -> bool:
        return name in self._entrypoints

    def list(self):
        return sorted(self._entrypoints)
