"""Misc utilities (reference parity: rmvd/utils/utils.py:12-19 `set_random_seed`,
`get_full_class_name`; rmvd/utils/pandas_utils.py:4-5 `prepend_level`)."""

from __future__ import annotations

import random

import numpy as np


def set_random_seed(seed):
    """Seed python + numpy (jax keys are explicit; torch seeded if loaded)."""
    random.seed(seed)
    np.random.seed(seed)
    try:
        import sys

        if "torch" in sys.modules:
            sys.modules["torch"].manual_seed(seed)
    except Exception:
        pass


def get_full_class_name(obj):
    cls = obj if isinstance(obj, type) else type(obj)
    return f"{cls.__module__}.{cls.__qualname__}"


def prepend_level(df, name, value, axis=1):
    import pandas as pd

    return pd.concat({value: df}, names=[name], axis=axis)


class NanError(Exception):
    """Numerical sanitizer error (reference parity: blocks/utils.py:91)."""


def check_finite(name, *arrays):
    """Host-side NaN/Inf guard used in debug paths (reference parity:

    the reference raises NanError on non-finite warps,
    blocks/utils.py:147-171). Raises NanError naming the offending array."""
    import numpy as np

    for i, arr in enumerate(arrays):
        a = np.asarray(arr)
        if not np.isfinite(a).all():
            raise NanError(f"{name}[{i}] contains non-finite values")


def get_function(name):
    """Resolve a dotted ``module.attr`` path to the attribute

    (reference: rmvd/utils/utils.py:44-50)."""
    import importlib

    mod_name, func_name = name.rsplit(".", 1)
    return getattr(importlib.import_module(mod_name), func_name)


def get_class(name):
    return get_function(name)


def module_exists(name):
    import importlib.util

    try:
        return importlib.util.find_spec(name) is not None
    except (ImportError, ModuleNotFoundError, ValueError):
        return False


def function_exists(name):
    import importlib

    mod_name, fct_name = name.rsplit(".", 1)
    if not module_exists(mod_name):
        return False
    return hasattr(importlib.import_module(mod_name), fct_name)


def class_exists(name):
    return function_exists(name)
