"""TOML-based path configuration for dataset roots and external weights.

Capability parity with the reference's path system (rmvd/data/paths.toml +
rmvd/data/dataset.py:307-321, rmvd/utils/utils.py:372-388): dataset roots are
looked up from a ``paths.toml`` next to the package data dir, overridable by
``~/rmvd_data_paths.toml``.
"""

from __future__ import annotations

import os
import tomllib
from pathlib import Path

_PKG_DATA_DIR = Path(__file__).resolve().parent.parent / "data"

USER_PATHS_FILE = Path(os.path.expanduser("~")) / "rmvd_data_paths.toml"
PKG_PATHS_FILE = _PKG_DATA_DIR / "paths.toml"


def load_paths(paths_file=None):
    """Load a paths TOML file into a nested dict. Missing file -> {}."""
    candidates = (
        [Path(paths_file)] if paths_file is not None else [USER_PATHS_FILE, PKG_PATHS_FILE]
    )
    for cand in candidates:
        if cand.is_file():
            with open(cand, "rb") as f:
                return tomllib.load(f)
    return {}


def get_path(*keys, paths_file=None):
    """Walk nested keys in the paths config; returns str/list or None.

    Accepts a trailing sequence of keys like ("kitti", "root"); intermediate
    missing keys yield None (reference: rmvd/utils/utils.py:377-388).
    """
    node = load_paths(paths_file)
    path = None
    for idx, key in enumerate(keys):
        if key in node:
            val = node[key]
            if isinstance(val, (str, list)) and idx == len(keys) - 1:
                path = val
            elif isinstance(val, dict):
                node = val
    return path
