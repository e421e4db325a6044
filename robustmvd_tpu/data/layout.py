"""Viewer layouts: grid descriptions of per-sample visualizations.

Reference parity (rmvd/data/layout.py:30-81): a Layout is a named list of
Visualizations, each carrying a grid cell, a visualization type and a
``load_fct`` closure mapping a sample dict to display data. The reference
pickles closures via dill; here layouts serialize with the stdlib pickle
when the load functions are module-level, and dill when available.
"""

from __future__ import annotations

import pickle


class Visualization:
    def __init__(self, col, row, visualization_type, load_fct, name=None, colspan=1, rowspan=1):
        self.col = col
        self.row = row
        self.visualization_type = visualization_type
        self.load_fct = load_fct
        self.name = name
        self.colspan = colspan
        self.rowspan = rowspan


class Layout:
    def __init__(self, name, visualizations=None):
        self.name = name
        self.visualizations = [] if visualizations is None else visualizations

    def load(self, data):
        return [v.load_fct(data) for v in self.visualizations]

    def write(self, path):
        path = path if path.endswith(".pickle") else path + ".pickle"
        payload = self.visualizations + [self.name]
        try:
            import dill as serializer
        except ImportError:
            serializer = pickle
        with open(path, "wb") as f:
            serializer.dump(payload, f)

    @classmethod
    def from_file(cls, path, name=None):
        path = path if path.endswith(".pickle") else path + ".pickle"
        try:
            import dill as serializer
        except ImportError:
            serializer = pickle
        with open(path, "rb") as f:
            visualizations = serializer.load(f)
        name = name if name is not None else visualizations[-1]
        return cls(name=name, visualizations=visualizations[:-1])
