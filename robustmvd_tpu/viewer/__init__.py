"""Dataset viewer (reference parity: rmvd/viewer/__init__.py:1-13).

The reference ships a PyQt5/iviz GUI (rmvd/viewer/viewer.py:14-91); this
framework provides a lightweight matplotlib viewer with the same
layout-driven MVC structure: a Layout maps samples to grid cells of
visualizations, the ViewerModel resolves them, and the viewer renders
per-sample pages (interactive window when a display is available,
PNG export otherwise).
"""

from .viewer import Viewer, run_viewer
from .viewer_model import ViewerModel

__all__ = ["Viewer", "ViewerModel", "run_viewer"]
