"""Viewer model: dataset + layout -> per-cell display data

(reference parity: rmvd/viewer/viewer_model.py)."""

from __future__ import annotations


class ViewerModel:
    def __init__(self, dataset, layout=None):
        self.dataset = dataset
        if layout is None:
            names = dataset.get_layout_names()
            eval_layouts = [n for n in names if n.startswith("eval")]
            layout_name = eval_layouts[0] if eval_layouts else "default"
            layout = dataset.get_layout(layout_name)
        elif isinstance(layout, str):
            layout = dataset.get_layout(layout)
        self.layout = layout

    def __len__(self):
        return len(self.dataset)

    def __getitem__(self, index):
        """Returns a list of (visualization, display_data) cells."""
        sample = self.dataset[index]
        cells = []
        for viz in self.layout.visualizations:
            try:
                data = viz.load_fct(sample)
            except Exception as e:  # a cell failing must not break the page
                data = {"data": None, "kind": "error", "error": str(e)}
            cells.append((viz, data))
        return cells
