"""Buffered event writer flushing to TensorBoard (and JSONL).

Reference parity (rmvd/utils/writer.py:31-398, nerfstudio-derived): a
module-level buffered event store with ``put_scalar``/``put_scalar_dict``/
``put_tensor``/``put_histogram``/``put_time`` and an explicit
``write_out_storage`` flush. Backends: torch TensorBoard writer when
available, plus an always-on JSONL event log for headless runs.
``TimeWriter`` context manager records durations with running average/ETA.
"""

from __future__ import annotations

import json
import os
import time
from collections import defaultdict

import numpy as np

_EVENT_STORAGE = []
_writers = []
_jsonl_path = None
_durations = defaultdict(lambda: {"total": 0.0, "count": 0})


def setup_writers(log_tensorboard=True, log_wandb=False, out_dir=None):
    """Initialize writer backends (reference: writer.py:250-274)."""
    global _jsonl_path
    _writers.clear()
    if out_dir is None:
        return
    os.makedirs(out_dir, exist_ok=True)
    _jsonl_path = os.path.join(out_dir, "events.jsonl")
    if log_tensorboard:
        try:
            from torch.utils.tensorboard import SummaryWriter

            _writers.append(("tb", SummaryWriter(log_dir=out_dir)))
        except Exception:
            pass
    if log_wandb:
        try:
            import wandb

            wandb.init(dir=out_dir, resume="allow")
            _writers.append(("wandb", wandb))
        except Exception:
            pass


def put_scalar(name, scalar, step=None):
    _EVENT_STORAGE.append(
        {"type": "scalar", "name": name, "value": _to_py(scalar), "step": step}
    )


def put_scalar_dict(name, scalar, step=None):
    for key, val in scalar.items():
        put_scalar(f"{name}/{key}", val, step=step)


def put_scalar_list(name, scalars, step=None):
    for i, val in enumerate(scalars):
        put_scalar(f"{name}/{i}", val, step=step)


def put_tensor(name, tensor, step=None):
    _EVENT_STORAGE.append(
        {"type": "image", "name": name, "value": np.asarray(tensor), "step": step}
    )


def put_histogram(name, values, step=None):
    _EVENT_STORAGE.append(
        {"type": "histogram", "name": name, "value": np.asarray(values), "step": step}
    )


def put_time(name, duration, step=None, avg_over_steps=True, update_eta=False, max_iterations=None):
    """Record a duration; with avg_over_steps, also logs the running average

    (reference: writer.py:303-329)."""
    d = _durations[name]
    d["total"] += duration
    d["count"] += 1
    put_scalar(name, duration, step=step)
    if avg_over_steps:
        put_scalar(f"{name}_avg", d["total"] / d["count"], step=step)
    if update_eta and max_iterations is not None and step is not None:
        remaining = max_iterations - step
        put_scalar(f"{name}_eta_min", remaining * (d["total"] / d["count"]) / 60, step=step)


def write_out_storage():
    """Flush buffered events to all backends (reference: writer.py:331-378)."""
    global _EVENT_STORAGE
    events, _EVENT_STORAGE = _EVENT_STORAGE, []
    if not events:
        return

    if _jsonl_path is not None:
        with open(_jsonl_path, "a") as f:
            for e in events:
                if e["type"] == "scalar":
                    f.write(json.dumps(e) + "\n")

    for kind, w in _writers:
        for e in events:
            try:
                if kind == "tb":
                    if e["type"] == "scalar" and e["value"] is not None:
                        w.add_scalar(e["name"], e["value"], global_step=e["step"])
                    elif e["type"] == "image":
                        w.add_image(e["name"], e["value"], global_step=e["step"], dataformats="HWC")
                    elif e["type"] == "histogram":
                        w.add_histogram(e["name"], e["value"], global_step=e["step"])
                elif kind == "wandb" and e["type"] == "scalar":
                    w.log({e["name"]: e["value"]}, step=e["step"])
            except Exception:
                pass
    for kind, w in _writers:
        if kind == "tb":
            try:
                w.flush()
            except Exception:
                pass


def _to_py(x):
    if hasattr(x, "item"):
        try:
            return float(x.item())
        except Exception:
            return None
    if isinstance(x, (int, float, np.floating, np.integer)):
        return float(x)
    return None


class TimeWriter:
    """Context manager timing a block (reference: writer.py:303-329)."""

    def __init__(self, name, step=None, write=True, avg_over_steps=True, update_eta=False, max_iterations=None):
        self.name = name
        self.step = step
        self.write = write
        self.avg_over_steps = avg_over_steps
        self.update_eta = update_eta
        self.max_iterations = max_iterations

    def __enter__(self):
        self.start = time.time()
        return self

    def __exit__(self, *args):
        self.duration = time.time() - self.start
        if self.write:
            put_time(
                self.name,
                self.duration,
                step=self.step,
                avg_over_steps=self.avg_over_steps,
                update_eta=self.update_eta,
                max_iterations=self.max_iterations,
            )
