"""Model wrapper: the host<->device boundary and the `run()` protocol.

A model in this framework is a :class:`ModelBase`: a pure flax module plus
its variables, with host-side numpy ``input_adapter``/``output_adapter`` and
a jit-compiled device step. ``model.run(**sample)`` adds/removes the batch
dim around adapter -> forward -> adapter, exactly mirroring the reference's
injected run function (rmvd/models/helpers.py:65-89) so any code written
against the reference's model interface ports over unchanged.

Unlike the reference (which wraps models in nn.DataParallel,
helpers.py:163-169), device parallelism here is expressed with
jax.sharding: the jitted step can be given a Mesh + shardings via
``set_mesh`` and XLA partitions the computation.
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Optional

import jax
import numpy as np

from ..utils import add_batch_dim, remove_batch_dim, to_numpy


class LazyNumpyDict(dict):
    """Dict whose values run a converter (device->host fetch + layout

    transpose) on first access. Model output adapters return aux through
    this so the evaluation engine — which discards aux per run (reference:
    multi_view_depth_evaluation.py:561) — never pays the device->host
    transfer for the per-scale auxiliary maps.
    """

    def __init__(self, data, convert):
        super().__init__(data)
        self._convert = convert
        self._done = set()

    def __getitem__(self, key):
        val = super().__getitem__(key)
        if key not in self._done:
            if isinstance(val, list):
                val = [self._convert(v) for v in val]
            else:
                val = self._convert(val)
            super().__setitem__(key, val)
            self._done.add(key)
        return val

    def items(self):
        return [(k, self[k]) for k in self.keys()]

    def values(self):
        return [self[k] for k in self.keys()]


class ModelBase:
    """A flax module + variables with the reference model protocol.

    Subclasses (or factory functions) must provide:
      - ``module``: flax linen module
      - ``variables``: dict with "params" (and optionally "batch_stats")
      - ``input_adapter(images, keyview_idx, poses, intrinsics, depth_range)``
        returning a dict of numpy arrays shaped for ``forward``
      - ``forward(**sample)``: device computation returning (pred, aux)
      - ``output_adapter(model_output)`` returning numpy (pred, aux)
    """

    name: str = ""
    trainable: bool = True

    def __init__(self, module, variables, train: bool = False):
        self.module = module
        self.variables = variables
        self.train_mode = train
        self._jitted_apply: Optional[Callable] = None
        self.mesh = None

    # --- device step -----------------------------------------------------

    def apply_fn(self, variables, **sample):
        """Pure apply: override in subclasses. Returns (pred, aux) pytrees."""
        raise NotImplementedError

    def forward(self, **sample):
        if self._jitted_apply is None:
            self._jitted_apply = jax.jit(lambda v, s: self.apply_fn(v, **s))
        return self._jitted_apply(self.variables, sample)

    def __call__(self, **sample):
        return self.forward(**sample)

    def peak_memory_mib(self, **sample):
        """Compile-time peak device memory (MiB) for this sample's shapes.

        Fallback for backends where ``device.memory_stats()`` returns None
        (e.g. the tunneled TPU backend): lower+compile the same jitted
        forward AOT and read XLA's ``memory_analysis`` — peak = temps +
        arguments + outputs - aliased (reference reports per-sample
        allocated/reserved MiB, rmvd/eval/multi_view_depth_evaluation.py:
        458-461). Cached per shape bucket; the persistent compilation
        cache makes the extra compile cheap after the forward itself.
        """
        if self._jitted_apply is None:
            self._jitted_apply = jax.jit(lambda v, s: self.apply_fn(v, **s))
        key = tuple(
            (k, tuple(np.shape(v)), str(getattr(v, "dtype", type(v).__name__)))
            for k, v in sorted(sample.items())
            if v is not None
        )
        cache = getattr(self, "_mem_analysis_cache", None)
        if cache is None:
            cache = self._mem_analysis_cache = {}
        if key not in cache:
            compiled = self._jitted_apply.lower(self.variables, sample).compile()
            ma = compiled.memory_analysis()
            peak = (
                ma.temp_size_in_bytes
                + ma.argument_size_in_bytes
                + ma.output_size_in_bytes
                - ma.alias_size_in_bytes
            )
            cache[key] = peak / 2**20
        return cache[key]

    # --- host adapters ---------------------------------------------------

    def input_adapter(self, images, keyview_idx, poses=None, intrinsics=None, depth_range=None):
        """Map a host sample to model kwargs (reference: rmvd/models/helpers.py).

        Contract: the passed arrays may be ALIASED into the caller's sample
        (the eval engine's ``filter_views_in_sample`` selects per-view
        images/poses/intrinsics by reference so device-staged images are not
        re-uploaded per run). Adapters must therefore never mutate their
        inputs in place — rebuild scaled intrinsics/resized images as new
        arrays instead.
        """
        raise NotImplementedError

    def output_adapter(self, model_output):
        pred, aux = model_output
        return to_numpy(pred), to_numpy(aux)

    # --- the run protocol ------------------------------------------------

    def run(self, images, keyview_idx, poses=None, intrinsics=None, depth_range=None, **_):
        """Numpy in -> numpy out, handling the batch dim

        (reference: rmvd/models/helpers.py:65-89).
        """
        no_batch_dim = images[0].ndim == 3
        if no_batch_dim:
            images, keyview_idx, poses, intrinsics, depth_range = add_batch_dim(
                [images, keyview_idx, poses, intrinsics, depth_range]
            )

        sample = self.input_adapter(
            images=images,
            keyview_idx=keyview_idx,
            poses=poses,
            intrinsics=intrinsics,
            depth_range=depth_range,
        )
        model_output = self.forward(**sample)
        pred, aux = self.output_adapter(model_output)

        if no_batch_dim:
            pred, aux = remove_batch_dim((pred, aux))

        return pred, aux

    # --- misc ------------------------------------------------------------

    def num_parameters(self) -> int:
        return sum(int(np.prod(p.shape)) for p in jax.tree_util.tree_leaves(self.variables["params"]))

    def set_mesh(self, mesh):
        """Attach a device mesh; invalidates the jitted step so it re-traces

        with sharding constraints."""
        self.mesh = mesh
        self._jitted_apply = None


def add_run_function(model):
    """Attach the reference-style ``run`` to a duck-typed custom model.

    The model must provide input_adapter / __call__ (or forward) /
    output_adapter (reference: rmvd/models/factory.py:32-61
    `prepare_custom_model`).
    """
    if hasattr(model, "run"):
        return model

    def run(images, keyview_idx, poses=None, intrinsics=None, depth_range=None, **_):
        no_batch_dim = images[0].ndim == 3
        if no_batch_dim:
            images, keyview_idx, poses, intrinsics, depth_range = add_batch_dim(
                [images, keyview_idx, poses, intrinsics, depth_range]
            )
        sample = model.input_adapter(
            images=images,
            keyview_idx=keyview_idx,
            poses=poses,
            intrinsics=intrinsics,
            depth_range=depth_range,
        )
        forward = getattr(model, "forward", None) or model
        model_output = forward(**sample)
        pred, aux = model.output_adapter(model_output)
        if no_batch_dim:
            pred, aux = remove_batch_dim((pred, aux))
        return pred, aux

    model.run = run
    return model
