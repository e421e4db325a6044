"""Model factory (reference interface parity: rmvd/models/factory.py:8-61)."""

from __future__ import annotations

from .helpers import add_run_function
from .registry import get_model


def create_model(name, pretrained=True, weights=None, train=False, num_gpus=1, **kwargs):
    """Create a model by registry name.

    Args:
        name: registered model name.
        pretrained: load default pretrained weights if available.
        weights: path to custom weights (torch ``.pt`` checkpoints are
            converted on the fly; flax ``.msgpack``/orbax checkpoints load
            natively). Overrides ``pretrained``.
        train: initialize in train mode.
        num_gpus: accepted for CLI parity with the reference; device
            parallelism is mesh-based (see robustmvd_tpu.parallel), so this
            arg is ignored beyond validation.
    """
    entrypoint = get_model(name)
    model = entrypoint(pretrained=pretrained, weights=weights, train=train, **kwargs)
    model.name = name
    return model


def prepare_custom_model(model, train=False, num_gpus=1):
    """Prepare a duck-typed custom model (input_adapter/__call__/
    output_adapter) for use with the eval/train engines

    (reference: rmvd/models/factory.py:32-61).
    """
    add_run_function(model)
    if not hasattr(model, "name"):
        model.name = type(model).__name__
    return model


def cli_model_kwargs(model_name, dtype=None, no_remat=False):
    """Translate CLI-level model options into create_model kwargs.

    ``--dtype`` and ``--no_remat`` only exist on the robust_mvd family;
    reject them for other models with a clear message instead of a
    TypeError deep inside the entrypoint.
    """
    kwargs = {}
    wants = dtype is not None or no_remat
    if wants and not str(model_name).startswith("robust_mvd"):
        raise SystemExit(
            "--dtype/--no_remat are only supported by the robust_mvd family, "
            f"not {model_name}"
        )
    if dtype is not None:
        kwargs["dtype"] = dtype
    if no_remat:
        # trades activation memory for speed: at the paper recipe (batch 4,
        # 384x768) the pixelscan correlation already bounds the big buffers,
        # so disabling the outer remat is faster (66 vs 80 ms/step bf16 on
        # v5e) and still fits HBM; larger batches (>=16) need remat.
        kwargs["remat"] = False
    return kwargs
