"""Training base class (reference parity: rmvd/train/training.py:4-17).

The reference keeps an (empty) ``Training`` placeholder base that
``MultiViewDepthTraining`` conceptually implements; kept here so user code
that isinstance-checks or subclasses it keeps working.
"""


class Training:
    """Marker base class for training engines."""

    def __call__(self, *args, **kwargs):  # pragma: no cover - interface stub
        raise NotImplementedError
