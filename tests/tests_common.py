"""Shared test helpers."""

import numpy as np


def random_pose_np(rng, angle_scale=0.2, trans_scale=0.5):
    aa = rng.randn(3) * angle_scale
    angle = np.linalg.norm(aa)
    axis = aa / (angle + 1e-12)
    K = np.array(
        [[0, -axis[2], axis[1]], [axis[2], 0, -axis[0]], [-axis[1], axis[0], 0]]
    )
    R = np.eye(3) + np.sin(angle) * K + (1 - np.cos(angle)) * K @ K
    T = np.eye(4)
    T[:3, :3] = R
    T[:3, 3] = rng.randn(3) * trans_scale
    return T.astype(np.float32)


def install_reference_stubs():
    """Make the reference rmvd package importable on CPU torch.

    Installs stub modules for dependencies absent in this environment.
    The skimage.transform.resize stub dispatches to this framework's
    numpy resizes (robustmvd_tpu/utils/image.py) so reference code paths
    that resize (eval pred->GT order-0, ResizeInputs order-1) run with
    the same interpolation primitive as the TPU engine — engine-parity
    tests therefore compare engine *logic*, with one shared resampler.
    """
    import sys
    import types

    REF = "/root/reference"
    if REF not in sys.path:
        sys.path.insert(0, REF)
    import torch

    pytoml = types.ModuleType("pytoml")
    pytoml.load = lambda f: {}
    sys.modules.setdefault("pytoml", pytoml)

    six = types.ModuleType("torch._six")
    six.string_classes = (str, bytes)
    sys.modules.setdefault("torch._six", six)

    from robustmvd_tpu.utils.image import resize_bilinear, resize_nearest

    def _resize(image, output_shape, order=1, anti_aliasing=None, **_):
        out = tuple(int(s) for s in output_shape)
        image = np.asarray(image)
        assert image.shape[: -2] == out[: -2], (image.shape, out)
        if order == 0:
            return resize_nearest(image, out[-2:])
        return resize_bilinear(image, out[-2:])

    skimage = types.ModuleType("skimage")
    sk_t = types.ModuleType("skimage.transform")
    sk_t.resize = _resize
    skimage.transform = sk_t
    sys.modules.setdefault("skimage", skimage)
    sys.modules.setdefault("skimage.transform", sk_t)
    # an earlier import may have installed a non-functional resize:
    if sys.modules["skimage.transform"].resize is None:
        sys.modules["skimage.transform"].resize = _resize

    tv = types.ModuleType("torchvision")
    tv_t = types.ModuleType("torchvision.transforms")

    class _Compose:
        def __init__(self, ts):
            self.ts = ts

        def __call__(self, x):
            for t in self.ts:
                x = t(x)
            return x

    tv_t.Compose = _Compose
    tv_t.ColorJitter = lambda **kw: (lambda x: x)
    tv_t.ToTensor = lambda: (lambda x: x)
    tv_t.Normalize = lambda **kw: (lambda x: x)
    tv.transforms = tv_t
    sys.modules.setdefault("torchvision", tv)
    sys.modules.setdefault("torchvision.transforms", tv_t)

    kornia = types.ModuleType("kornia")
    k_u = types.ModuleType("kornia.utils")

    def create_meshgrid(h, w, normalized_coordinates=True, device=None, dtype=None):
        xs = torch.arange(w, dtype=torch.float32)
        ys = torch.arange(h, dtype=torch.float32)
        if normalized_coordinates:
            xs = 2 * xs / (w - 1) - 1
            ys = 2 * ys / (h - 1) - 1
        gy, gx = torch.meshgrid(ys, xs, indexing="ij")
        return torch.stack([gx, gy], dim=-1)[None]

    k_u.create_meshgrid = create_meshgrid
    kornia.utils = k_u
    sys.modules.setdefault("kornia", kornia)
    sys.modules.setdefault("kornia.utils", k_u)

    ed = types.ModuleType("easydict")

    class EasyDict(dict):
        def __init__(self, d=None, **kw):
            d = dict(d or {})
            d.update(kw)
            for k, v in d.items():
                setattr(self, k, v)

        def __setattr__(self, k, v):
            super().__setattr__(k, v)
            self[k] = v

    ed.EasyDict = EasyDict
    sys.modules.setdefault("easydict", ed)
    sys.modules.setdefault("wandb", types.ModuleType("wandb"))

    # CPU-only torch: the eval engine's unconditional CUDA memory-stat
    # resets raise; make them no-ops (measurement plumbing, not logic).
    if not torch.cuda.is_available():
        torch.cuda.reset_peak_memory_stats = lambda *a, **k: None
        torch.cuda.reset_accumulated_memory_stats = lambda *a, **k: None

    # numpy 2 raises on nan_to_num(scalar, copy=False) (used by the
    # reference's valid_mean / _preprocess_sample); restore the numpy-1
    # behavior (silent copy) for non-ndarray inputs — value-identical.
    if not getattr(np.nan_to_num, "_rmvd_tpu_shim", False):
        _orig_nan_to_num = np.nan_to_num

        def _nan_to_num(x, copy=True, **kw):
            if not copy and not isinstance(x, np.ndarray):
                copy = True
            return _orig_nan_to_num(x, copy=copy, **kw)

        _nan_to_num._rmvd_tpu_shim = True
        np.nan_to_num = _nan_to_num
