"""Host-side data plumbing: collation, numpy/jax conversion, batched view indexing.

Capability parity with the reference framework's tensor plumbing
(reference: rmvd/utils/utils.py:126-369 — `to_torch`/`to_numpy`/
`numpy_collate`/`select_by_index`/`exclude_index`/`batched_index`), but
jax-native: device transfer happens once at the jit boundary, and the
"universal data contract" stays numpy on the host.

The data contract (reference: rmvd/data/README.md "Data format"):
a sample is a dict with ``images`` (list of 3HW float32, 0..255), ``poses``
(list of 4x4 cur->key), ``intrinsics`` (list of 3x3), ``keyview_idx`` (int),
``depth``/``invdepth`` (1HW), ``depth_range`` ((min, max)).
"""

from __future__ import annotations

import collections.abc

import numpy as np

try:  # jax is optional for the pure-host data path
    import jax
    import jax.numpy as jnp

    _HAS_JAX = True
except ImportError:  # pragma: no cover
    _HAS_JAX = False


def numpy_collate(batch):
    """Collate a list of samples into a batched sample.

    Dicts are collated per key; lists are transposed (a list of per-view
    arrays stays a list, with each element batched); arrays and scalars are
    stacked along a new leading batch axis. Mirrors the reference collate
    semantics (rmvd/utils/utils.py:170-237).
    """
    if batch is None:
        return None

    elem = batch[0]

    if elem is None:
        assert all(e is None for e in batch)
        return None

    if isinstance(elem, np.ndarray):
        return np.stack(batch, 0)

    if isinstance(elem, (np.generic,)):
        return np.array(batch)

    if isinstance(elem, float):
        return np.array(batch, dtype=np.float32)

    if isinstance(elem, (int, np.integer)):
        return np.array(batch)

    if isinstance(elem, str):
        return list(batch)

    if isinstance(elem, collections.abc.Mapping):
        return {key: numpy_collate([d[key] for d in batch]) for key in elem}

    if isinstance(elem, tuple):
        return [numpy_collate(samples) for samples in zip(*batch)]

    if isinstance(elem, collections.abc.Sequence):
        lengths = {len(e) for e in batch}
        if len(lengths) != 1:
            raise RuntimeError(
                "numpy_collate: each list in a batch must have equal length, "
                f"got lengths {sorted(lengths)}"
            )
        return [numpy_collate(samples) for samples in zip(*batch)]

    raise TypeError(f"numpy_collate: unsupported element type {type(elem)}")


def add_batch_dim(sample):
    """Wrap a single (unbatched) sample into a batch of one."""
    return numpy_collate([sample])


def remove_batch_dim(data):
    """Strip the leading batch axis from every array in a nested structure.

    Inverse of :func:`add_batch_dim` for batch size 1 (reference:
    rmvd/models/helpers.py:28-62).
    """
    if data is None:
        return None
    if isinstance(data, np.ndarray):
        return data[0]
    if isinstance(data, collections.abc.Mapping):
        return {k: remove_batch_dim(v) for k, v in data.items()}
    if isinstance(data, (list, tuple)):
        return [remove_batch_dim(v) for v in data]
    if _HAS_JAX and isinstance(data, jax.Array):
        return np.asarray(data)[0]
    return data


def to_numpy(data):
    """Recursively convert jax arrays (and torch tensors if present) to numpy."""
    if data is None:
        return None
    if isinstance(data, np.ndarray):
        return data
    if _HAS_JAX and isinstance(data, jax.Array):
        return np.asarray(data)
    if hasattr(data, "detach") and hasattr(data, "cpu"):  # torch tensor
        return data.detach().cpu().numpy()
    if isinstance(data, collections.abc.Mapping):
        return {k: to_numpy(v) for k, v in data.items()}
    if isinstance(data, (list, tuple)):
        return [to_numpy(v) for v in data]
    return data


def to_jax(data, dtype=None):
    """Recursively convert numpy arrays to jax arrays (host->device copy)."""
    if data is None:
        return None
    if isinstance(data, np.ndarray):
        arr = jnp.asarray(data)
        if dtype is not None and np.issubdtype(data.dtype, np.floating):
            arr = arr.astype(dtype)
        return arr
    if isinstance(data, collections.abc.Mapping):
        return {k: to_jax(v, dtype) for k, v in data.items()}
    if isinstance(data, (list, tuple)):
        return [to_jax(v, dtype) for v in data]
    return data


def select_by_index(views, idx):
    """Select one element from a list of (possibly batched) views.

    ``idx`` may be an int (same index for the whole batch) or a per-sample
    iterable of indices (reference: rmvd/utils/utils.py:298-321).
    """
    if isinstance(idx, (int, np.integer)):
        return views[int(idx)]
    indices = np.asarray(idx).reshape(-1)
    picked = [views[int(i)][b] for b, i in enumerate(indices)]
    return _stack(picked)


def exclude_index(views, exclude_idx):
    """All elements of a view list except one index, per batch sample.

    (reference: rmvd/utils/utils.py:324-347)
    """
    if isinstance(exclude_idx, (int, np.integer)):
        return [v for i, v in enumerate(views) if i != int(exclude_idx)]
    exclude_indices = np.asarray(exclude_idx).reshape(-1)
    per_sample = [
        [v[b] for i, v in enumerate(views) if i != int(e)]
        for b, e in enumerate(exclude_indices)
    ]
    if not per_sample or not all(len(p) > 0 for p in per_sample):
        return per_sample
    transposed = list(zip(*per_sample))
    return [_stack(list(group)) for group in transposed]


def batched_index(views, elements):
    """Index of each element within the view list, per batch sample.

    (reference: rmvd/utils/utils.py:350-369)
    """
    out = []
    for b, ele in enumerate(elements):
        batch_list = [v[b] for v in views]
        out.append(batch_list.index(ele))
    return np.array(out)


def _stack(items):
    if isinstance(items[0], np.ndarray):
        return np.stack(items, 0)
    if _HAS_JAX and isinstance(items[0], jax.Array):
        return jnp.stack(items, 0)
    return np.array(items)
