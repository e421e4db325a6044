"""Backend/platform selection helper for the CLIs.

In some managed environments jax is pre-imported at interpreter startup
(sitecustomize), so ``JAX_PLATFORMS`` set by the user is ignored. The
portable way to pin computation to a backend after import is to set the
default device; all un-annotated arrays and jitted computations then run
there. CLI entry points expose this as ``--platform cpu|tpu``.
"""

from __future__ import annotations


def enable_compilation_cache(path: str = "/root/.cache/jax") -> None:
    """Activate jax's persistent compilation cache at ``path``.

    Setting ``JAX_COMPILATION_CACHE_DIR`` in ``os.environ`` is ineffective
    when jax was already imported at interpreter startup (sitecustomize);
    the config must be updated through ``jax.config`` after import. Safe to
    call multiple times.
    """
    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.1)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    except Exception:
        # older jax without these flags: fall back to env (effective only
        # if jax was not imported yet)
        import os

        os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", path)


def force_platform(name: str | None) -> None:
    """Pin jax's default device to the first device of backend ``name``.

    No-op when ``name`` is falsy. Raises RuntimeError with the available
    backends if the requested one is absent.
    """
    if not name:
        return
    import jax

    try:
        device = jax.devices(name)[0]
    except RuntimeError as e:
        raise RuntimeError(
            f"Backend {name!r} not available: {e}"
        ) from e
    jax.config.update("jax_default_device", device)


def add_platform_arg(parser) -> None:
    """Attach the shared ``--platform`` argument to an argparse parser."""
    parser.add_argument(
        "--platform",
        default=None,
        help="Force a jax backend (cpu | tpu). Needed instead of JAX_PLATFORMS "
        "in environments where jax is pre-imported at interpreter startup.",
    )
