"""Optimizer/scheduler factories (reference parity: rmvd/optim/factory.py:4-21)."""

from .registry import get_optimizer, get_scheduler


def create_optimizer(name, model=None, **kwargs):
    return get_optimizer(name)(model=model, **kwargs)


def create_scheduler(name, optimizer=None, **kwargs):
    return get_scheduler(name)(optimizer=optimizer, **kwargs)


def build_optax(optimizer_spec, scheduler_spec=None, grad_clip_max_norm=None):
    """Combine an OptimizerSpec + SchedulerSpec (+ grad clipping) into one

    optax GradientTransformation, plus the resolved schedule for logging.
    """
    import optax

    schedule = (
        scheduler_spec.schedule_fn(optimizer_spec.lr)
        if scheduler_spec is not None
        else optax.constant_schedule(optimizer_spec.lr)
    )
    tx = optimizer_spec.make(schedule)
    if grad_clip_max_norm is not None:
        tx = optax.chain(optax.clip_by_global_norm(grad_clip_max_norm), tx)
    return tx, schedule
