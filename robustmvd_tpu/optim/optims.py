"""Optimizers and LR schedules as optax transforms.

Reference parity (rmvd/optim/optims.py:6-37): ``adam`` (torch defaults),
``rmsprop`` (alpha=0.9), ``flownet_scheduler`` (MultiStepLR at
300k/400k/500k with gamma 0.5) and ``mvsnet_scheduler`` (per-step
exponential gamma 0.9999894640039382 ~= 0.9 per 10k steps).

In JAX the optimizer and schedule compose into one GradientTransformation;
``create_optimizer``/``create_scheduler`` keep the reference's two-step
string interface and the training engine combines them.
"""

from __future__ import annotations

import optax

from .registry import register_optimizer, register_scheduler


@register_optimizer
def adam(model=None, lr=1e-4, **_):
    """Adam with torch defaults (betas 0.9/0.999, eps 1e-8)."""

    def make(schedule=None):
        return optax.adam(schedule if schedule is not None else lr, b1=0.9, b2=0.999, eps=1e-8)

    return OptimizerSpec(name="adam", lr=lr, make=make)


@register_optimizer
def rmsprop(model=None, lr=1e-4, **_):
    """RMSprop with alpha (decay) 0.9, matching torch RMSprop(alpha=0.9)."""

    def make(schedule=None):
        return optax.rmsprop(schedule if schedule is not None else lr, decay=0.9, eps=1e-8)

    return OptimizerSpec(name="rmsprop", lr=lr, make=make)


@register_scheduler
def flownet_scheduler(optimizer=None, **_):
    """Halve the LR at iterations 300k, 400k and 500k."""

    def schedule_fn(base_lr):
        return optax.piecewise_constant_schedule(
            base_lr, {300_000: 0.5, 400_000: 0.5, 500_000: 0.5}
        )

    return SchedulerSpec(name="flownet_scheduler", schedule_fn=schedule_fn)


@register_scheduler
def mvsnet_scheduler(optimizer=None, **_):
    """Per-step exponential decay, factor 0.9 every 10k steps."""

    def schedule_fn(base_lr):
        return optax.exponential_decay(
            base_lr, transition_steps=1, decay_rate=0.9999894640039382
        )

    return SchedulerSpec(name="mvsnet_scheduler", schedule_fn=schedule_fn)


class OptimizerSpec:
    """An optimizer choice; ``make(schedule)`` yields the optax transform."""

    def __init__(self, name, lr, make):
        self.name = name
        self.lr = lr
        self.make = make


class SchedulerSpec:
    """An LR schedule choice; ``schedule_fn(base_lr)`` yields an optax schedule."""

    def __init__(self, name, schedule_fn):
        self.name = name
        self.schedule_fn = schedule_fn
