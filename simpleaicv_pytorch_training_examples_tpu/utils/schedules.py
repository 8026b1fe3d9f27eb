"""Closed-form learning-rate schedules.

Replicates the math of the reference's hand-rolled per-iteration Scheduler
(/root/reference/tools/utils.py:205-289): a linear warmup over
`warm_up_epochs`, then one of MultiStepLR / CosineLR / PolyLR computed from
scratch at every step from the *fractional* epoch
``epoch_frac = step / steps_per_epoch`` (the reference calls
``scheduler.step(optimizer, iter/iters + epoch - 1)``).

The returned schedule maps an integer optax step count -> lr *multiplier*
(1.0 at init-lr). Per-param-group init-lr scaling is applied by the optimizer
factory via `optax.multi_transform` labels, so the schedule itself stays a
single scalar function and the whole lr computation lives inside the jitted
update (no host->device lr pushes per step).
"""

import math
from typing import Callable

import jax.numpy as jnp

SUPPORTED_SCHEDULERS = ("MultiStepLR", "CosineLR", "PolyLR")


def build_schedule(scheduler_name: str,
                   scheduler_parameters: dict,
                   epochs: int,
                   steps_per_epoch: int,
                   lr: float = 1.0) -> Callable:
    """Return ``f(step) -> multiplier`` (jnp scalar), traceable under jit.

    `lr` is the base lr, used only to convert the reference's *absolute*
    `min_lr` floor into a multiplier ratio.
    """
    assert scheduler_name in SUPPORTED_SCHEDULERS, "Unsupported scheduler!"
    warm_up_epochs = scheduler_parameters["warm_up_epochs"]
    assert warm_up_epochs >= 0, "Illegal warm_up_epochs!"
    assert epochs > 0, "Illegal epochs!"
    assert steps_per_epoch > 0, "Illegal steps_per_epoch!"

    if scheduler_name == "MultiStepLR":
        gamma = scheduler_parameters["gamma"]
        milestones = tuple(scheduler_parameters["milestones"])

        def multiplier(epoch_frac):
            # count of milestones <= epoch_frac, as a traced value
            decays = sum(
                jnp.where(epoch_frac >= m, 1, 0) for m in milestones)
            return jnp.asarray(gamma, jnp.float32)**decays

    elif scheduler_name == "CosineLR":
        min_lr_ratio = scheduler_parameters.get("min_lr", 0.0) / lr

        def multiplier(epoch_frac):
            progress = (epoch_frac - warm_up_epochs) / max(
                epochs - warm_up_epochs, 1e-8)
            cos = 0.5 * (jnp.cos(progress * math.pi) + 1.0)
            return cos * (1.0 - min_lr_ratio) + min_lr_ratio

    else:  # PolyLR
        power = scheduler_parameters["power"]
        min_lr_ratio = scheduler_parameters.get("min_lr", 0.0) / lr

        def multiplier(epoch_frac):
            progress = (epoch_frac - warm_up_epochs) / max(
                epochs - warm_up_epochs, 1e-8)
            poly = (1.0 - progress)**power
            return poly * (1.0 - min_lr_ratio) + min_lr_ratio

    def schedule(step):
        epoch_frac = jnp.asarray(step, jnp.float32) / steps_per_epoch
        warm = epoch_frac / max(warm_up_epochs, 1e-8)
        main = multiplier(epoch_frac)
        if warm_up_epochs > 0:
            return jnp.where(epoch_frac < warm_up_epochs, warm, main)
        return main

    return schedule


def schedule_value(scheduler_name: str, scheduler_parameters: dict,
                   epochs: int, lr: float, epoch_frac: float) -> float:
    """Pure-python mirror (for logging / tests): lr at a fractional epoch.

    Matches the reference's `Scheduler.current_lr` bookkeeping
    (/root/reference/tools/utils.py:264-285) where min_lr is an absolute lr.
    """
    warm_up_epochs = scheduler_parameters["warm_up_epochs"]
    if warm_up_epochs > 0 and epoch_frac < warm_up_epochs:
        return epoch_frac / warm_up_epochs * lr
    if scheduler_name == "MultiStepLR":
        gamma = scheduler_parameters["gamma"]
        milestones = scheduler_parameters["milestones"]
        return gamma**len([m for m in milestones if m <= epoch_frac]) * lr
    min_lr = scheduler_parameters.get("min_lr", 0.0)
    progress = (epoch_frac - warm_up_epochs) / (epochs - warm_up_epochs)
    if scheduler_name == "CosineLR":
        return 0.5 * (math.cos(progress * math.pi) + 1.0) * (lr -
                                                             min_lr) + min_lr
    if scheduler_name == "PolyLR":
        power = scheduler_parameters["power"]
        return ((1.0 - progress)**power) * (lr - min_lr) + min_lr
    raise ValueError(f"Unsupported scheduler {scheduler_name}")
