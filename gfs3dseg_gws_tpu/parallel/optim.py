"""Optimizers mirroring the reference's schedules and param groups.

Reference train.py:426-439: Adam with the encoder at 0.1x base_lr and all
heads/prototypes at base_lr, stepped by StepLR(step_size, gamma) per EPOCH.
Reference pretrain: Adam(lr, weight_decay) + StepLR(50, 0.5).
"""
from __future__ import annotations

from typing import Callable

import optax


def step_lr(base_lr: float, step_size_epochs: int, gamma: float,
            steps_per_epoch: int) -> Callable:
    """StepLR as a function of the optimizer step count."""

    def schedule(count):
        epoch = count // steps_per_epoch
        return base_lr * (gamma ** (epoch // step_size_epochs))

    return schedule


def step_learning_rate(base_lr: float, epoch: int, step_epoch: int,
                       multiplier: float = 0.1) -> float:
    """Reference util/util.py:45-49 (unused by the main pipeline but part of
    the public utility surface)."""
    return base_lr * (multiplier ** (epoch // step_epoch))


def poly_learning_rate(base_lr: float, curr_iter: int, max_iter: int,
                       power: float = 0.9) -> float:
    """Reference util/util.py:52-55."""
    return base_lr * (1 - float(curr_iter) / max_iter) ** power


def make_gfs_optimizer(base_lr: float, steps_per_epoch: int,
                       step_size: int = 50, gamma: float = 0.5,
                       encoder_lr_scale: float = 0.1,
                       weight_decay: float = 0.0) -> optax.GradientTransformation:
    """Adam with a reduced-LR encoder group (reference train.py:426-435)."""

    def _adam(scale):
        sched = step_lr(base_lr * scale, step_size, gamma, steps_per_epoch)
        if weight_decay > 0:
            # torch Adam's weight_decay is L2-added-to-grad, NOT decoupled
            # AdamW decay — same construction as make_pretrain_optimizer
            # (the reference GFS driver passes no weight_decay, train.py:426,
            # so this only fires for explicit --weight_decay runs)
            return optax.chain(optax.add_decayed_weights(weight_decay),
                               optax.adam(sched))
        return optax.adam(sched)

    def label_fn(params):
        import jax

        def top(path, _):
            return "encoder" if path[0].key == "encoder" else "rest"

        return jax.tree_util.tree_map_with_path(top, params)

    return optax.multi_transform(
        {"encoder": _adam(encoder_lr_scale), "rest": _adam(1.0)}, label_fn)


def make_pretrain_optimizer(lr: float, steps_per_epoch: int,
                            weight_decay: float = 1e-4,
                            step_size: int = 50, gamma: float = 0.5
                            ) -> optax.GradientTransformation:
    """Adam + weight decay + StepLR (reference pretrain/runs/pre_train.py:133-137).

    torch Adam's weight_decay is L2-added-to-grad, not decoupled AdamW decay;
    optax.add_decayed_weights BEFORE adam reproduces torch semantics.
    """
    sched = step_lr(lr, step_size, gamma, steps_per_epoch)
    return optax.chain(
        optax.add_decayed_weights(weight_decay),
        optax.adam(sched),
    )
