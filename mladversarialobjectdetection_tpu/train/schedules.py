"""Learning-rate schedules for supervised detector training.

Behavioral parity with reference tf2/train_lib.py:51-173: stepwise /
cosine / polynomial decay, each with linear warmup from lr_warmup_init
over lr_warmup_epoch epochs.
"""
from __future__ import annotations

import jax.numpy as jnp
import optax


def _with_warmup(base_fn, warmup_init: float, peak_lr: float,
                 warmup_steps: int):
    def schedule(step):
        warm = warmup_init + (peak_lr - warmup_init) * (
            step / jnp.maximum(warmup_steps, 1))
        return jnp.where(step < warmup_steps, warm, base_fn(step))
    return schedule


def cosine_lr(peak_lr: float, warmup_init: float, warmup_steps: int,
              total_steps: int):
    def base(step):
        decay_steps = jnp.maximum(total_steps - warmup_steps, 1)
        # reference quirk kept for exact parity: the cosine phase uses the
        # RAW step over (total - warmup) — not (step - warmup) — so the
        # post-warmup value starts slightly below peak
        # (train_lib.py:110-117)
        frac = jnp.clip(step / decay_steps, 0.0, 1.0)
        return 0.5 * peak_lr * (1 + jnp.cos(jnp.pi * frac))
    return _with_warmup(base, warmup_init, peak_lr, warmup_steps)


def stepwise_lr(peak_lr: float, warmup_init: float, warmup_steps: int,
                first_drop_step: int, second_drop_step: int):
    def base(step):
        lr = jnp.where(step < first_drop_step, peak_lr, peak_lr * 0.1)
        return jnp.where(step < second_drop_step, lr, peak_lr * 0.01)
    return _with_warmup(base, warmup_init, peak_lr, warmup_steps)


def polynomial_lr(peak_lr: float, warmup_init: float, warmup_steps: int,
                  total_steps: int, power: float = 0.9):
    def base(step):
        frac = jnp.clip(step / jnp.maximum(total_steps, 1), 0.0, 1.0)
        return peak_lr * (1 - frac) ** power
    return _with_warmup(base, warmup_init, peak_lr, warmup_steps)


def from_config(config, steps_per_epoch: int):
    """Build the schedule named by config.lr_decay_method."""
    method = config.get("lr_decay_method", "cosine") or "cosine"
    peak = config.learning_rate
    warm_init = config.lr_warmup_init
    warm_steps = int(config.lr_warmup_epoch * steps_per_epoch)
    total = int(config.num_epochs * steps_per_epoch)
    if method == "cosine":
        return cosine_lr(peak, warm_init, warm_steps, total)
    if method == "stepwise":
        return stepwise_lr(
            peak, warm_init, warm_steps,
            int(config.get("first_lr_drop_epoch", 200.0) * steps_per_epoch),
            int(config.get("second_lr_drop_epoch", 250.0) * steps_per_epoch))
    if method == "polynomial":
        return polynomial_lr(peak, warm_init, warm_steps, total,
                             config.get("poly_lr_power", 0.9))
    raise ValueError(f"unknown lr_decay_method {method}")


def make_optimizer(config, steps_per_epoch: int) -> optax.GradientTransformation:
    """Optimizer stack: clip-by-global-norm + sgd(momentum)/adam with the
    configured schedule (train_lib.py:176-199)."""
    schedule = from_config(config, steps_per_epoch)
    opt_name = config.get("optimizer", "sgd") or "sgd"
    if opt_name == "sgd":
        opt = optax.sgd(schedule, momentum=config.momentum)
    elif opt_name == "adam":
        opt = optax.adam(schedule)
    else:
        raise ValueError(f"optimizer {opt_name}")
    clip = config.get("clip_gradients_norm", 0.0) or 0.0
    if clip > 0:
        return optax.chain(optax.clip_by_global_norm(clip), opt)
    return opt
