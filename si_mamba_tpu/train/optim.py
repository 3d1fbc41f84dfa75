"""Optimizer + LR schedule builders (optax), matching the reference's
``build_opti_sche`` (tools/builder.py:55-109):

- AdamW with the weight-decay skip-list: no decay for 1-D params, biases, and
  any param whose path contains 'token' (builder.py:58-72);
- timm CosineLRScheduler semantics: per-EPOCH stepped linear warmup from
  warmup_lr_init to base over ``initial_epochs``, then cosine from base to
  lr_min over the remaining epochs (cycle_limit=1, t_in_epochs=True);
- global-norm gradient clipping (config ``grad_norm_clip``).
"""

from __future__ import annotations

import math
from typing import Any

import jax
import jax.numpy as jnp
import optax


def wd_mask(params: Any) -> Any:
    """True (apply weight decay) for >=2-D params not named *bias*/*token*."""

    def keep(path, leaf):
        names = [p.key for p in path if hasattr(p, "key")]
        joined = "/".join(str(n) for n in names).lower()
        if leaf.ndim <= 1 or "bias" in joined or "token" in joined:
            return False
        return True

    return jax.tree_util.tree_map_with_path(keep, params)


def cosine_warmup_epoch_schedule(base_lr: float, epochs: int, warmup_epochs: int,
                                 steps_per_epoch: int, lr_min: float = 1e-6,
                                 warmup_lr_init: float = 1e-6):
    """timm 0.4.5 CosineLRScheduler as an optax schedule on steps — the EXACT
    effective per-epoch lr sequence of the reference training loop.

    Reference semantics (tools/builder.py:86-95 + runner_finetune.py:252-256):
    the scheduler is constructed with ``warmup_prefix=False`` (default) and
    ``scheduler.step(epoch)`` runs at the END of epoch ``epoch``, so epoch e
    trains at ``_get_lr(max(e-1, 0))`` where (timm 0.4.5, cycle 0)::

        _get_lr(t) = warmup_lr_init + t * (base - init) / warmup_t   t < warmup_t
                   = lr_min + (base - lr_min)/2 * (1 + cos(pi*t/t_initial))  else

    Note the cosine runs over t/t_initial with t NOT shifted by warmup
    (warmup_prefix=False) — the warmup epochs eat into the cosine cycle.
    Pinned against a replicated-timm torch oracle in tests/test_full_parity.
    """

    def schedule(step):
        epoch = jnp.floor_divide(step, steps_per_epoch).astype(jnp.float32)
        t = jnp.maximum(epoch - 1.0, 0.0)  # step(epoch) lags one epoch
        warm = warmup_lr_init + (base_lr - warmup_lr_init) * t / max(warmup_epochs, 1)
        cos = lr_min + 0.5 * (base_lr - lr_min) * (1.0 + jnp.cos(jnp.pi * t / max(epochs, 1)))
        return jnp.where(t < warmup_epochs, warm, cos)

    return schedule


def lambda_lr_schedule(base_lr: float, steps_per_epoch: int, *,
                       decay_step: float, lr_decay: float,
                       lowest_decay: float):
    """Reference 'LambdaLR' (utils/misc.py:28-34):
    lr(e) = base · max(lr_decay^(e / decay_step), lowest_decay), with the
    same one-epoch lag as CosLR (``scheduler.step(epoch)`` runs at the end
    of epoch e, so epoch e trains at the epoch-(e-1) value)."""

    def schedule(step):
        epoch = jnp.floor_divide(step, steps_per_epoch).astype(jnp.float32)
        t = jnp.maximum(epoch - 1.0, 0.0)
        return base_lr * jnp.maximum(lr_decay ** (t / decay_step), lowest_decay)

    return schedule


def bn_momentum_schedule(*, bn_momentum: float = 0.1, bn_decay: float = 0.5,
                         decay_step: float = 40, lowest_decay: float = 0.01):
    """Reference 'Lambda' BN-momentum scheduler (utils/misc.py:37-43,103-133):
    torch momentum m(e) = max(bn_momentum · bn_decay^(e/decay_step),
    lowest_decay). Returns a function epoch -> FLAX momentum (= 1 - torch
    momentum; flax BatchNorm keeps ``momentum`` of the running average).
    Feed the value to the model's ``bn_momentum`` argument each epoch."""

    def schedule(epoch: float) -> float:
        m_torch = max(bn_momentum * bn_decay ** (epoch / decay_step), lowest_decay)
        return 1.0 - m_torch

    return schedule


def build_optimizer(params: Any, *, opt_type: str = "AdamW", lr: float = 3e-4,
                    weight_decay: float = 0.05, epochs: int = 300,
                    warmup_epochs: int = 10, steps_per_epoch: int = 1,
                    grad_clip: float | None = 10.0,
                    sched_type: str = "CosLR",
                    step_per_update: int = 1,
                    sched_kwargs: dict | None = None) -> tuple[optax.GradientTransformation, Any]:
    """Returns (tx, schedule). ``params`` is used only to build the wd mask."""
    if sched_type == "CosLR":
        schedule = cosine_warmup_epoch_schedule(lr, epochs, warmup_epochs, steps_per_epoch)
    elif sched_type == "LambdaLR":
        kw = sched_kwargs or {}
        schedule = lambda_lr_schedule(
            lr, steps_per_epoch, decay_step=float(kw.get("decay_step", 40)),
            lr_decay=float(kw.get("lr_decay", 0.7)),
            lowest_decay=float(kw.get("lowest_decay", 0.02)))
    elif sched_type == "StepLR":
        # torch StepLR(step_size, gamma) — epochs arg reused as step_size;
        # same one-epoch lag as CosLR/LambdaLR (scheduler.step(epoch) runs
        # at the END of epoch e, so epoch e trains at the epoch-(e-1) value)
        def schedule(step):
            epoch = jnp.floor_divide(step, steps_per_epoch)
            t = jnp.maximum(epoch - 1, 0)
            return lr * (0.1 ** (t // epochs))
    elif sched_type == "const":
        schedule = lambda step: lr
    else:
        raise NotImplementedError(sched_type)

    if opt_type == "AdamW":
        opt = optax.adamw(schedule, b1=0.9, b2=0.999, eps=1e-8,
                          weight_decay=weight_decay, mask=wd_mask)
    elif opt_type == "Adam":
        opt = optax.adam(schedule)
    elif opt_type == "SGD":
        opt = optax.chain(optax.trace(decay=0.9, nesterov=True),
                          optax.scale_by_learning_rate(schedule))
    else:
        raise NotImplementedError(opt_type)

    if grad_clip is not None and grad_clip > 0:
        tx = optax.chain(optax.clip_by_global_norm(grad_clip), opt)
    else:
        tx = opt
    if step_per_update > 1:
        # gradient accumulation (reference config ``step_per_update``,
        # tools/runner_finetune.py:222-228)
        tx = optax.MultiSteps(tx, every_k_schedule=step_per_update)
    return tx, schedule
