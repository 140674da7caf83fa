"""Learning-rate schedules (optax), matching the reference's options
(models/generic_reg_model.py:29-63, models/scheduler/warmup.py):

- 'step': StepLR — lr * gamma^(floor(step / step_size)),
  params = [step_size, gamma]
- 'warmup': linear warmup to base_lr over warmup_steps, then smooth
  exponential decay with per-step factor exp(log(decay_factor)/decay_steps),
  params = [warmup_steps, decay_steps, decay_factor]
- 'none': constant
"""
from __future__ import annotations

import math
from typing import Optional, Sequence

import optax


def make_schedule(cfg) -> optax.Schedule:
    kind = cfg.get("scheduler", None)
    base_lr = float(cfg["base_lr"])
    params: Optional[Sequence] = cfg.get("scheduler_param")

    if kind in (None, "none"):
        return optax.constant_schedule(base_lr)

    if kind == "step":
        step_size, gamma = int(params[0]), float(params[1])
        return lambda step: base_lr * gamma ** (step // step_size)

    if kind == "warmup":
        warmup_steps = int(params[0])
        gamma = 1.0 if len(params) == 1 else math.exp(
            math.log(float(params[2])) / float(params[1]))

        def sched(step):
            import jax.numpy as jnp
            warm = jnp.minimum(step / warmup_steps, 1.0) * base_lr
            decay = base_lr * gamma ** (step - warmup_steps)
            return jnp.where(step < warmup_steps, warm, decay)

        return sched

    raise ValueError(f"unknown scheduler {kind!r}")


def make_optimizer(cfg) -> optax.GradientTransformation:
    """AdamW/Adam + global-norm grad clipping (trainer.py:124-125 uses
    clip_grad_norm_(grad_clip))."""
    sched = make_schedule(cfg)
    name = cfg.get("optimizer", "AdamW")
    wd = float(cfg.get("weight_decay", 0.0))
    if name == "AdamW":
        opt = optax.adamw(sched, weight_decay=wd)
    elif name == "Adam":
        # torch Adam's weight_decay is L2-on-gradient, not decoupled
        opt = optax.chain(
            optax.add_decayed_weights(wd) if wd else optax.identity(),
            optax.adam(sched))
    elif name == "SGD":
        opt = optax.sgd(sched)
    else:
        raise ValueError(f"unknown optimizer {name!r}")

    clip = cfg.get("grad_clip", 0.0)
    if clip:
        opt = optax.chain(optax.clip_by_global_norm(float(clip)), opt)

    # optional gradient accumulation (absent in the reference — SURVEY
    # §2.10; exposed here for large-cloud TPU training where the
    # per-step pair batch is memory-bound)
    accum = int(cfg.get("accum_steps", 1) or 1)
    if accum > 1:
        opt = optax.MultiSteps(opt, every_k_schedule=accum)
    return opt
