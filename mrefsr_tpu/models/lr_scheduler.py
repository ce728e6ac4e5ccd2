"""Learning-rate schedules as pure, jit-traceable step->multiplier fns.

Rebuild of reference basicsr/models/lr_scheduler.py (MultiStepRestartLR,
CosineAnnealingRestartLR) plus torch's plain MultiStepLR used by the
stage3 configs, and the linear warmup from base_model.update_learning_rate
(reference base_model.py:172-193). Schedules are baked into optax
(called with the traced optimizer step), so everything is jnp arithmetic.
"""
import math

import jax.numpy as jnp
import numpy as np


def multistep_lr(milestones, gamma=0.1):
    """lr_mult(step) = gamma ** #{milestones <= step} — torch MultiStepLR
    semantics with per-iteration stepping."""
    ms = jnp.asarray(sorted(int(m) for m in milestones), jnp.int32)

    def schedule(step):
        n = jnp.searchsorted(ms, jnp.asarray(step, jnp.int32),
                             side='right')
        return gamma ** n

    return schedule


def multistep_restart_lr(milestones, gamma=0.1, restarts=(0,),
                         restart_weights=(1,)):
    """MultiStepRestartLR (reference lr_scheduler.py:6-34): gamma decay at
    milestones; at each restart iteration the LR resets to base*weight
    and decay re-accumulates from there."""
    assert len(restarts) == len(restart_weights), (
        'restarts and their weights do not match.')
    ms = jnp.asarray(sorted(int(m) for m in milestones), jnp.int32)
    rs = jnp.asarray([int(r) for r in restarts], jnp.int32)
    ws = jnp.asarray(restart_weights, jnp.float32)

    def schedule(step):
        step = jnp.asarray(step, jnp.int32)
        active = rs <= step
        # most recent restart at or before step (0 if none)
        last_restart = jnp.max(jnp.where(active, rs, 0))
        # its weight (1.0 when no restart has fired)
        idx = jnp.argmax(jnp.where(active & (rs == last_restart),
                                   jnp.arange(len(restarts)) + 1, 0))
        weight = jnp.where(jnp.any(active), ws[idx], 1.0)
        n = (jnp.searchsorted(ms, step, side='right') -
             jnp.searchsorted(ms, last_restart, side='right'))
        return weight * gamma ** n

    return schedule


def cosine_annealing_restart_lr(periods, restart_weights=(1,), eta_min=0,
                                base_lr=1.0):
    """CosineAnnealingRestartLR (reference lr_scheduler.py:57-97).

    Returns a multiplier relative to base_lr; eta_min is absolute, so
    pass the group's base lr for exact parity when eta_min != 0.
    """
    assert len(periods) == len(restart_weights), (
        'periods and restart_weights should have the same length.')
    cumulative = np.cumsum(periods)
    cum = jnp.asarray(cumulative, jnp.int32)
    pers = jnp.asarray(periods, jnp.float32)
    ws = jnp.asarray(restart_weights, jnp.float32)
    starts = jnp.asarray(np.concatenate([[0], cumulative[:-1]]),
                         jnp.float32)
    ratio = eta_min / base_lr

    def schedule(step):
        step = jnp.asarray(step, jnp.int32)
        idx = jnp.minimum(jnp.searchsorted(cum, step, side='left'),
                          len(periods) - 1)
        weight = ws[idx]
        nearest_restart = starts[idx]
        period = pers[idx]
        return ratio + weight * 0.5 * (1 - ratio) * (
            1 + jnp.cos(jnp.pi * ((step - nearest_restart) / period)))

    return schedule


def with_warmup(schedule, warmup_iter=-1):
    """Linear warmup wrapper (reference base_model.py:172-193).

    ``step`` is the optax update count, 0 on the first optimizer step,
    i.e. step = current_iter - 1 in the reference's 1-based iteration.
    The reference ramps lr * current_iter / warmup_iter while
    current_iter < warmup_iter, so the first step gets 1/warmup (NOT 0)
    and the regular schedule takes over at current_iter == warmup_iter.
    """
    if warmup_iter is None or warmup_iter <= 0:
        return schedule

    def warmed(step):
        it = jnp.asarray(step) + 1  # 1-based current_iter
        return jnp.where(it < warmup_iter, it / warmup_iter,
                         schedule(step))

    return warmed


def build_schedule(scheduler_opt, warmup_iter=-1, base_lr=1.0):
    """Build a step->multiplier function from the YAML ``scheduler:``
    block (type: MultiStepLR | MultiStepRestartLR |
    CosineAnnealingRestartLR). ``base_lr`` is the primary group's base
    learning rate — needed because the reference's cosine ``eta_min`` is
    an ABSOLUTE floor (lr_scheduler.py:57-97), while these schedules
    return multipliers."""
    opt = dict(scheduler_opt or {})
    stype = opt.pop('type', 'MultiStepLR')
    if stype in ('MultiStepLR', 'MultiStepRestartLR'):
        milestones = opt.get('milestones', [])
        # the reference maps BOTH type strings onto MultiStepRestartLR,
        # whose default gamma is 0.1 (reference base_model.py
        # setup_schedulers + lr_scheduler.py:6) — torch MultiStepLR's
        # default is also 0.1
        gamma = opt.get('gamma', 0.1)
        if stype == 'MultiStepLR':
            sched = multistep_lr(milestones, gamma)
        else:
            sched = multistep_restart_lr(milestones, gamma,
                                         opt.get('restarts', (0,)),
                                         opt.get('restart_weights', (1,)))
    elif stype == 'CosineAnnealingRestartLR':
        sched = cosine_annealing_restart_lr(
            opt['periods'], opt.get('restart_weights', (1,)),
            opt.get('eta_min', 0), base_lr=base_lr or 1.0)
    else:
        raise NotImplementedError(
            f'Scheduler {stype} is not implemented yet.')
    return with_warmup(sched, warmup_iter)
