"""Weighted/masked reduction helpers
(reference basicsr/losses/loss_util.py and basicsr/models/loss_utils.py —
both implement the same weight-then-reduce contract)."""
import functools

import jax.numpy as jnp


def reduce_loss(loss, reduction):
    if reduction == 'none':
        return loss
    if reduction == 'mean':
        return loss.mean()
    if reduction == 'sum':
        return loss.sum()
    raise ValueError(f'invalid reduction: {reduction}')


def weight_reduce_loss(loss, weight=None, reduction='mean'):
    """Apply element-wise weight then reduce. With a weight and 'mean'
    reduction, the mean is taken over the weighted region (weight sum),
    matching reference loss_util.py:26-56. NHWC layout: the channel axis
    is -1 (weight has 1 or C channels)."""
    if weight is not None:
        assert weight.ndim == loss.ndim
        assert weight.shape[-1] == 1 or weight.shape[-1] == loss.shape[-1]
        loss = loss * weight

    if weight is None or reduction == 'sum':
        loss = reduce_loss(loss, reduction)
    elif reduction == 'mean':
        if weight.shape[-1] > 1:
            denom = weight.sum()
        else:
            denom = weight.sum() * loss.shape[-1]
        loss = loss.sum() / denom
    return loss


def weighted_loss(loss_func):
    """Decorator adding (weight, reduction) args to an elementwise loss
    (reference loss_util.py:59-95; the legacy ``masked_loss`` decorator at
    models/loss_utils.py:58-96 has identical semantics)."""

    @functools.wraps(loss_func)
    def wrapper(pred, target, weight=None, reduction='mean', **kwargs):
        loss = loss_func(pred, target, **kwargs)
        return weight_reduce_loss(loss, weight, reduction)

    return wrapper


masked_loss = weighted_loss
