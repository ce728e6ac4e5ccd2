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


def get_local_weights(residual, ksize):
    """Per-pixel local variance of the residual over a ksize window
    (reference basicsr/losses/loss_util.py:96-118), NHWC (b,h,w,1)."""
    import jax
    pad = (ksize - 1) // 2
    x = jnp.pad(residual, ((0, 0), (pad, pad), (pad, pad), (0, 0)),
                mode='reflect')
    n = ksize * ksize
    win = (1, ksize, ksize, 1)
    s1 = jax.lax.reduce_window(x, 0., jax.lax.add, win, (1, 1, 1, 1),
                               'VALID')
    s2 = jax.lax.reduce_window(x * x, 0., jax.lax.add, win, (1, 1, 1, 1),
                               'VALID')
    # unbiased variance, matching torch.var(unbiased=True)
    return (s2 - s1 * s1 / n) / (n - 1)


def get_refined_artifact_map(img_gt, img_output, img_ema, ksize):
    """LDL artifact map (reference loss_util.py:121-145), NHWC."""
    residual_ema = jnp.sum(jnp.abs(img_gt - img_ema), axis=-1,
                           keepdims=True)
    residual_sr = jnp.sum(jnp.abs(img_gt - img_output), axis=-1,
                          keepdims=True)
    patch_level_weight = jnp.var(
        residual_sr, axis=(1, 2, 3), keepdims=True, ddof=1)**(1 / 5)
    pixel_level_weight = get_local_weights(residual_sr, ksize)
    overall_weight = patch_level_weight * pixel_level_weight
    return jnp.where(residual_sr < residual_ema, 0., overall_weight)
