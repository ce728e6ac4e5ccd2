"""Bilinear grid sampling and optical-flow warping on NHWC arrays.

TPU-native equivalents of torch.nn.functional.grid_sample and the
reference's flow_warp (basicsr/archs/arch_util.py:199-231), built from
gathers so XLA autodiff yields the scatter-add backward.
"""
import jax.numpy as jnp


def grid_sample(x, grid, align_corners=True, padding_mode='zeros',
                mode='bilinear'):
    """torch.grid_sample equivalent for NHWC ``x`` at normalized coords.

    Args:
        x: (N, H, W, C).
        grid: (N, Ho, Wo, 2) with last dim (x, y) in [-1, 1].
        align_corners: torch semantics for the [-1,1] -> pixel mapping.
        padding_mode: 'zeros' or 'border' (others raise).
        mode: 'bilinear' or 'nearest'.

    Returns:
        (N, Ho, Wo, C)
    """
    n, h, w, c = x.shape
    gx, gy = grid[..., 0], grid[..., 1]

    if align_corners:
        fx = (gx + 1) * 0.5 * (w - 1)
        fy = (gy + 1) * 0.5 * (h - 1)
    else:
        fx = ((gx + 1) * w - 1) * 0.5
        fy = ((gy + 1) * h - 1) * 0.5

    if mode == 'nearest':
        return _nearest_sample(x, fy, fx, padding_mode)
    if mode != 'bilinear':
        raise NotImplementedError(f'grid_sample mode {mode!r}')
    return _bilinear_sample(x, fy, fx, padding_mode)


def _nearest_sample(x, fy, fx, padding_mode='zeros'):
    """Nearest sampling of NHWC ``x`` at float pixel coords (torch
    grid_sample mode='nearest': round-half-away via floor(v+0.5))."""
    _check_padding_mode(padding_mode)
    n, h, w, _ = x.shape
    yi = jnp.floor(fy + 0.5)
    xi = jnp.floor(fx + 0.5)
    yc = jnp.clip(yi, 0, h - 1).astype(jnp.int32)
    xc = jnp.clip(xi, 0, w - 1).astype(jnp.int32)
    bidx = jnp.arange(n).reshape(n, 1, 1)
    vals = x[bidx, yc, xc]
    if padding_mode == 'zeros':
        valid = ((yi >= 0) & (yi <= h - 1) & (xi >= 0) & (xi <= w - 1))
        vals = vals * valid[..., None].astype(x.dtype)
    return vals


def _check_padding_mode(padding_mode):
    if padding_mode not in ('zeros', 'border'):
        raise NotImplementedError(
            f"padding_mode {padding_mode!r} not supported "
            "(use 'zeros' or 'border')")


def _bilinear_sample(x, fy, fx, padding_mode='zeros'):
    """Sample NHWC ``x`` at float pixel coords (fy, fx) of shape
    (N, Ho, Wo). Returns (N, Ho, Wo, C)."""
    _check_padding_mode(padding_mode)
    n, h, w, _ = x.shape
    x0 = jnp.floor(fx)
    y0 = jnp.floor(fy)
    x1 = x0 + 1
    y1 = y0 + 1

    wx1 = (fx - x0).astype(x.dtype)
    wy1 = (fy - y0).astype(x.dtype)
    wx0 = 1.0 - wx1
    wy0 = 1.0 - wy1

    def gather(yi, xi):
        yc = jnp.clip(yi, 0, h - 1).astype(jnp.int32)
        xc = jnp.clip(xi, 0, w - 1).astype(jnp.int32)
        bidx = jnp.arange(n).reshape(n, 1, 1)
        vals = x[bidx, yc, xc]  # (N, Ho, Wo, C)
        if padding_mode == 'zeros':
            valid = ((yi >= 0) & (yi <= h - 1) & (xi >= 0) & (xi <= w - 1))
            vals = vals * valid[..., None].astype(x.dtype)
        return vals

    out = (gather(y0, x0) * (wy0 * wx0)[..., None] +
           gather(y0, x1) * (wy0 * wx1)[..., None] +
           gather(y1, x0) * (wy1 * wx0)[..., None] +
           gather(y1, x1) * (wy1 * wx1)[..., None])
    return out


def flow_warp(x, flow, interp_mode='bilinear', padding_mode='zeros',
              align_corners=True):
    """Warp NHWC ``x`` with flow (N, H, W, 2), last dim (dx, dy).

    Matches reference arch_util.flow_warp:199-231 (grid + flow in pixel
    units, normalized to [-1,1], grid_sample align_corners=True).
    """
    n, h, w, _ = x.shape
    grid_y, grid_x = jnp.meshgrid(jnp.arange(h, dtype=x.dtype),
                                  jnp.arange(w, dtype=x.dtype),
                                  indexing='ij')
    fx = grid_x[None] + flow[..., 0]
    fy = grid_y[None] + flow[..., 1]
    if interp_mode not in ('bilinear', 'nearest'):
        raise NotImplementedError(
            f'interp_mode {interp_mode!r} not supported')
    if not align_corners:
        # convert through normalized coords as torch does
        vx = 2.0 * fx / max(w - 1, 1) - 1.0
        vy = 2.0 * fy / max(h - 1, 1) - 1.0
        return grid_sample(x, jnp.stack([vx, vy], axis=-1),
                           align_corners=False, padding_mode=padding_mode,
                           mode=interp_mode)
    if interp_mode == 'nearest':
        return _nearest_sample(x, fy, fx, padding_mode)
    return _bilinear_sample(x, fy, fx, padding_mode)


def resize_flow(flow, size_type, sizes, interp_mode='bilinear',
                align_corners=False):
    """Resize a flow field and rescale its magnitudes
    (reference arch_util.py:233-269). flow: (N, H, W, 2)."""
    from .resize import interpolate
    n, flow_h, flow_w, _ = flow.shape
    if size_type == 'ratio':
        output_h, output_w = int(flow_h * sizes[0]), int(flow_w * sizes[1])
    elif size_type == 'shape':
        output_h, output_w = sizes[0], sizes[1]
    else:
        raise ValueError(f'Size type should be ratio or shape, '
                         f'but got type {size_type}.')
    ratio_h = output_h / flow_h
    ratio_w = output_w / flow_w
    resized = interpolate(flow, size=(output_h, output_w), mode=interp_mode,
                          align_corners=align_corners)
    resized = resized * jnp.asarray([ratio_w, ratio_h], dtype=flow.dtype)
    return resized
