"""Metric registry + config-driven dispatch
(reference basicsr/metrics/__init__.py:10-20)."""
from copy import deepcopy

from mrefsr_tpu.utils.registry import METRIC_REGISTRY
from .psnr_ssim import (calculate_psnr, calculate_psnr_jax, calculate_ssim,
                        calculate_ssim_jax)

__all__ = ['calculate_psnr', 'calculate_ssim', 'calculate_psnr_jax',
           'calculate_ssim_jax', 'calculate_metric']


def calculate_metric(data, opt):
    """Instantiate a metric call from YAML options (``type`` key selects the
    registered function; remaining keys are kwargs)."""
    opt = deepcopy(opt)
    metric_type = opt.pop('type')
    metric = METRIC_REGISTRY.get(metric_type)(**data, **opt)
    return metric
