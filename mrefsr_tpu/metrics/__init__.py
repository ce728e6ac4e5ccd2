"""Metric registry + config-driven dispatch
(reference basicsr/metrics/__init__.py:10-20)."""
from copy import deepcopy

from mrefsr_tpu.utils.registry import METRIC_REGISTRY
from .fid import (calculate_fid, extract_inception_features,
                  load_patched_inception_v3)
from .lpips import LPIPSVgg, calculate_lpips, load_lpips_variables
from .niqe import calculate_niqe
from .psnr_ssim import (calculate_psnr, calculate_psnr_jax, calculate_ssim,
                        calculate_ssim_jax)

__all__ = ['calculate_psnr', 'calculate_ssim', 'calculate_psnr_jax',
           'calculate_ssim_jax', 'calculate_metric', 'calculate_niqe',
           'calculate_fid', 'extract_inception_features',
           'load_patched_inception_v3', 'calculate_lpips', 'LPIPSVgg',
           'load_lpips_variables']


def calculate_metric(data, opt):
    """Instantiate a metric call from YAML options (``type`` key selects the
    registered function; remaining keys are kwargs)."""
    opt = deepcopy(opt)
    metric_type = opt.pop('type')
    metric = METRIC_REGISTRY.get(metric_type)(**data, **opt)
    return metric
