"""Loss registry + build_loss (reference basicsr/losses/__init__.py:14-26).

``legacy_losses`` mirrors the reference's second loss module
(basicsr/models/losses.py) that Ref/MultiRef models fetch by attribute
name."""
from copy import deepcopy

from mrefsr_tpu.utils import get_root_logger
from mrefsr_tpu.utils.registry import LOSS_REGISTRY

from . import legacy_losses  # noqa: F401
from .losses import (CharbonnierLoss, GANFeatLoss, GANLoss, L1Loss, MSELoss,
                     MultiScaleGANLoss, PerceptualLoss, WeightedTVLoss,
                     g_path_regularize, gradient_penalty_loss, r1_penalty)

__all__ = [
    'L1Loss', 'MSELoss', 'CharbonnierLoss', 'WeightedTVLoss',
    'PerceptualLoss', 'GANLoss', 'MultiScaleGANLoss', 'GANFeatLoss',
    'r1_penalty', 'g_path_regularize', 'gradient_penalty_loss',
    'build_loss', 'legacy_losses'
]


def build_loss(opt):
    """Instantiate a registered loss from YAML options."""
    opt = deepcopy(opt)
    loss_type = opt.pop('type')
    loss = LOSS_REGISTRY.get(loss_type)(**opt)
    logger = get_root_logger()
    logger.info(f'Loss [{loss.__class__.__name__}] is created.')
    return loss
