"""ESRGAN: relativistic-GAN variant of SRGAN
(reference basicsr/models/esrgan_model.py:9-83). The relativistic loss
branches live in SRGANModel's jitted step, switched by _relativistic."""
from mrefsr_tpu.utils.registry import MODEL_REGISTRY

from .srgan_model import SRGANModel


@MODEL_REGISTRY.register()
class ESRGANModel(SRGANModel):
    """ESRGAN model for single image super-resolution."""

    _relativistic = True
