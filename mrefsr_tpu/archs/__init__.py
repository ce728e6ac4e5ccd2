"""Arch registry + auto-scan (reference basicsr/archs/__init__.py:13-25):
all ``*_arch.py`` modules in this package are imported so their
``@ARCH_REGISTRY.register()`` decorators run, then ``build_network`` looks
up the YAML ``type:`` string."""
import importlib
from copy import deepcopy
from os import path as osp

from mrefsr_tpu.utils import get_root_logger, scandir
from mrefsr_tpu.utils.registry import ARCH_REGISTRY

__all__ = ['build_network']

arch_folder = osp.dirname(osp.abspath(__file__))
arch_filenames = [
    osp.splitext(osp.basename(v))[0]
    for v in scandir(arch_folder) if v.endswith('_arch.py')
]
_arch_modules = [
    importlib.import_module(f'mrefsr_tpu.archs.{file_name}')
    for file_name in arch_filenames
]


def build_network(opt):
    """Instantiate a registered arch from its YAML options dict."""
    opt = deepcopy(opt)
    network_type = opt.pop('type')
    # tuples for flax dataclass hashability
    opt = {k: tuple(v) if isinstance(v, list) else v
           for k, v in opt.items()}
    net = ARCH_REGISTRY.get(network_type)(**opt)
    logger = get_root_logger()
    logger.info(f'Network [{net.__class__.__name__}] is created.')
    return net
