"""Model registry + auto-scan (reference basicsr/models/__init__.py:13-30):
all ``*_model.py`` modules are imported so their registrations run."""
import importlib
from copy import deepcopy
from os import path as osp

from mrefsr_tpu.utils import get_root_logger, scandir
from mrefsr_tpu.utils.registry import MODEL_REGISTRY

__all__ = ['build_model']

model_folder = osp.dirname(osp.abspath(__file__))
model_filenames = [
    osp.splitext(osp.basename(v))[0]
    for v in scandir(model_folder) if v.endswith('_model.py')
]
_model_modules = [
    importlib.import_module(f'mrefsr_tpu.models.{file_name}')
    for file_name in model_filenames
]


def build_model(opt):
    """Instantiate the registered model for ``opt['model_type']``."""
    opt = deepcopy(opt)
    model = MODEL_REGISTRY.get(opt['model_type'])(opt)
    logger = get_root_logger()
    logger.info(f'Model [{model.__class__.__name__}] is created.')
    return model
