"""Load single modules from the read-only reference repo for parity tests.

The reference package (basicsr) can't be imported wholesale — it pulls in
mmcv/CUDA ops — so we load individual files standalone and stub the few
cross-module imports they need. Used only by tests to assert numerical
parity; no reference code enters the framework.
"""
import importlib.util
import sys
import types

REF_ROOT = '/root/reference'


def _load_file(module_name, rel_path):
    spec = importlib.util.spec_from_file_location(
        module_name, f'{REF_ROOT}/{rel_path}')
    mod = importlib.util.module_from_spec(spec)
    sys.modules[module_name] = mod
    spec.loader.exec_module(mod)
    return mod


_cache = {}


def load_ref_matlab_functions():
    if 'matlab' not in _cache:
        _cache['matlab'] = _load_file('_ref_matlab_functions',
                                      'basicsr/utils/matlab_functions.py')
    return _cache['matlab']


def load_ref_color_util():
    if 'color' not in _cache:
        _cache['color'] = _load_file('_ref_color_util',
                                     'basicsr/utils/color_util.py')
    return _cache['color']


def load_ref_psnr_ssim():
    """Load reference psnr_ssim with its basicsr-internal deps stubbed."""
    if 'psnr_ssim' in _cache:
        return _cache['psnr_ssim']
    color = load_ref_color_util()
    registry = _load_file('_ref_registry', 'basicsr/utils/registry.py')

    pkg = types.ModuleType('basicsr')
    pkg.__path__ = [f'{REF_ROOT}/basicsr']
    utils_pkg = types.ModuleType('basicsr.utils')
    utils_pkg.bgr2ycbcr = color.bgr2ycbcr
    utils_pkg.color_util = color
    utils_pkg.registry = registry
    metrics_pkg = types.ModuleType('basicsr.metrics')
    sys.modules['basicsr'] = pkg
    sys.modules['basicsr.utils'] = utils_pkg
    sys.modules['basicsr.utils.color_util'] = color
    sys.modules['basicsr.utils.registry'] = registry
    sys.modules['basicsr.metrics'] = metrics_pkg

    metric_util = _load_file('basicsr.metrics.metric_util',
                             'basicsr/metrics/metric_util.py')
    metrics_pkg.metric_util = metric_util
    psnr_ssim = _load_file('basicsr.metrics.psnr_ssim',
                           'basicsr/metrics/psnr_ssim.py')
    _cache['psnr_ssim'] = psnr_ssim
    return psnr_ssim
