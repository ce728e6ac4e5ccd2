"""NIQE parity vs the reference implementation and FID math checks."""
import importlib.util
import sys
import types

import numpy as np
import pytest

from mrefsr_tpu.metrics import calculate_fid, calculate_niqe

REF = '/root/reference'


def _load_ref_niqe():
    registry_spec = importlib.util.spec_from_file_location(
        'basicsr.utils.registry', f'{REF}/basicsr/utils/registry.py')
    registry = importlib.util.module_from_spec(registry_spec)
    registry_spec.loader.exec_module(registry)

    def _load(name, rel):
        spec = importlib.util.spec_from_file_location(name,
                                                      f'{REF}/{rel}')
        mod = importlib.util.module_from_spec(spec)
        sys.modules[name] = mod
        spec.loader.exec_module(mod)
        return mod

    pkg = types.ModuleType('basicsr')
    utils_pkg = types.ModuleType('basicsr.utils')
    utils_pkg.registry = registry
    metrics_pkg = types.ModuleType('basicsr.metrics')
    sys.modules['basicsr'] = pkg
    sys.modules['basicsr.utils'] = utils_pkg
    sys.modules['basicsr.utils.registry'] = registry
    sys.modules['basicsr.metrics'] = metrics_pkg

    matlab = _load('basicsr.utils.matlab_functions',
                   'basicsr/utils/matlab_functions.py')
    utils_pkg.matlab_functions = matlab
    color = _load('basicsr.utils.color_util', 'basicsr/utils/color_util.py')
    utils_pkg.color_util = color
    utils_pkg.bgr2ycbcr = color.bgr2ycbcr
    metric_util = _load('basicsr.metrics.metric_util',
                        'basicsr/metrics/metric_util.py')
    metrics_pkg.metric_util = metric_util
    return _load('_ref_niqe', 'basicsr/metrics/niqe.py')


def test_niqe_parity():
    ref = _load_ref_niqe()
    rng = np.random.RandomState(0)
    # structured image, large enough for two 96x96 blocks per axis
    x = np.linspace(0, 255, 208)[None, :] * np.ones((208, 1))
    img = (x + rng.randn(208, 208) * 25).clip(0, 255)
    img = np.repeat(img[:, :, None], 3, axis=2).astype(np.float32)
    mine = calculate_niqe(img, crop_border=0, convert_to='y')
    theirs = ref.calculate_niqe(img, crop_border=0, convert_to='y')
    np.testing.assert_allclose(mine, theirs, rtol=1e-4)
    assert np.isfinite(mine)


def test_fid_identity_zero():
    rng = np.random.RandomState(1)
    feats = rng.randn(64, 16)
    mu, sigma = feats.mean(0), np.cov(feats, rowvar=False)
    assert abs(calculate_fid(mu, sigma, mu, sigma)) < 1e-6


def test_fid_matches_reference_math():
    spec = importlib.util.spec_from_file_location(
        '_ref_fid_math', f'{REF}/basicsr/metrics/fid.py')
    # reference fid.py imports torch/inception; compute expected FID
    # directly from its documented formula instead
    rng = np.random.RandomState(2)
    f1 = rng.randn(128, 8)
    f2 = rng.randn(128, 8) + 0.5
    mu1, s1 = f1.mean(0), np.cov(f1, rowvar=False)
    mu2, s2 = f2.mean(0), np.cov(f2, rowvar=False)
    from scipy import linalg
    cov_sqrt, _ = linalg.sqrtm(s1 @ s2, disp=False)
    expected = ((mu1 - mu2) @ (mu1 - mu2) + np.trace(s1) + np.trace(s2)
                - 2 * np.trace(cov_sqrt.real))
    np.testing.assert_allclose(calculate_fid(mu1, s1, mu2, s2), expected,
                               rtol=1e-9)


@pytest.mark.slow
def test_inception_feature_shapes():
    import jax
    from mrefsr_tpu.metrics import load_patched_inception_v3
    _, variables, feature_fn = load_patched_inception_v3(
        resize_input=True, normalize_input=False)
    x = np.random.RandomState(3).rand(2, 64, 64, 3).astype(np.float32)
    feats = np.asarray(feature_fn(x))
    assert feats.shape == (2, 2048)
    assert np.isfinite(feats).all()


def test_inception_converts_torchvision_layout():
    """A torch-layout state dict with inception key names must convert
    into the flax tree without unexpected-key warnings for conv/bn."""
    import jax
    import jax.numpy as jnp
    from mrefsr_tpu.archs.inception import InceptionV3
    from mrefsr_tpu.convert import torch_to_flax

    module = InceptionV3(output_blocks=(3,), resize_input=False,
                         normalize_input=False)
    dummy = jnp.zeros((1, 299, 299, 3), jnp.float32)
    variables = module.init(jax.random.PRNGKey(0), dummy)

    # synthesize a torch state dict from the flax tree's own shapes
    sd = {}

    def walk(node, prefix):
        for k, v in node.items():
            p = f'{prefix}.{k}' if prefix else k
            if isinstance(v, dict):
                walk(v, p)
            elif k == 'kernel':
                sd[p.rsplit('.', 1)[0] + '.weight'] = np.zeros(
                    np.transpose(v, (3, 2, 0, 1)).shape, np.float32)
            elif k == 'scale':
                sd[p.rsplit('.', 1)[0] + '.weight'] = np.zeros(
                    v.shape, np.float32)
            else:
                sd[p] = np.zeros(v.shape, np.float32)

    walk(variables['params'], '')
    for path, leaf in [('mean', 'running_mean'), ('var', 'running_var')]:
        def walk_bs(node, prefix):
            for k, v in node.items():
                p = f'{prefix}.{k}' if prefix else k
                if isinstance(v, dict):
                    walk_bs(v, p)
                elif k == path:
                    sd[p.rsplit('.', 1)[0] + f'.{leaf}'] = np.zeros(
                        v.shape, np.float32)
        walk_bs(variables['batch_stats'], '')

    converted = torch_to_flax(sd)
    flat_a = {jax.tree_util.keystr(p) for p, _ in
              jax.tree_util.tree_leaves_with_path(variables['params'])}
    flat_b = {jax.tree_util.keystr(p) for p, _ in
              jax.tree_util.tree_leaves_with_path(converted['params'])}
    assert flat_a == flat_b
