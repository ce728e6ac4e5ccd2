"""FID (Frechet Inception Distance)
(reference basicsr/metrics/fid.py:10-93). The Inception feature
extractor is the flax FID-InceptionV3 (archs/inception.py); the Frechet
distance itself is numpy/scipy.
"""
import numpy as np
from scipy import linalg

import jax
import jax.numpy as jnp

from mrefsr_tpu.archs.inception import FID_WEIGHTS_URL, InceptionV3


def load_patched_inception_v3(weights_path=None, resize_input=True,
                              normalize_input=False):
    """Build the FID Inception extractor and (optionally) load the
    converted pt_inception weights (reference fid.py:10-16).

    Returns (module, variables, jitted feature fn).
    """
    module = InceptionV3(output_blocks=(3,), resize_input=resize_input,
                         normalize_input=normalize_input)
    if weights_path is not None:
        from mrefsr_tpu.convert import load_torch_state_dict, torch_to_flax
        sd = load_torch_state_dict(weights_path, param_key=None)
        # drop the (unused) aux-classifier / fc heads
        sd = {k: v for k, v in sd.items()
              if not k.startswith(('AuxLogits', 'fc'))}
        variables = torch_to_flax(sd)
        variables = jax.tree_util.tree_map(jnp.asarray, variables)
    else:
        dummy = jnp.zeros((1, 75, 75, 3), jnp.float32)
        variables = module.init(jax.random.PRNGKey(0), dummy)

    @jax.jit
    def feature_fn(x):
        return module.apply(variables, x)[0].reshape(x.shape[0], -1)

    return module, variables, feature_fn


def extract_inception_features(data_generator, feature_fn,
                               len_generator=None):
    """Run the extractor over a generator of NHWC [0,1] batches
    (reference fid.py:19-47)."""
    features = []
    for data in data_generator:
        feat = feature_fn(jnp.asarray(np.asarray(data, np.float32)))
        features.append(np.asarray(feat))
    return np.concatenate(features, axis=0)


def calculate_fid(mu1, sigma1, mu2, sigma2, eps=1e-6):
    """Frechet distance between two Gaussians (reference fid.py:50-93)."""
    assert mu1.shape == mu2.shape, \
        'Two mean vectors have different lengths'
    assert sigma1.shape == sigma2.shape, \
        'Two covariances have different dimensions'

    # disp=False is deprecated (removed in scipy>=1.18); finiteness of
    # the plain return carries the same singularity signal
    cov_sqrt = linalg.sqrtm(sigma1 @ sigma2)
    if not np.isfinite(cov_sqrt).all():
        print(f'Product of cov matrices is singular. Adding {eps} to '
              'diagonal of cov estimates')
        offset = np.eye(sigma1.shape[0]) * eps
        cov_sqrt = linalg.sqrtm((sigma1 + offset) @ (sigma2 + offset))

    if np.iscomplexobj(cov_sqrt):
        if not np.allclose(np.diagonal(cov_sqrt).imag, 0, atol=1e-3):
            m = np.max(np.abs(cov_sqrt.imag))
            raise ValueError(f'Imaginary component {m}')
        cov_sqrt = cov_sqrt.real

    mean_diff = mu1 - mu2
    mean_norm = mean_diff @ mean_diff
    trace = np.trace(sigma1) + np.trace(sigma2) - 2 * np.trace(cov_sqrt)
    return mean_norm + trace
