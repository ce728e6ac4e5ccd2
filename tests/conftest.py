"""Test env: run JAX on a virtual 8-device CPU mesh so multi-chip sharding
paths are exercised without TPU hardware.

The container's sitecustomize imports jax and registers the TPU plugin at
interpreter start, so env vars alone are too late — the jax config must be
updated directly before any backend initializes.
"""
import os

os.environ.pop('PALLAS_AXON_POOL_IPS', None)
flags = os.environ.get('XLA_FLAGS', '')
if 'xla_force_host_platform_device_count' not in flags:
    os.environ['XLA_FLAGS'] = (
        flags + ' --xla_force_host_platform_device_count=8').strip()
os.environ['JAX_PLATFORMS'] = 'cpu'

import jax  # noqa: E402

jax.config.update('jax_platforms', 'cpu')
assert jax.default_backend() == 'cpu', (
    'tests must run on the virtual CPU mesh, got '
    f'{jax.default_backend()}')
assert jax.device_count() == 8
