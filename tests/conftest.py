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
# Persistent compilation cache: the heavy parity compiles (SwinIR,
# BasicVSR++, StyleGAN2, the multi-ref train graphs) dominate suite wall
# time; warm runs skip them entirely.
#
# The cache dir is keyed by a host-CPU fingerprint: XLA:CPU AOT entries
# bake in the compile machine's vector features, so an entry produced on
# one host can SIGILL (or codegen differently) when loaded on another.
# A new machine silently gets a fresh subdir instead of stale binaries.
def _host_fingerprint():
    import hashlib
    import platform
    try:
        with open('/proc/cpuinfo') as f:
            flags = next((l for l in f if l.startswith('flags')), '')
    except OSError:
        flags = ''
    key = platform.machine() + platform.processor() + flags
    return hashlib.sha256(key.encode()).hexdigest()[:12]


_cache_dir = os.environ.get(
    'MREFSR_TEST_COMPILE_CACHE',
    os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), '.jax_cache_tests',
        _host_fingerprint()))
if _cache_dir:
    os.makedirs(_cache_dir, exist_ok=True)
    jax.config.update('jax_compilation_cache_dir', _cache_dir)
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 2.0)
    jax.config.update('jax_persistent_cache_min_entry_size_bytes', -1)
assert jax.default_backend() == 'cpu', (
    'tests must run on the virtual CPU mesh, got '
    f'{jax.default_backend()}')
assert jax.device_count() == 8
