"""Importing the framework must not initialize the XLA backend.

jax.distributed.initialize() (the multi-process CLI bootstrap,
utils/dist_util.py) refuses to run after ANY backend-initializing jax
call — a single module-level `jnp.asarray(...)` constant anywhere in
the import graph breaks every distributed launch (this exact bug
shipped in data/degradations.py until round 4's 2-process CLI test
caught it). Guard the whole import surface.
"""
import subprocess
import sys


def test_import_does_not_initialize_backend():
    code = """
import os
os.environ['JAX_PLATFORMS'] = 'cpu'
# the full registry import surface: every dataset/arch/model/loss/
# metric module runs at import via the registry scans
import mrefsr_tpu.train  # noqa: F401
import mrefsr_tpu.test  # noqa: F401
import jax._src.xla_bridge as xb
bks = xb._backends if hasattr(xb, '_backends') else {}
assert not bks, f'import initialized backends: {list(bks)}'
print('IMPORT_CLEAN')
"""
    env = dict(__import__('os').environ)
    env.pop('PALLAS_AXON_POOL_IPS', None)
    proc = subprocess.run([sys.executable, '-c', code], cwd='/root/repo',
                          env=env, capture_output=True, text=True,
                          timeout=600)
    assert proc.returncode == 0, (proc.stdout + proc.stderr)[-3000:]
    assert 'IMPORT_CLEAN' in proc.stdout
