"""The pixel→GAN boundary repro script crosses the boundary cleanly.

Drives scripts/benchmarks/repro_gan_boundary.py (the committed repro
for the round-5 RESOURCE_EXHAUSTED finding — TPU executables reserve
scratch HBM at load, so the first WGAN-GP wave OOMs while the pixel
wave's + eval forward's reservations are resident) at tiny CPU shapes:
pixel wave → eval forward → two GAN waves through the REAL
MultiRefRestorationModel phase logic, including
``_release_pretrain_executables`` at the boundary. On CPU this cannot
reproduce the HBM exhaustion itself; it pins the script's plumbing and
the release path's behavioral safety (training proceeds after the
clear). Hardware result recorded in docs/TPUDesign.md."""
import os
import os.path as osp
import subprocess
import sys

import pytest

REPO = osp.dirname(osp.dirname(osp.dirname(osp.abspath(__file__))))


@pytest.mark.slow
def test_repro_script_crosses_boundary_on_cpu():
    env = dict(os.environ, JAX_PLATFORMS='cpu')
    proc = subprocess.run(
        [sys.executable, 'scripts/benchmarks/repro_gan_boundary.py',
         '--batch', '1', '--gt', '64', '--wave', '2', '--val'],
        cwd=REPO, env=env, capture_output=True, text=True,
        timeout=1800)
    out = proc.stdout + proc.stderr
    assert proc.returncode == 0, out[-2000:]
    assert 'RESULT: boundary fits' in out, out[-2000:]
    for stage in ['pixel wave', 'eval forward', 'GAN wave',
                  'second GAN wave']:
        assert f'[repro] {stage}' in out, (stage, out[-2000:])
