"""Wiring smoke test for scripts/eval_parity.py — the one-command
CUFED5 accuracy-parity gate (VERDICT: the +-0.05 dB north star,
reference basicsr/models/multi_ref_restoration_model.py:316-382).

Real checkpoints/datasets are not downloadable here, so this drives the
script end-to-end on synthetic assets: a 2-group CUFED5-layout folder
and random-weight checkpoints written in the reference .pth layout via
mrefsr_tpu.convert.save_torch_checkpoint. Verifies checkpoint import,
the padded-canvas eval protocol (pad -> forward -> un-pad ->
crop_border=4 metrics), the JSON report, and both gate outcomes.
"""
import importlib.util
import json
import sys

import cv2
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mrefsr_tpu.convert import save_torch_checkpoint

CANVAS = 96


def _load_script():
    spec = importlib.util.spec_from_file_location(
        'eval_parity_script', '/root/repo/scripts/eval_parity.py')
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope='module')
def assets(tmp_path_factory):
    root = tmp_path_factory.mktemp('eval_parity')
    cufed = root / 'CUFED5'
    cufed.mkdir()
    rng = np.random.RandomState(0)
    for g in range(2):
        h, w = 90 - 8 * g, 70 + 6 * g
        for i in range(6):
            img = (rng.rand(h, w, 3) * 255).astype(np.uint8)
            cv2.imwrite(str(cufed / f'{g:03d}_{i}.png'), img)

    # random-weight checkpoints in the reference layout
    from mrefsr_tpu.archs.contras_extractor_arch import \
        ContrasMultiExtractorSep
    from mrefsr_tpu.archs.ref_mrapa_restoration_arch import \
        MRAPARestorationNet

    key = jax.random.PRNGKey(1)
    k1, k2 = jax.random.split(key)
    ngf, n_blocks, groups, t = 8, 1, 8, 5
    ex = ContrasMultiExtractorSep()
    match_img = jnp.zeros((1, 32, 32, 3))
    refs = jnp.zeros((1, t, 32, 32, 3))
    vars_ex = ex.init(k1, match_img, refs)

    net_g = MRAPARestorationNet(ngf=ngf, n_blocks=n_blocks, groups=groups)
    lq = jnp.zeros((1, 8, 8, 3))
    pre = {lv: jnp.zeros((1, t, 8 * s, 8 * s, 9, 2))
           for lv, s in (('relu3_1', 1), ('relu2_1', 2), ('relu1_1', 4))}
    feat = {lv: jnp.zeros((1, t, 8 * s, 8 * s, c))
            for lv, s, c in (('relu3_1', 1, 256), ('relu2_1', 2, 128),
                             ('relu1_1', 4, 64))}
    vars_g = net_g.init(k2, lq, pre, feat)

    ex_path = str(root / 'feature_extraction_network.pth')
    g_path = str(root / 'mrapa_restoration.pth')
    save_torch_checkpoint(ex_path, vars_ex['params'])
    save_torch_checkpoint(g_path, vars_g['params'])
    return {'cufed': str(cufed), 'extractor': ex_path, 'net_g': g_path,
            'results': str(root / 'results'),
            'ngf': ngf, 'n_blocks': n_blocks}


def _run(script, assets, extra, capsys, canvas=None):
    argv = ['eval_parity.py',
            '--net_g', assets['net_g'],
            '--extractor', assets['extractor'],
            '--cufed5', assets['cufed'],
            '--results-dir', assets['results'],
            '--canvas', str(canvas if canvas is not None else CANVAS),
            '--ngf', str(assets['ngf']),
            '--n-blocks', str(assets['n_blocks'])] + extra
    old = sys.argv
    sys.argv = argv
    try:
        with pytest.raises(SystemExit) as exc:
            script.main()
    finally:
        sys.argv = old
    out = capsys.readouterr().out.strip().splitlines()[-1]
    return exc.value.code or 0, json.loads(out)


@pytest.mark.slow
def test_eval_parity_end_to_end_and_gates(assets, capsys):
    script = _load_script()
    rc, report = _run(script, assets, [], capsys)
    assert rc == 0
    m = report['metrics']
    assert set(m) == {'psnr', 'psnr_y', 'ssim_y'}
    assert all(np.isfinite(v) for v in m.values())
    assert report['parity_ok'] is None  # no expectations given

    # gate passes at the just-measured values
    rc, report = _run(script, assets, [
        '--expected-psnr', f"{m['psnr']:.6f}",
        '--expected-psnr-y', f"{m['psnr_y']:.6f}",
        '--expected-ssim-y', f"{m['ssim_y']:.6f}"], capsys)
    assert rc == 0 and report['parity_ok'] is True
    assert report['gates']['psnr']['pass'] is True

    # gate fails beyond +-0.05 dB
    rc, report = _run(script, assets, [
        '--expected-psnr', f"{m['psnr'] + 0.2:.6f}"], capsys)
    assert rc == 2 and report['parity_ok'] is False


@pytest.mark.slow
def test_eval_parity_serving_and_protocol_canvases(assets, capsys):
    """Both shipped protocols stay runnable through the gate script:
    the bucketed+bf16 serving form (options/test/
    test_5ref_cufed5_serving.yml) and the reference's full 500 canvas
    (the parity protocol) — so the day real checkpoints land, either
    command runs as-is."""
    script = _load_script()

    # rectangular bucketed canvases + bf16 serving precision
    rc, report = _run(script, assets, ['--bf16'], capsys,
                      canvas='96,128')
    assert rc == 0
    assert all(np.isfinite(v) for v in report['metrics'].values())

    # the full 500 reference protocol canvas (one image group — the
    # 500-canvas matching dominates this test's CPU time)
    import os
    import shutil
    one = assets['cufed'] + '_one'
    if not os.path.isdir(one):
        os.makedirs(one)
        for i in range(6):
            shutil.copy(os.path.join(assets['cufed'], f'000_{i}.png'),
                        one)
    rc, report = _run(script, dict(assets, cufed=one), [], capsys,
                      canvas='500')
    assert rc == 0
    assert all(np.isfinite(v) for v in report['metrics'].values())
