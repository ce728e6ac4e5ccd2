"""Registry / options / misc foundations."""
import os

import numpy as np
import pytest
import yaml

from mrefsr_tpu.utils import (Registry, img2tensor, parse_options, scandir,
                              tensor2img)
from mrefsr_tpu.utils.registry import ARCH_REGISTRY


def test_registry_basic():
    reg = Registry('test')

    @reg.register()
    class Foo:
        pass

    assert reg.get('Foo') is Foo
    assert 'Foo' in reg
    with pytest.raises(KeyError):
        reg.get('Bar')
    with pytest.raises(KeyError):

        @reg.register()
        class Foo:  # noqa: F811
            pass


def test_registry_suffix_fallback():
    reg = Registry('test')

    class Baz:
        pass

    reg._do_register('Baz_mrefsr_tpu', Baz)
    assert reg.get('Baz') is Baz


def test_parse_options(tmp_path):
    opt_yaml = {
        'name': 'test_exp',
        'model_type': 'SRModel',
        'scale': 4,
        'num_gpu': 1,
        'manual_seed': 0,
        'datasets': {
            'train': {'name': 'd', 'type': 'PairedImageDataset'},
            'val_1': {'name': 'v', 'type': 'PairedImageDataset'},
        },
        'train': {'total_iter': 100},
        'logger': {'print_freq': 10, 'save_checkpoint_freq': 100},
        'path': {},
    }
    opt_file = tmp_path / 'opt.yml'
    opt_file.write_text(yaml.dump(opt_yaml))

    opt, args = parse_options(str(tmp_path), is_train=True,
                              args=['-opt', str(opt_file),
                                    '--force_yml', 'train:total_iter=5'])
    assert opt['is_train'] is True
    assert opt['datasets']['train']['phase'] == 'train'
    assert opt['datasets']['val_1']['phase'] == 'val'
    assert opt['datasets']['train']['scale'] == 4
    assert opt['train']['total_iter'] == 5
    assert opt['path']['models'].endswith('models')
    assert 'test_exp' in opt['path']['experiments_root']
    assert opt['rank'] == 0


def test_img_tensor_roundtrip():
    img = np.random.RandomState(0).rand(16, 16, 3).astype(np.float32)
    t = img2tensor(img, bgr2rgb=True)  # HWC RGB float
    assert t.shape == (16, 16, 3)
    out = tensor2img(t[None], rgb2bgr=True)  # back to BGR uint8
    assert out.dtype == np.uint8
    np.testing.assert_allclose(out, (img * 255).round(), atol=1)


def test_tensor2img_jax_array():
    import jax.numpy as jnp
    x = jnp.ones((1, 8, 8, 3)) * 0.5
    out = tensor2img(x)
    assert out.shape == (8, 8, 3)
    assert out.dtype == np.uint8
    assert np.all(out == 128)


def test_tensor2img_fast_truncates_like_reference():
    # the reference's tensor2img_fast casts with .type(torch.uint8),
    # which TRUNCATES — 0.9999*255 = 254.97 must become 254, not 255
    from mrefsr_tpu.utils import tensor2img_fast
    img = np.full((1, 4, 4, 3), 0.9999, np.float32)
    out = tensor2img_fast(img, rgb2bgr=False)
    assert out.dtype == np.uint8
    assert np.all(out == 254)
    # channel swap + 3D input
    rgb = np.zeros((4, 4, 3), np.float32)
    rgb[..., 0] = 1.0  # pure red
    out = tensor2img_fast(rgb, rgb2bgr=True)
    assert out[0, 0, 2] == 255 and out[0, 0, 0] == 0


def test_scandir(tmp_path):
    (tmp_path / 'a.png').write_text('x')
    (tmp_path / 'b.jpg').write_text('x')
    sub = tmp_path / 'sub'
    sub.mkdir()
    (sub / 'c.png').write_text('x')
    assert sorted(scandir(str(tmp_path), suffix='.png')) == ['a.png']
    assert sorted(scandir(str(tmp_path), suffix='.png',
                          recursive=True)) == ['a.png',
                                               os.path.join('sub', 'c.png')]


def test_compilation_cache_strictly_opt_in(tmp_path, monkeypatch):
    """The persistent XLA compilation cache must stay OFF unless asked
    for (on remote-compile runtimes it can hang compiles)."""
    import jax
    opt_yaml = {'name': 'cc', 'model_type': 'SRModel', 'scale': 4,
                'num_gpu': 1, 'manual_seed': 0, 'datasets': {},
                'path': {}}
    opt_file = tmp_path / 'opt.yml'
    opt_file.write_text(yaml.dump(opt_yaml))
    monkeypatch.delenv('MREFSR_XLA_CACHE_DIR', raising=False)
    old = jax.config.jax_compilation_cache_dir
    try:
        jax.config.update('jax_compilation_cache_dir', None)
        parse_options(str(tmp_path), is_train=False,
                      args=['-opt', str(opt_file)])
        assert jax.config.jax_compilation_cache_dir is None

        opt_yaml['compilation_cache'] = True
        opt_file.write_text(yaml.dump(opt_yaml))
        parse_options(str(tmp_path), is_train=False,
                      args=['-opt', str(opt_file)])
        assert jax.config.jax_compilation_cache_dir == str(
            tmp_path / 'experiments' / '.xla_cache')

        jax.config.update('jax_compilation_cache_dir', None)
        del opt_yaml['compilation_cache']
        opt_file.write_text(yaml.dump(opt_yaml))
        monkeypatch.setenv('MREFSR_XLA_CACHE_DIR', str(tmp_path / 'xc'))
        parse_options(str(tmp_path), is_train=False,
                      args=['-opt', str(opt_file)])
        assert jax.config.jax_compilation_cache_dir == str(tmp_path / 'xc')
    finally:
        jax.config.update('jax_compilation_cache_dir', old)


def test_strict_load_raises_on_mismatch():
    """Regression: strict checkpoint loading must raise on
    missing/unexpected/size-mismatched keys (the strict flag used to be
    accepted and ignored; torch load_state_dict(strict=True) parity)."""
    import jax.numpy as jnp
    import pytest as _pytest
    from mrefsr_tpu.models.base_model import BaseModel

    model = BaseModel.__new__(BaseModel)  # _merge_loaded needs no state
    init_vars = {'params': {'conv': {'kernel': jnp.zeros((3, 3, 2, 4)),
                                     'bias': jnp.zeros((4,))}}}
    # missing 'bias', unexpected 'extra', mismatched kernel shape
    loaded = {'params': {'conv': {'kernel': jnp.zeros((1, 1, 2, 4)),
                                  'extra': jnp.zeros((2,))}}}
    with _pytest.raises(ValueError, match='strict'):
        model._merge_loaded(init_vars, loaded, strict=True)
    # non-strict keeps the init values and proceeds
    merged = model._merge_loaded(init_vars, loaded, strict=False)
    assert merged['params']['conv']['kernel'].shape == (3, 3, 2, 4)
    # exact match loads under strict
    ok = model._merge_loaded(
        init_vars, {'params': {'conv': {
            'kernel': jnp.ones((3, 3, 2, 4)),
            'bias': jnp.ones((4,))}}}, strict=True)
    assert float(ok['params']['conv']['bias'][0]) == 1.0


def test_cosine_eta_min_is_absolute():
    """Regression: the reference's CosineAnnealingRestartLR eta_min is
    an absolute LR floor (lr_scheduler.py:57-97); as a multiplier
    schedule it must divide by the base lr."""
    from mrefsr_tpu.models.lr_scheduler import build_schedule
    base_lr = 1e-4
    sched = build_schedule({'type': 'CosineAnnealingRestartLR',
                            'periods': [10], 'restart_weights': [1],
                            'eta_min': 1e-7}, base_lr=base_lr)
    # at the end of the period the lr must hit eta_min, not
    # eta_min * base_lr
    lr_end = base_lr * float(sched(10))
    assert abs(lr_end - 1e-7) < 1e-12
    lr_start = base_lr * float(sched(0))
    assert abs(lr_start - base_lr) < 1e-12


def test_warmup_matches_reference_ramp():
    """Regression: the reference ramps lr * current_iter / warmup_iter
    while current_iter < warmup_iter (base_model.py:172-193). The optax
    count is 0 on the FIRST step (= iter 1), which must get 1/warmup —
    not 0, which silently made the whole first optimizer step a no-op."""
    from mrefsr_tpu.models.lr_scheduler import build_schedule
    sched = build_schedule({'type': 'MultiStepLR', 'milestones': [100],
                            'gamma': 0.5}, warmup_iter=10)
    assert abs(float(sched(0)) - 0.1) < 1e-6   # iter 1 -> 1/10
    assert abs(float(sched(8)) - 0.9) < 1e-6   # iter 9 -> 9/10
    assert abs(float(sched(9)) - 1.0) < 1e-6   # iter 10 -> schedule


def test_profiler_window_in_wave_mode(monkeypatch, tmp_path):
    """Regression: maybe_start used equality, so with steps_per_dispatch
    the K-at-a-time iter counter could step over profile_start_iter and
    the trace never fired; and a window open at loop exit was never
    finalized (close() was dead code)."""
    import mrefsr_tpu.utils.profiler as prof_mod
    calls = []
    monkeypatch.setattr(prof_mod.jax.profiler, 'start_trace',
                        lambda d: calls.append(('start', d)))
    monkeypatch.setattr(prof_mod.jax.profiler, 'stop_trace',
                        lambda: calls.append(('stop',)))
    p = prof_mod.StepProfiler({'logger': {'profile_start_iter': 100,
                                          'profile_num_steps': 5},
                               'path': {'experiments_root': str(tmp_path)}})
    # wave mode advances 8 at a time: 96 -> 104 skips 100
    for it in (8, 96, 104, 112):
        p.maybe_start(it)
        p.maybe_stop(it)
    assert calls == [('start', p.trace_dir), ('stop',)]
    # a window still open at loop exit is finalized by close(), and the
    # window never restarts after it is done
    calls.clear()
    p2 = prof_mod.StepProfiler({'logger': {'profile_start_iter': 4,
                                           'profile_num_steps': 100}})
    p2.maybe_start(4)
    p2.close()
    p2.maybe_start(8)
    assert calls == [('start', p2.trace_dir), ('stop',)]


def test_get_root_logger_redirects_file_per_run(tmp_path):
    """Regression: the name-keyed cache ignored log_file on later calls,
    so a second pipeline run in one process never got its own log file
    (its lines silently went to run 1's file)."""
    import logging
    import uuid

    from mrefsr_tpu.utils.logger import get_root_logger
    name = f'test_logger_{uuid.uuid4().hex[:8]}'
    f1 = tmp_path / 'run1.log'
    f2 = tmp_path / 'run2.log'
    logger = get_root_logger(logger_name=name, log_file=str(f1))
    logger.info('first run line')
    logger = get_root_logger(logger_name=name, log_file=str(f2))
    logger.info('second run line')
    for h in list(logger.handlers):
        h.close()
        logger.removeHandler(h)
    assert 'first run line' in f1.read_text()
    assert 'second run line' in f2.read_text()
    assert 'second run line' not in f1.read_text()


def test_auto_resume_honors_custom_experiments_root(tmp_path):
    """Regression: load_resume_state scanned the cwd-relative
    'experiments/<name>' instead of the derived path — with a custom
    experiments_root, --auto_resume silently restarted (and archived)
    the run."""
    import pickle

    from mrefsr_tpu.train import load_resume_state
    states_dir = tmp_path / 'custom_root' / 'exp1' / 'training_states'
    states_dir.mkdir(parents=True)
    state = {'epoch': 1, 'iter': 7, 'trees': {}}
    with open(states_dir / '7.state', 'wb') as f:
        pickle.dump(state, f)
    opt = {'auto_resume': True, 'name': 'exp1',
           'path': {'training_states': str(states_dir)}}
    loaded = load_resume_state(opt)
    assert loaded is not None and loaded['iter'] == 7
    assert opt['path']['resume_state'] == str(states_dir / '7.state')


def test_multistep_default_gamma_matches_reference():
    """Regression: the reference maps both MultiStepLR and
    MultiStepRestartLR onto MultiStepRestartLR with default gamma 0.1
    (reference lr_scheduler.py:6); the default here was 0.5 — a silent
    5x LR discrepancy at every milestone for configs omitting gamma."""
    from mrefsr_tpu.models.lr_scheduler import build_schedule
    sched = build_schedule({'type': 'MultiStepLR', 'milestones': [5]})
    assert abs(float(sched(4)) - 1.0) < 1e-6
    assert abs(float(sched(5)) - 0.1) < 1e-6
