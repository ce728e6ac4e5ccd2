"""train.py CLI runs TO COMPLETION (regression: a loop-bound rewrite
once made the epoch loop spin forever at total_iters — every in-tree
run was killed by an external timeout, so only a completion assertion
catches this class of bug). Runs the real CLI in a subprocess on tiny
synthetic paired data, per-step and wave-dispatch variants."""
import os
import os.path as osp
import subprocess
import sys

import cv2
import numpy as np
import pytest

REPO = osp.dirname(osp.dirname(osp.dirname(osp.abspath(__file__))))


@pytest.fixture(scope='module')
def tiny_paired(tmp_path_factory):
    root = tmp_path_factory.mktemp('pipe')
    (root / 'gt').mkdir()
    (root / 'lq').mkdir()
    rng = np.random.RandomState(0)
    for name in ['a', 'b', 'c', 'd']:
        gt = (rng.rand(32, 32, 3) * 255).astype(np.uint8)
        cv2.imwrite(str(root / 'gt' / f'{name}.png'), gt)
        lq = cv2.resize(gt, (8, 8), interpolation=cv2.INTER_CUBIC)
        cv2.imwrite(str(root / 'lq' / f'{name}.png'), lq)
    return root


def write_yml(root, name, extra_train='', extra_dataset=''):
    yml = root / f'{name}.yml'
    yml.write_text(f"""
name: {name}
model_type: SRModel
scale: 4
num_gpu: 1
manual_seed: 0
datasets:
  train:
    name: tiny
    type: PairedImageDataset
    dataroot_gt: {root}/gt
    dataroot_lq: {root}/lq
    io_backend: {{type: disk}}
    gt_size: 32
    use_hflip: false
    use_rot: false
    use_shuffle: true
    num_worker_per_gpu: 1
    batch_size_per_gpu: 2
    dataset_enlarge_ratio: 2
{extra_dataset}
network_g: {{type: MSRResNet, num_in_ch: 3, num_out_ch: 3, num_feat: 4,
             num_block: 1, upscale: 4}}
path: {{pretrain_network_g: ~, strict_load: true, resume_state: ~}}
train:
  ema_decay: 0
  optim_g: {{type: Adam, lr: !!float 1e-3, weight_decay: 0,
             betas: [0.9, 0.99]}}
  scheduler: {{type: MultiStepLR, milestones: [100000], gamma: 0.5}}
  total_iter: 5
  warmup_iter: -1
  pixel_opt: {{type: L1Loss, loss_weight: 1.0, reduction: mean}}
{extra_train}
logger: {{print_freq: 2, use_tb_logger: false,
          save_checkpoint_freq: 100}}
""")
    return str(yml)


@pytest.mark.parametrize('mode,extra,extra_ds', [
    ('perstep', '', ''),
    ('wave', '  steps_per_dispatch: 2', ''),
    # wave size 3 does NOT divide the 4-iter epoch, and the device
    # prefetcher is in the loop: the epoch-tail wave consumes the
    # end-of-epoch sentinel and the loop bottom calls next() once more
    # (regression: a single-sentinel prefetcher queue hung here
    # forever; completion of this leg proves the boundary drains)
    ('wave_device_tail', '  steps_per_dispatch: 3',
     '    prefetch_mode: device'),
])
def test_train_cli_completes(tiny_paired, mode, extra, extra_ds):
    yml = write_yml(tiny_paired, f'pipe_{mode}', extra, extra_ds)
    env = dict(os.environ, JAX_PLATFORMS='cpu')
    proc = subprocess.run(
        [sys.executable, 'train.py', '-opt', yml], cwd=REPO, env=env,
        capture_output=True, text=True, timeout=600)
    assert proc.returncode == 0, proc.stderr[-2000:]
    log = proc.stdout + proc.stderr
    assert 'End of training' in log, log[-2000:]
    assert 'iter:       4,' in log or 'iter:        4,' in log, \
        log[-2000:]


def test_train_cli_graceful_preemption(tiny_paired, tmp_path):
    """SIGTERM mid-run = graceful preemption (mrefsr_tpu/train.py
    _install_preemption_handler): the process finishes the in-flight
    step, writes a resumable .state, and exits 0 — then --auto_resume
    picks up from the preempted iter. The reference has no counterpart
    (a TERM there loses everything since the last checkpoint_freq)."""
    import signal
    import time as _time
    exp_root = tmp_path / 'exp'
    yml = write_yml(tiny_paired, 'pipe_preempt')
    text = open(yml).read().replace(
        'path: {pretrain_network_g: ~, strict_load: true, '
        'resume_state: ~}',
        f'path: {{pretrain_network_g: ~, strict_load: true, '
        f'resume_state: ~, experiments_root: {exp_root}}}')
    open(yml, 'w').write(text)
    env = dict(os.environ, JAX_PLATFORMS='cpu')
    out_path = tmp_path / 'out.log'
    with open(out_path, 'w') as out:
        proc = subprocess.Popen(
            [sys.executable, 'train.py', '-opt', yml,
             '--force_yml', 'train:total_iter=500',
             'logger:save_checkpoint_freq=100000',
             'logger:print_freq=1'],
            cwd=REPO, env=env, stdout=out, stderr=subprocess.STDOUT)
        # wait until it is actually stepping, then preempt. The marker
        # must be one only an ITERATION log line carries ('l_pix'):
        # matching 'iter:' raced, because the startup options dump
        # contains 'total_iter:' — the TERM then landed before the
        # preemption handler installs (= before the train loop) and
        # killed the process with the default disposition.
        deadline = _time.time() + 300
        while _time.time() < deadline:
            if 'l_pix' in open(out_path).read():
                break
            if proc.poll() is not None:
                break
            _time.sleep(0.5)
        assert proc.poll() is None, open(out_path).read()[-2000:]
        proc.send_signal(signal.SIGTERM)
        rc = proc.wait(timeout=120)
    log = open(out_path).read()
    assert rc == 0, log[-2000:]
    assert 'Preemption signal received' in log, log[-2000:]
    states = os.listdir(osp.join(str(exp_root), 'pipe_preempt',
                                 'training_states'))
    assert states, 'no resumable state saved on preemption'
    saved_iter = max(int(float(s.split('.state')[0])) for s in states)
    assert saved_iter >= 1

    run2 = subprocess.run(
        [sys.executable, 'train.py', '-opt', yml, '--auto_resume',
         '--force_yml', f'train:total_iter={saved_iter + 2}',
         'logger:save_checkpoint_freq=100000'],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=600)
    assert run2.returncode == 0, run2.stderr[-2000:]
    log2 = run2.stdout + run2.stderr
    assert (f'Resuming training from epoch' in log2
            and f'iter: {saved_iter}' in log2), log2[-2000:]
    assert 'End of training' in log2, log2[-2000:]


def test_train_cli_auto_resume(tiny_paired, tmp_path):
    """--auto_resume continues a killed run from the newest .state
    through the REAL CLI (reference basicsr/train.py:68-88): run to
    iter 4 (checkpointing at 2 and 4), then relaunch the same yml with
    a longer total_iter — the second process must resume from iter 4
    (not restart at 0) and finish the remaining iters."""
    exp_root = tmp_path / 'exp'
    yml = write_yml(
        tiny_paired, 'pipe_resume',
        f'  experiments_root: {exp_root}\n')
    env = dict(os.environ, JAX_PLATFORMS='cpu')
    # write_yml puts experiments_root under train:, but it belongs in
    # path: — patch the file instead of growing the helper
    text = open(yml).read().replace(
        'path: {pretrain_network_g: ~, strict_load: true, '
        'resume_state: ~}',
        f'path: {{pretrain_network_g: ~, strict_load: true, '
        f'resume_state: ~, experiments_root: {exp_root}}}').replace(
        f'  experiments_root: {exp_root}\n', '')
    open(yml, 'w').write(text)

    run1 = subprocess.run(
        [sys.executable, 'train.py', '-opt', yml,
         '--force_yml', 'train:total_iter=4',
         'logger:save_checkpoint_freq=2'],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=600)
    assert run1.returncode == 0, run1.stderr[-2000:]
    states = os.listdir(osp.join(str(exp_root), 'pipe_resume',
                                 'training_states'))
    assert '4.state' in states, states

    run2 = subprocess.run(
        [sys.executable, 'train.py', '-opt', yml, '--auto_resume',
         '--force_yml', 'train:total_iter=8',
         'logger:save_checkpoint_freq=2'],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=600)
    assert run2.returncode == 0, run2.stderr[-2000:]
    log = run2.stdout + run2.stderr
    assert 'Resuming training from epoch' in log and 'iter: 4' in log, \
        log[-2000:]
    assert 'End of training' in log, log[-2000:]
    # the resumed run checkpointed the extension, not a restart
    states = os.listdir(osp.join(str(exp_root), 'pipe_resume',
                                 'training_states'))
    assert '8.state' in states, states
