"""2-process `train.py --launcher pytorch` END-TO-END (VERDICT r3 #6).

Two real OS processes run the full training CLI wired by
jax.distributed (gloo CPU collectives) — the complete analog of the
reference's `torch.distributed.launch` path (reference
dist_train.sh:14-16, dist_util.py:21-25) — and the result is compared
against a single-process run with the SAME GLOBAL BATCH:

  * EnlargedSampler host shards interleave rank-strided, so the
    2-process global batch holds exactly the same samples as the
    1-process batch (order permuted; the mean-reduced loss and
    gradients are order-invariant up to float reassociation);
  * the final checkpoints must therefore agree to float tolerance —
    the strongest statement that the dist data path + all-reduce
    really implement DDP semantics through the real CLI;
  * checkpoint/state files are written by rank 0 only
    (reference base_model.py @master_only).
"""
import os
import os.path as osp
import socket
import subprocess
import sys

import cv2
import numpy as np
import pytest
import torch

REPO = osp.dirname(osp.dirname(osp.dirname(osp.abspath(__file__))))
NPROC = 2


def _free_port():
    with socket.socket() as s:
        s.bind(('localhost', 0))
        return s.getsockname()[1]


@pytest.fixture(scope='module')
def data_root(tmp_path_factory):
    root = tmp_path_factory.mktemp('clidist')
    (root / 'gt').mkdir()
    (root / 'lq').mkdir()
    rng = np.random.RandomState(0)
    for name in 'abcd':
        gt = (rng.rand(32, 32, 3) * 255).astype(np.uint8)
        cv2.imwrite(str(root / 'gt' / f'{name}.png'), gt)
        cv2.imwrite(str(root / 'lq' / f'{name}.png'),
                    cv2.resize(gt, (8, 8), interpolation=cv2.INTER_CUBIC))
    return root


def _write_yml(root, name, batch_per_gpu, exp_root):
    # gt_size == image size: paired_random_crop has ONE valid position
    # and flips are off, so the sample VALUES are identical no matter
    # which worker/process draws them — batch composition is the only
    # degree of freedom the runs may differ in
    yml = root / f'{name}.yml'
    yml.write_text(f"""
name: {name}
model_type: SRModel
scale: 4
num_gpu: 1
manual_seed: 3
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
    batch_size_per_gpu: {batch_per_gpu}
    dataset_enlarge_ratio: 2
network_g: {{type: MSRResNet, num_in_ch: 3, num_out_ch: 3, num_feat: 4,
             num_block: 1, upscale: 4}}
path: {{pretrain_network_g: ~, strict_load: true, resume_state: ~,
        experiments_root: {exp_root}}}
train:
  ema_decay: 0
  optim_g: {{type: Adam, lr: !!float 1e-3, weight_decay: 0,
             betas: [0.9, 0.99]}}
  scheduler: {{type: MultiStepLR, milestones: [100000], gamma: 0.5}}
  total_iter: 4
  warmup_iter: -1
  pixel_opt: {{type: L1Loss, loss_weight: 1.0, reduction: mean}}
logger: {{print_freq: 1, use_tb_logger: false,
          save_checkpoint_freq: 4}}
""")
    return str(yml)


def _base_env():
    env = os.environ.copy()
    env.pop('PALLAS_AXON_POOL_IPS', None)
    env['JAX_PLATFORMS'] = 'cpu'
    env['XLA_FLAGS'] = '--xla_force_host_platform_device_count=1'
    return env


@pytest.fixture(scope='module')
def runs(data_root, tmp_path_factory):
    exp = tmp_path_factory.mktemp('exp')
    # 2-process: batch 2 per process -> global batch 4
    yml_d = _write_yml(data_root, 'cli_dist', 2, exp)
    port = _free_port()
    procs, outs = [], []
    for pid in range(NPROC):
        env = _base_env()
        env['JAX_COORDINATOR_ADDRESS'] = f'localhost:{port}'
        env['JAX_NUM_PROCESSES'] = str(NPROC)
        env['JAX_PROCESS_ID'] = str(pid)
        procs.append(subprocess.Popen(
            [sys.executable, 'train.py', '-opt', yml_d,
             '--launcher', 'pytorch'],
            cwd=REPO, env=env, stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT, text=True))
    try:
        for p in procs:
            out, _ = p.communicate(timeout=900)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for p, out in zip(procs, outs):
        assert p.returncode == 0, f'dist worker failed:\n{out[-4000:]}'

    # 1-process reference: global batch 4 in one process
    yml_s = _write_yml(data_root, 'cli_single', 4, exp)
    single = subprocess.run(
        [sys.executable, 'train.py', '-opt', yml_s], cwd=REPO,
        env=_base_env(), capture_output=True, text=True, timeout=900)
    assert single.returncode == 0, single.stderr[-4000:]
    return exp, outs, single.stdout + single.stderr


def test_both_complete(runs):
    # rank 1's logger is ERROR-gated (reference logger.py:175-176), so
    # only rank 0 and the single-process run narrate completion; both
    # dist workers exiting 0 is asserted in the fixture
    _, outs, single_log = runs
    assert 'End of training' in outs[0]
    assert 'End of training' in single_log


def test_rank0_only_writes(runs):
    exp, outs, _ = runs
    # rank 0 logs the save; rank 1's logger is gated to ERROR and its
    # @master_only save is a no-op
    assert 'Saving models and training states.' in outs[0]
    assert 'Saving models and training states.' not in outs[1]
    assert sorted(os.listdir(osp.join(exp, 'cli_dist', 'models'))) == [
        'net_g_4.pth', 'net_g_latest.pth']


def test_dist_checkpoint_matches_single_process(runs):
    exp, _, _ = runs
    sd_d = torch.load(osp.join(exp, 'cli_dist', 'models', 'net_g_4.pth'),
                      weights_only=True)['params']
    sd_s = torch.load(osp.join(exp, 'cli_single', 'models',
                               'net_g_4.pth'), weights_only=True)['params']
    assert set(sd_d) == set(sd_s)
    for k in sd_d:
        np.testing.assert_allclose(
            sd_d[k].float().numpy(), sd_s[k].float().numpy(),
            rtol=2e-5, atol=2e-6, err_msg=k)
