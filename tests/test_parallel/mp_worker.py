"""Per-process worker for the 2-process multi-host tests.

Spawned by test_multihost.py with MP_PROC_ID / MP_NUM_PROCS /
JAX_COORDINATOR_ADDRESS in the environment (the generic env-rank launch
contract, the analog of the reference's torch.distributed.launch env
init at reference dist_util.py:21-25). Runs the REAL framework paths
over a 2-process x 2-local-device CPU mesh (gloo collectives) and prints
one ``REPORT {json}`` line the test asserts on.
"""
import json
import os
import sys
import types

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))))


def main():
    pid = int(os.environ['MP_PROC_ID'])
    nproc = int(os.environ['MP_NUM_PROCS'])
    import jax
    jax.config.update('jax_platforms', 'cpu')

    import numpy as np

    from mrefsr_tpu.utils.dist_util import get_dist_info, init_dist

    # env-rank init: coordinator address + topology all from env vars
    os.environ['JAX_NUM_PROCESSES'] = str(nproc)
    os.environ['JAX_PROCESS_ID'] = str(pid)
    init_dist('pytorch')
    rank, world = get_dist_info()
    assert (rank, world) == (pid, nproc), (rank, world, pid, nproc)
    report = {
        'rank': rank,
        'world': world,
        'local_devices': jax.local_device_count(),
        'global_devices': jax.device_count(),
    }

    # ---- EnlargedSampler: rank-strided shard (reference
    # data_sampler.py:39) — the test asserts disjointness + coverage
    from mrefsr_tpu.data.data_sampler import EnlargedSampler
    sampler = EnlargedSampler(list(range(8)), world, rank, ratio=2)
    sampler.set_epoch(3)
    report['sampler_indices'] = list(iter(sampler))

    # ---- put_sharded: per-process local batches must land as one
    # global batch (rows 0..L-1 from process 0, L..2L-1 from process 1)
    import jax.numpy as jnp

    from mrefsr_tpu.parallel import (batch_sharding, get_data_mesh,
                                     put_sharded, replicate_sharding)
    mesh = get_data_mesh()
    local = np.arange(4, dtype=np.float32).reshape(4, 1) + 100.0 * rank
    g = put_sharded(local, batch_sharding(mesh))
    report['global_batch_shape'] = list(g.shape)
    total = jax.jit(lambda x: jnp.sum(x),
                    out_shardings=replicate_sharding(mesh))(g)
    report['global_batch_sum'] = float(total)

    # ---- the real SRModel data-parallel train path: identical seeds ->
    # replicated init; per-rank DIFFERENT batches -> XLA all-reduced
    # grads -> identical updated params on every host
    from mrefsr_tpu.models import build_model
    opt = {
        'name': 'mp_srmodel', 'model_type': 'SRModel', 'scale': 4,
        'num_gpu': None, 'manual_seed': 7, 'is_train': True, 'dist': True,
        'rank': rank, 'world_size': world,
        'network_g': {'type': 'MSRResNet', 'num_in_ch': 3,
                      'num_out_ch': 3, 'num_feat': 4, 'num_block': 1,
                      'upscale': 4},
        'path': {'pretrain_network_g': None},
        'train': {'ema_decay': 0.999,
                  'optim_g': {'type': 'Adam', 'lr': 1e-3,
                              'betas': [0.9, 0.99]},
                  'scheduler': {'type': 'MultiStepLR',
                                'milestones': [1000000], 'gamma': 0.5},
                  'pixel_opt': {'type': 'L1Loss', 'loss_weight': 1.0,
                                'reduction': 'mean'},
                  'total_iter': 10},
        'val': {},
        'logger': {},
    }
    model = build_model(opt)
    rng = np.random.RandomState(100 + rank)  # rank-DIFFERENT data
    for it in range(1, 3):
        batch = {
            'lq': rng.rand(2, 8, 8, 3).astype(np.float32),
            'gt': rng.rand(2, 32, 32, 3).astype(np.float32),
        }
        model.feed_data(batch)
        model.optimize_parameters(it)
    report['l_pix'] = float(model.log_dict['l_pix'])
    leaves = jax.tree_util.tree_leaves(model.variables)
    report['param_checksum'] = float(
        sum(jnp.sum(jnp.abs(leaf)) for leaf in leaves))

    # ---- per-process validation metric reduction
    # (VideoBaseModel._reduce_metric_folders over process_allgather,
    # replaces reference video_base_model.py:102-106)
    from mrefsr_tpu.models.video_base_model import VideoBaseModel
    holder = types.SimpleNamespace(
        metric_results={'folder': np.full((3, 2), float(rank + 1),
                                          np.float32)})
    VideoBaseModel._reduce_metric_folders(holder)
    report['reduced_metrics'] = np.asarray(
        holder.metric_results['folder']).tolist()

    # ---- image-sharded Ref/MultiRef dist_validation (beyond the
    # reference's rank-0-only CUFED5 eval): idx rank::world per process,
    # allgather-summed sums -> identical full-set averages everywhere.
    # The heavy eval forward is stubbed (covered by the eval-parity
    # tests); this exercises the sharding + reduction + finalize logic.
    from mrefsr_tpu.models.multi_ref_restoration_model import \
        MultiRefRestorationModel
    m = MultiRefRestorationModel.__new__(MultiRefRestorationModel)
    m.opt = {'is_train': False, 'rank': rank, 'world_size': world,
             'dist': True, 'crop_border': 0, 'name': 'mp',
             'path': {'visualization': '/tmp/mp_vis'}}
    rng_val = np.random.RandomState(0)  # identical across ranks
    items = []  # UNbatched samples, as a real dataset returns them
    for i in range(5):  # odd count: unequal shards must not deadlock
        gt = rng_val.rand(16, 16, 3).astype(np.float32)
        noise = (rng_val.rand(16, 16, 3) * (0.02 + 0.02 * i)) \
            .astype(np.float32)
        items.append({'lq_path': f'im_{i}.png',
                      'gt': gt,
                      'rlt': np.clip(gt + noise, 0., 1.)})
    evaluated = []

    def fake_feed(d):
        evaluated.append(d['lq_path'][0])
        m._vd = d

    m.feed_data = fake_feed
    m.test = lambda: None
    m.get_current_visuals = lambda: {'rlt': m._vd['rlt'],
                                     'gt': m._vd['gt']}

    class FakeDataset:
        """Indexable like a real val dataset; counts decodes so the
        test can assert sharded loading (not just sharded forwards)."""
        opt = {'name': 'synthval'}

        def __len__(self):
            return len(items)

        def __getitem__(self, i):
            decoded.append(i)
            return dict(items[i])

    class FakeLoader:
        dataset = FakeDataset()

        def __iter__(self):
            from mrefsr_tpu.data.loader import default_collate
            return (default_collate([self.dataset[i]])
                    for i in range(len(items)))

    decoded = []
    loader = FakeLoader()
    m.dist_validation(loader, current_iter=1, tb_logger=None,
                      save_img=False)
    report['mref_dist_metrics'] = dict(m.metric_results)
    report['mref_evaluated'] = list(evaluated)
    report['mref_decoded'] = list(decoded)  # sharded LOADING, not just eval
    # single-process full-set oracle (same images on every rank)
    evaluated.clear()
    sums = m._validate_images(loader, 1, False)
    report['mref_fullset_avg'] = (sums[:3] / sums[3]).tolist()

    print('REPORT ' + json.dumps(report), flush=True)


if __name__ == '__main__':
    main()
