"""Video SR models (reference basicsr/models/video_base_model.py,
edvr_model.py, video_gan_model.py).

The reference shards validation frames across DDP ranks and
``dist.reduce``s per-folder metric tensors; here frames are sharded
across JAX *processes* (multi-host) and summed with a host all-reduce —
within one host the whole 8-chip mesh acts as a single rank, so the
single-process path is a plain loop.
"""
from collections import Counter, OrderedDict
from os import path as osp

import numpy as np

from mrefsr_tpu.metrics import calculate_metric
from mrefsr_tpu.utils import get_root_logger, imwrite, tensor2img
from mrefsr_tpu.utils.dist_util import get_dist_info
from mrefsr_tpu.utils.registry import MODEL_REGISTRY

from .sr_model import SRModel
from .srgan_model import SRGANModel


@MODEL_REGISTRY.register()
class VideoBaseModel(SRModel):
    """Base video SR model: per-folder frame-sharded validation
    (reference video_base_model.py:15-160)."""

    def dist_validation(self, dataloader, current_iter, tb_logger,
                        save_img):
        dataset = dataloader.dataset
        dataset_name = dataset.opt['name']
        with_metrics = self.opt['val']['metrics'] is not None
        if with_metrics:
            if not hasattr(self, 'metric_results'):
                self.metric_results = {}
                num_frame_each_folder = Counter(dataset.data_info['folder'])
                for folder, num_frame in num_frame_each_folder.items():
                    self.metric_results[folder] = np.zeros(
                        (num_frame, len(self.opt['val']['metrics'])),
                        np.float32)
            self._initialize_best_metric_results(dataset_name)
            for folder in self.metric_results:
                self.metric_results[folder][:] = 0

        rank, world_size = get_dist_info()
        metric_data = dict()
        for idx in range(rank, len(dataset), world_size):
            val_data = dataset[idx]
            val_data['lq'] = val_data['lq'][None]
            val_data['gt'] = val_data['gt'][None]
            folder = val_data['folder']
            frame_idx, max_idx = val_data['idx'].split('/')
            lq_path = val_data['lq_path']

            self.feed_data(val_data)
            self.test()
            visuals = self.get_current_visuals()
            result_img = tensor2img(visuals['result'])
            metric_data['img'] = result_img
            if 'gt' in visuals:
                metric_data['img2'] = tensor2img(visuals['gt'])

            if save_img:
                if self.opt['is_train']:
                    raise NotImplementedError(
                        'saving image is not supported during training.')
                if 'vimeo' in dataset_name.lower():
                    split_result = lq_path.split('/')
                    img_name = (f'{split_result[-3]}_{split_result[-2]}_'
                                f'{split_result[-1].split(".")[0]}')
                else:
                    img_name = osp.splitext(osp.basename(lq_path))[0]
                if self.opt['val'].get('suffix'):
                    save_img_path = osp.join(
                        self.opt['path']['visualization'], dataset_name,
                        folder,
                        f'{img_name}_{self.opt["val"]["suffix"]}.png')
                else:
                    save_img_path = osp.join(
                        self.opt['path']['visualization'], dataset_name,
                        folder, f'{img_name}_{self.opt["name"]}.png')
                imwrite(result_img, save_img_path)

            if with_metrics:
                for metric_idx, opt_ in enumerate(
                        self.opt['val']['metrics'].values()):
                    result = calculate_metric(metric_data, opt_)
                    self.metric_results[folder][int(frame_idx),
                                                metric_idx] += result

        if with_metrics:
            self._reduce_metric_folders()
            if rank == 0:
                self._log_validation_metric_values(current_iter,
                                                   dataset_name, tb_logger)

    def _reduce_metric_folders(self):
        """Sum the per-folder metric arrays over hosts (replaces
        dist.reduce + barrier at reference video_base_model.py:102-106)."""
        import jax
        if jax.process_count() <= 1:
            return
        from jax.experimental import multihost_utils
        for folder, arr in self.metric_results.items():
            summed = multihost_utils.process_allgather(arr).sum(axis=0)
            self.metric_results[folder] = np.asarray(summed)

    def nondist_validation(self, dataloader, current_iter, tb_logger,
                           save_img):
        get_root_logger().warning('nondist_validation is not implemented. '
                                  'Run dist_validation.')
        self.dist_validation(dataloader, current_iter, tb_logger, save_img)

    def _log_validation_metric_values(self, current_iter, dataset_name,
                                      tb_logger):
        # average frames per folder, then folders (reference :118-160)
        metric_results_avg = {
            folder: arr.mean(axis=0)
            for folder, arr in self.metric_results.items()
        }
        total_avg_results = {metric: 0
                             for metric in self.opt['val']['metrics']}
        for folder, arr in metric_results_avg.items():
            for idx, metric in enumerate(total_avg_results.keys()):
                total_avg_results[metric] += arr[idx]
        for metric in total_avg_results:
            total_avg_results[metric] /= len(metric_results_avg)
            self._update_best_metric_result(
                dataset_name, metric, total_avg_results[metric],
                current_iter)

        log_str = f'Validation {dataset_name}\n'
        for metric_idx, (metric, value) in enumerate(
                total_avg_results.items()):
            log_str += f'\t # {metric}: {value:.4f}'
            for folder, arr in metric_results_avg.items():
                log_str += f'\t # {folder}: {arr[metric_idx]:.4f}'
            if hasattr(self, 'best_metric_results'):
                best = self.best_metric_results[dataset_name][metric]
                log_str += (f'\n\t    Best: {best["val"]:.4f} @ '
                            f'{best["iter"]} iter')
            log_str += '\n'
        get_root_logger().info(log_str)
        if tb_logger:
            for metric_idx, (metric, value) in enumerate(
                    total_avg_results.items()):
                tb_logger.add_scalar(f'metrics/{metric}', value,
                                     current_iter)
                for folder, arr in metric_results_avg.items():
                    tb_logger.add_scalar(f'metrics/{metric}/{folder}',
                                         arr[metric_idx], current_iter)


@MODEL_REGISTRY.register()
class EDVRModel(VideoBaseModel):
    """EDVR training (reference edvr_model.py:7-62): dcn offset convs get
    a separate LR (optax.multi_transform on path), and the first
    ``tsa_iter`` steps train only the TSA fusion params (freeze-mask)."""

    def __init__(self, opt):
        super().__init__(opt)
        if self.is_train:
            tsa_iter = opt['train'].get('tsa_iter')
            if tsa_iter:
                get_root_logger().info(
                    f'Only train TSA module for {tsa_iter} iters.')
                self._freeze_until = int(tsa_iter)
                self._freeze_keep = lambda path: 'fusion' in path

    def setup_optimizers(self):
        import optax
        train_opt = self.opt['train']
        dcn_lr_mul = train_opt.get('dcn_lr_mul', 1)
        get_root_logger().info(
            f'Multiple the learning rate for dcn with {dcn_lr_mul}.')
        optim_opt = dict(train_opt['optim_g'])
        optim_type = optim_opt.pop('type')
        base_lr = optim_opt.pop('lr')
        self.base_lrs = [base_lr, base_lr * dcn_lr_mul]
        if dcn_lr_mul == 1:
            self.tx = self.build_optimizer(optim_type, base_lr,
                                           self.schedule_fn, **optim_opt)
            return
        normal = self.build_optimizer(optim_type, base_lr,
                                      self.schedule_fn, **optim_opt)
        dcn = self.build_optimizer(optim_type, base_lr * dcn_lr_mul,
                                   self.schedule_fn, **optim_opt)

        def label_fn(params):
            import jax.tree_util as jtu
            return jtu.tree_map_with_path(
                lambda path, _: 'dcn' if 'dcn' in '.'.join(
                    str(getattr(k, 'key', k)) for k in path) else 'normal',
                params)

        self.tx = optax.multi_transform({'normal': normal, 'dcn': dcn},
                                        label_fn)


@MODEL_REGISTRY.register()
class VideoGANModel(SRGANModel, VideoBaseModel):
    """Video GAN model (reference video_gan_model.py:7-17): SRGAN
    training logic (init/optimizers/optimize/save) + VideoBaseModel
    validation, via the same MRO mixin."""
