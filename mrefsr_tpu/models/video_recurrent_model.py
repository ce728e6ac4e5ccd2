"""Recurrent video SR models (reference
basicsr/models/video_recurrent_model.py, video_recurrent_gan_model.py).
"""
from collections import Counter
from os import path as osp

import jax.numpy as jnp
import numpy as np

from mrefsr_tpu.metrics import calculate_metric
from mrefsr_tpu.utils import get_root_logger, imwrite, tensor2img
from mrefsr_tpu.utils.dist_util import get_dist_info
from mrefsr_tpu.utils.registry import MODEL_REGISTRY

from .srgan_model import SRGANModel
from .video_base_model import VideoBaseModel


def _flow_multi_transform(model, lr_key='flow_lr_mul'):
    """optax.multi_transform giving 'spynet' params a scaled LR
    (reference video_recurrent_model.py:22-50). The GAN variant's
    absolute ``lr_flow`` (video_recurrent_gan_model.py:80-83) is also
    honored when present."""
    import optax
    train_opt = model.opt['train']
    flow_lr_mul = train_opt.get(lr_key, 1)
    optim_opt = dict(train_opt['optim_g'])
    optim_type = optim_opt.pop('type')
    base_lr = optim_opt.pop('lr')
    flow_lr = train_opt.get('lr_flow', base_lr * flow_lr_mul)
    get_root_logger().info(
        f'Flow network learning rate: {flow_lr}.')
    model.base_lrs = [base_lr, flow_lr]
    if flow_lr == base_lr:
        return model.build_optimizer(optim_type, base_lr,
                                     model.schedule_fn, **optim_opt)
    normal = model.build_optimizer(optim_type, base_lr, model.schedule_fn,
                                   **optim_opt)
    flow = model.build_optimizer(optim_type, flow_lr,
                                 model.schedule_fn, **optim_opt)

    def label_fn(params):
        import jax.tree_util as jtu
        return jtu.tree_map_with_path(
            lambda path, _: 'flow' if 'spynet' in '.'.join(
                str(getattr(k, 'key', k)) for k in path) else 'normal',
            params)

    return optax.multi_transform({'normal': normal, 'flow': flow},
                                 label_fn)


class _RecurrentValidationMixin:
    """Folder-level validation with flip-sequence self-ensemble
    (reference video_recurrent_model.py:66-197)."""

    center_frame_only = False

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
        num_folders = len(dataset)
        num_pad = (world_size - (num_folders % world_size)) % world_size
        # evaluate num_folders + num_pad times so every rank runs the
        # same count (reference :92-96)
        for i in range(rank, num_folders + num_pad, world_size):
            idx = min(i, num_folders - 1)
            val_data = dataset[idx]
            folder = val_data['folder']

            val_data['lq'] = val_data['lq'][None]
            val_data['gt'] = val_data['gt'][None]
            self.feed_data(val_data)
            self.test()
            visuals = self.get_current_visuals()

            if self.center_frame_only:
                visuals['result'] = visuals['result'][:, None]
                if 'gt' in visuals:
                    visuals['gt'] = visuals['gt'][:, None]

            if i < num_folders:
                for fidx in range(visuals['result'].shape[1]):
                    result_img = tensor2img(visuals['result'][0, fidx])
                    metric_data['img'] = result_img
                    if 'gt' in visuals:
                        metric_data['img2'] = tensor2img(
                            visuals['gt'][0, fidx])

                    if save_img:
                        if self.opt['is_train']:
                            raise NotImplementedError(
                                'saving image is not supported during '
                                'training.')
                        if self.center_frame_only:  # vimeo-90k
                            clip_ = val_data['lq_path'].split('/')[-3]
                            seq_ = val_data['lq_path'].split('/')[-2]
                            name_ = f'{clip_}_{seq_}'
                            img_path = osp.join(
                                self.opt['path']['visualization'],
                                dataset_name, folder,
                                f"{name_}_{self.opt['name']}.png")
                        else:
                            img_path = osp.join(
                                self.opt['path']['visualization'],
                                dataset_name, folder,
                                f"{fidx:08d}_{self.opt['name']}.png")
                        imwrite(result_img, img_path)

                    if with_metrics:
                        for metric_idx, opt_ in enumerate(
                                self.opt['val']['metrics'].values()):
                            result = calculate_metric(metric_data, opt_)
                            self.metric_results[folder][fidx,
                                                        metric_idx] += \
                                result

        if with_metrics:
            self._reduce_metric_folders()
            if rank == 0:
                self._log_validation_metric_values(current_iter,
                                                   dataset_name, tb_logger)

    def test(self):
        """Whole-clip forward with optional flip-sequence ensemble
        (reference video_recurrent_model.py:179-197)."""
        if self._eval_step is None:
            self._eval_step = self._build_eval_step()
        lq = jnp.asarray(self.lq)
        n = lq.shape[1]
        flip_seq = self.opt['val'].get('flip_seq', False)
        self.center_frame_only = self.opt['val'].get('center_frame_only',
                                                     False)
        if flip_seq:
            lq = jnp.concatenate([lq, lq[:, ::-1]], axis=1)
        variables = self.ema_variables if (
            self.ema_decay > 0 and self.ema_variables is not None) \
            else self.variables
        mp = (self.opt.get('val') or {}).get('mixed_precision')
        variables = self._prepare_eval_variables(
            variables, jnp.bfloat16 if mp == 'bfloat16' else None)
        output = self._eval_step(variables, lq)
        if flip_seq:
            output = 0.5 * (output[:, :n] + output[:, n:][:, ::-1])
        if self.center_frame_only:
            output = output[:, n // 2]
        self.output = output


@MODEL_REGISTRY.register()
class VideoRecurrentModel(_RecurrentValidationMixin, VideoBaseModel):
    """BasicVSR-style recurrent training
    (reference video_recurrent_model.py:15-197)."""

    def __init__(self, opt):
        super().__init__(opt)
        if self.is_train:
            fix_flow_iter = opt['train'].get('fix_flow')
            if fix_flow_iter:
                get_root_logger().info(
                    'Fix flow network and feature extractor for '
                    f'{fix_flow_iter} iters.')
                self._freeze_until = int(fix_flow_iter)
                self._freeze_keep = (
                    lambda path: 'spynet' not in path
                    and 'edvr' not in path)

    def setup_optimizers(self):
        self.tx = _flow_multi_transform(self)


@MODEL_REGISTRY.register()
class VideoRecurrentGANModel(_RecurrentValidationMixin, SRGANModel,
                             VideoBaseModel):
    """Recurrent video GAN (reference video_recurrent_gan_model.py:12-180):
    SRGAN alternating step over (b,t,...) sequences — frames flatten into
    the discriminator/VGG batch — plus recurrent validation."""

    def __init__(self, opt):
        super().__init__(opt)
        if self.is_train:
            fix_flow_iter = opt['train'].get('fix_flow')
            if fix_flow_iter and not isinstance(fix_flow_iter, bool):
                self._freeze_until = int(fix_flow_iter)
                self._freeze_keep = (
                    lambda path: 'spynet' not in path
                    and 'edvr' not in path)

    def setup_optimizers(self):
        train_opt = self.opt['train']
        self.tx = _flow_multi_transform(self)
        od = dict(train_opt['optim_d'])
        self.tx_d = self.build_optimizer(od.pop('type'), od.pop('lr'),
                                         self.schedule_fn, **od)
