"""SRModel: base single-image SR training strategy, functional TPU form.

Rebuild of reference basicsr/models/sr_model.py:15-231. The torch
forward/backward/step triple becomes one jitted train step (grads via
jax.value_and_grad, optax update, EMA blend) with the batch sharded over
the data mesh and params replicated — XLA inserts the gradient
all-reduce over ICI, replacing DDP.
"""
import os.path as osp
from collections import OrderedDict

import jax
import jax.numpy as jnp
import numpy as np
import optax

from mrefsr_tpu.archs import build_network
from mrefsr_tpu.losses import build_loss
from mrefsr_tpu.metrics import calculate_metric
from mrefsr_tpu.parallel import batch_sharding, put_sharded, replicate
from mrefsr_tpu.utils import get_root_logger, imwrite, tensor2img
from mrefsr_tpu.utils.registry import MODEL_REGISTRY

from .base_model import BaseModel


@MODEL_REGISTRY.register()
class SRModel(BaseModel):
    """Base SR model for single image super-resolution."""

    def __init__(self, opt):
        super().__init__(opt)
        self.net_g = build_network(opt['network_g'])
        self.variables = None
        self.ema_variables = None
        self.opt_state = None
        self._train_step = None
        self._eval_step = None

        self._pretrain_path = self.opt['path'].get('pretrain_network_g')
        self._param_key_g = self.opt['path'].get('param_key_g', 'params')
        self.ema_decay = 0
        # freeze schedule: until iter `_freeze_until`, zero the grads of
        # params whose path does NOT satisfy `_freeze_keep(path)` —
        # functional form of the reference's requires_grad_ phase switches
        # (edvr_model.py:50-61, video_recurrent_model.py:52-63). With Adam
        # moments starting at zero, zeroed grads leave params bit-exact.
        self._freeze_until = 0
        self._freeze_keep = None

        if self.is_train:
            self.init_training_settings()

    # ------------------------------------------------------------- settings
    def init_training_settings(self):
        train_opt = self.opt['train']
        self.ema_decay = train_opt.get('ema_decay', 0)
        if self.ema_decay > 0:
            get_root_logger().info(
                f'Use Exponential Moving Average with decay: '
                f'{self.ema_decay}')

        self.cri_pix = build_loss(train_opt['pixel_opt']) \
            if train_opt.get('pixel_opt') else None
        self.cri_perceptual = build_loss(train_opt['perceptual_opt']) \
            if train_opt.get('perceptual_opt') else None
        if self.cri_pix is None and self.cri_perceptual is None:
            raise ValueError('Both pixel and perceptual losses are None.')
        # opt-in bf16 compute: forward runs with bf16 params/activations
        # (MXU native rate), loss + grads + optimizer state stay f32
        self.mixed_precision = train_opt.get('mixed_precision')
        self.vgg_variables = None
        if self.cri_perceptual is not None:
            self.vgg_variables = self._load_vgg_variables(
                self.cri_perceptual.vgg)

        self.setup_schedulers()
        self.setup_optimizers()

    def setup_optimizers(self):
        train_opt = self.opt['train']
        optim_opt = dict(train_opt['optim_g'])
        optim_type = optim_opt.pop('type')
        base_lr = optim_opt.pop('lr')
        self.base_lrs = [base_lr]
        self.tx = self.build_optimizer(optim_type, base_lr,
                                       self.schedule_fn, **optim_opt)

    # -------------------------------------------------------- lazy init
    def _ensure_initialized(self, example_lq):
        if self.variables is not None:
            return
        rng = jax.random.PRNGKey(self.opt.get('manual_seed') or 0)
        self.variables = self.net_g.init(rng, jnp.asarray(example_lq[:1]))
        if self._pretrain_path is not None:
            strict_g = self.opt['path'].get('strict_load_g', True)
            loaded = self.load_network(self._pretrain_path,
                                       strict=strict_g,
                                       param_key=self._param_key_g)
            self.variables = self._merge_loaded(self.variables, loaded,
                                                strict=strict_g)
        self.variables = replicate(self.variables, self.mesh)
        if self.is_train:
            if self.ema_decay > 0:
                ema_path = self._pretrain_path
                self.ema_variables = None
                if ema_path is not None:
                    # load_network falls back params_ema -> params (with
                    # a log line) when the checkpoint has no EMA key;
                    # real load errors propagate loudly rather than
                    # silently re-seeding EMA from current params
                    loaded = self.load_network(ema_path, strict=True,
                                               param_key='params_ema')
                    self.ema_variables = self._merge_loaded(
                        self.variables, loaded)
                if self.ema_variables is None:
                    # distinct buffers: ema and params are both donated by
                    # the train step
                    self.ema_variables = jax.tree_util.tree_map(
                        jnp.copy, self.variables)
            if self.opt_state is None:
                self.opt_state = self.tx.init(self.variables['params'])
                if self._resume_trees is not None:
                    self._restore_trees()

    _resume_trees = None

    def _freeze_grads(self, grads, step_idx):
        """Apply the freeze schedule inside a jitted step (trace-safe)."""
        if not self._freeze_until or self._freeze_keep is None:
            return grads
        keep_fn = self._freeze_keep
        until = self._freeze_until
        import jax.tree_util as jtu

        def path_str(path):
            return '.'.join(
                str(getattr(k, 'key', getattr(k, 'idx', k))) for k in path)

        keep = jtu.tree_map_with_path(
            lambda path, g: float(bool(keep_fn(path_str(path)))), grads)
        # step_idx is 0-based (= current_iter - 1); the reference
        # unfreezes AT current_iter == until (edvr_model/
        # video_recurrent_model set requires_grad True before that
        # step), so only iters 1..until-1 train frozen
        return jax.tree_util.tree_map(
            lambda g, k: jnp.where(step_idx + 1 < until, g * k, g),
            grads, keep)

    # ----------------------------------------------------------- step fns
    def _build_train_step(self):
        net_apply = self.net_g.apply
        cri_pix = self.cri_pix
        cri_perceptual = self.cri_perceptual
        tx = self.tx
        ema_decay = self.ema_decay
        freeze_grads = self._freeze_grads
        mp = getattr(self, 'mixed_precision', None)

        def cast_fwd(params, lq):
            if mp != 'bfloat16':
                return params, lq
            bf = jnp.bfloat16
            params = jax.tree_util.tree_map(
                lambda p: p.astype(bf) if p.dtype == jnp.float32 else p,
                params)
            return params, lq.astype(bf)

        # stochastic depth (SwinIR drop_path_rate): supply a per-step
        # 'droppath' rng so training applies it like the reference; nets
        # without the attribute never see the rng (identity)
        use_droppath = getattr(self.net_g, 'drop_path_rate', 0.) and \
            self.is_train
        seed = self.opt.get('manual_seed') or 0

        def step(variables, opt_state, ema_variables, vgg_variables, lq,
                 gt, step_idx):
            def loss_fn(params):
                params_c, lq_c = cast_fwd(params, lq)
                rngs = {'droppath': jax.random.fold_in(
                    jax.random.PRNGKey(seed), step_idx)} \
                    if use_droppath else None
                output = net_apply({'params': params_c}, lq_c,
                                   rngs=rngs).astype(jnp.float32)
                losses = OrderedDict()
                total = 0.
                if cri_pix is not None:
                    l_pix = cri_pix(output, gt)
                    total += l_pix
                    losses['l_pix'] = l_pix
                if cri_perceptual is not None:
                    # video outputs are (b,t,h,w,c): flatten frames for VGG
                    flat = (lambda x: x.reshape((-1,) + x.shape[-3:])
                            if x.ndim == 5 else x)
                    l_percep, l_style = cri_perceptual(flat(output),
                                                       flat(gt),
                                                       vgg_variables)
                    if l_percep is not None:
                        total += l_percep
                        losses['l_percep'] = l_percep
                    if l_style is not None:
                        total += l_style
                        losses['l_style'] = l_style
                return total, losses

            params = variables['params']
            (_, losses), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(params)
            grads = freeze_grads(grads, step_idx)
            updates, opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            new_vars = dict(variables, params=params)
            if ema_decay > 0:
                ema_variables = jax.tree_util.tree_map(
                    lambda e, p: e * ema_decay + p * (1 - ema_decay),
                    ema_variables, new_vars)
            return new_vars, opt_state, ema_variables, losses

        # unjitted step for multi-step (wave) dispatch
        self._train_step_raw = step
        return jax.jit(step, donate_argnums=(0, 1, 2))

    def _build_eval_step(self):
        net_apply = self.net_g.apply
        # opt-in bf16 inference (val: mixed_precision: bfloat16) for the
        # whole SRModel family; output returns to f32 before the metric
        # path. Default stays f32 for reference-parity numerics. The
        # variables themselves are cast once per validation round in
        # _prepare_eval_variables, not per call.
        mp = (self.opt.get('val') or {}).get('mixed_precision')

        def step(variables, lq):
            if mp == 'bfloat16':
                lq = lq.astype(jnp.bfloat16)
            return net_apply(variables, lq).astype(jnp.float32)

        return jax.jit(step)

    # ---------------------------------------------------------------- API
    def feed_data(self, data):
        self.lq = np.asarray(data['lq'], np.float32)
        self._ensure_initialized(self.lq)
        self.gt = np.asarray(data['gt'], np.float32) \
            if 'gt' in data else None

    def optimize_parameters(self, current_iter):
        if self._train_step is None:
            self._train_step = self._build_train_step()
        sharding = batch_sharding(self.mesh)
        lq = put_sharded(self.lq, sharding)
        gt = put_sharded(self.gt, sharding)
        ema = self.ema_variables if self.ema_decay > 0 else None
        self.variables, self.opt_state, self.ema_variables, losses = \
            self._train_step(self.variables, self.opt_state, ema,
                             self.vgg_variables, lq, gt,
                             current_iter - 1)
        self.log_dict = self.reduce_loss_dict(losses)

    def optimize_parameters_wave(self, batches, first_iter):
        """K optimizer steps fused into one jitted lax.scan dispatch
        (``train: steps_per_dispatch``); trajectory-identical to
        per-step dispatch since LR schedules are pure functions of the
        step index. GAN-family subclasses override
        ``optimize_parameters`` with host-side alternation logic, so
        anything but a plain SRModel step falls back to per-step."""
        k = len(batches)
        overridden = type(self).optimize_parameters \
            is not SRModel.optimize_parameters
        if k == 1 or overridden:
            for j, b in enumerate(batches):
                self.feed_data(b)
                self.optimize_parameters(first_iter + j)
            return

        lqs, gts = [], []
        for b in batches:
            self.feed_data(b)  # lazy init + per-model normalization
            lqs.append(self.lq)
            gts.append(self.gt)
        if self._train_step is None:
            self._train_step = self._build_train_step()

        from jax.sharding import NamedSharding, PartitionSpec as P
        sh = NamedSharding(self.mesh, P(None, 'data'))
        # RealESRNet-style feed_data synthesizes lq/gt ON DEVICE —
        # np.stack would round-trip every batch through the host; stack
        # device arrays with jnp instead
        stack = jnp.stack if isinstance(lqs[0], jax.Array) else np.stack
        lq = put_sharded(stack(lqs), sh)
        gt = put_sharded(stack(gts), sh)

        if getattr(self, '_train_step_wave', None) is None:
            raw = self._train_step_raw

            # one jitted fn for every wave length (length baked in by
            # the stacked leading dim; jit caches each length)
            def wave(variables, opt_state, ema, vgg_vars, lq, gt, i0):
                def body(carry, xs):
                    v, os_, e = carry
                    lq_, gt_, idx = xs
                    v, os_, e, losses = raw(v, os_, e, vgg_vars, lq_,
                                            gt_, idx)
                    return (v, os_, e), losses
                (v, os_, e), losses = jax.lax.scan(
                    body, (variables, opt_state, ema),
                    (lq, gt, i0 + jnp.arange(lq.shape[0])))
                return v, os_, e, losses
            self._train_step_wave = jax.jit(wave,
                                            donate_argnums=(0, 1, 2))

        ema = self.ema_variables if self.ema_decay > 0 else None
        self.variables, self.opt_state, self.ema_variables, losses = \
            self._train_step_wave(self.variables, self.opt_state, ema,
                                  self.vgg_variables, lq, gt,
                                  jnp.asarray(first_iter - 1))
        self.log_dict = self.reduce_loss_dict(
            {name: v[-1] for name, v in losses.items()})

    def test(self):
        if self._eval_step is None:
            self._eval_step = self._build_eval_step()
        variables = self.ema_variables if (
            self.ema_decay > 0 and self.ema_variables is not None) \
            else self.variables
        mp = (self.opt.get('val') or {}).get('mixed_precision')
        variables = self._prepare_eval_variables(
            variables, jnp.bfloat16 if mp == 'bfloat16' else None)
        lq = jnp.asarray(self.lq)
        # opt-in recompile control for variable-size test sets: reflect-pad
        # LQ up to a multiple of `val.pad_multiple` (bucketing shapes into
        # far fewer compiled graphs), crop the output back
        pad_mult = (self.opt.get('val') or {}).get('pad_multiple', 0)
        if pad_mult:
            h, w = lq.shape[1:3]
            ph = (pad_mult - h % pad_mult) % pad_mult
            pw = (pad_mult - w % pad_mult) % pad_mult
            if ph or pw:
                lq = jnp.pad(lq, ((0, 0), (0, ph), (0, pw), (0, 0)),
                             mode='reflect')
        out = self._eval_step(variables, lq)
        if pad_mult:
            scale = self.opt['scale']
            out = out[:, :self.lq.shape[1] * scale,
                      :self.lq.shape[2] * scale]
        self.output = out

    # ------------------------------------------------------------- visuals
    def get_current_visuals(self):
        out_dict = OrderedDict()
        out_dict['lq'] = np.asarray(self.lq)
        out_dict['result'] = np.asarray(self.output)
        if self.gt is not None:
            out_dict['gt'] = np.asarray(self.gt)
        return out_dict

    # ---------------------------------------------------------- validation
    def nondist_validation(self, dataloader, current_iter, tb_logger,
                           save_img):
        dataset_name = dataloader.dataset.opt['name']
        with_metrics = self.opt['val'].get('metrics') is not None

        if with_metrics:
            if not hasattr(self, 'metric_results'):
                self.metric_results = {
                    metric: 0
                    for metric in self.opt['val']['metrics'].keys()
                }
            self._initialize_best_metric_results(dataset_name)
            self.metric_results = {m: 0 for m in self.metric_results}

        metric_data = dict()
        idx = -1
        for idx, val_data in enumerate(dataloader):
            lq_path = val_data['lq_path'][0] if isinstance(
                val_data['lq_path'], list) else val_data['lq_path']
            img_name = osp.splitext(osp.basename(lq_path))[0]
            self.feed_data(val_data)
            self.test()

            visuals = self.get_current_visuals()
            sr_img = tensor2img(visuals['result'])
            metric_data['img'] = sr_img
            if 'gt' in visuals:
                metric_data['img2'] = tensor2img(visuals['gt'])

            if save_img:
                if self.opt['is_train']:
                    save_img_path = osp.join(
                        self.opt['path']['visualization'], img_name,
                        f'{img_name}_{current_iter}.png')
                elif self.opt['val'].get('suffix'):
                    save_img_path = osp.join(
                        self.opt['path']['visualization'], dataset_name,
                        f'{img_name}_{self.opt["val"]["suffix"]}.png')
                else:
                    save_img_path = osp.join(
                        self.opt['path']['visualization'], dataset_name,
                        f'{img_name}_{self.opt["name"]}.png')
                imwrite(sr_img, save_img_path)

            if with_metrics:
                for name, opt_ in self.opt['val']['metrics'].items():
                    self.metric_results[name] += calculate_metric(
                        metric_data, opt_)

        if with_metrics and idx >= 0:
            for metric in self.metric_results.keys():
                self.metric_results[metric] /= (idx + 1)
                self._update_best_metric_result(
                    dataset_name, metric, self.metric_results[metric],
                    current_iter)
            self._log_validation_metric_values(current_iter, dataset_name,
                                               tb_logger)

    def _log_validation_metric_values(self, current_iter, dataset_name,
                                      tb_logger):
        log_str = f'Validation {dataset_name}\n'
        for metric, value in self.metric_results.items():
            log_str += f'\t # {metric}: {value:.4f}'
            if hasattr(self, 'best_metric_results'):
                best = self.best_metric_results[dataset_name][metric]
                log_str += (f'\tBest: {best["val"]:.4f} @ '
                            f'{best["iter"]} iter')
            log_str += '\n'
        get_root_logger().info(log_str)
        if tb_logger:
            for metric, value in self.metric_results.items():
                tb_logger.add_scalar(f'metrics/{dataset_name}/{metric}',
                                     value, current_iter)

    # ----------------------------------------------------------- save/load
    def save(self, epoch, current_iter):
        if self.ema_decay > 0 and self.ema_variables is not None:
            self.save_network([self.variables, self.ema_variables],
                              'net_g', current_iter,
                              param_key=['params', 'params_ema'])
        else:
            self.save_network(self.variables, 'net_g', current_iter)
        trees = {'opt_state_g': self.opt_state}
        self.save_training_state(epoch, current_iter, trees)

    def resume_training(self, resume_state):
        """Defer optimizer-state restore until params are initialized
        (reference base_model.py:343-356). Copies the dict — restore
        consumes entries as their optimizer states come up."""
        self._resume_trees = dict(resume_state.get('trees', {}))

    def _restore_trees(self):
        """Restore serialized optimizer trees once their live templates
        exist. GAN subclasses call this a second time after building
        the discriminator optimizer — entries whose template is still
        None stay pending (restoring into a freshly-initialized state
        would silently zero Adam moments and reset the LR schedule)."""
        from flax import serialization
        trees = self._resume_trees
        if 'opt_state_g' in trees:
            self.opt_state = serialization.from_bytes(
                self.opt_state, trees.pop('opt_state_g'))
        if 'opt_state_d' in trees:
            if getattr(self, 'opt_state_d', None) is None:
                return  # retried after the D optimizer is built
            self.opt_state_d = serialization.from_bytes(
                self.opt_state_d, trees.pop('opt_state_d'))
        self._resume_trees = None
