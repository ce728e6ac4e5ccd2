"""BaseModel: the training-strategy contract + shared services.

Rebuild of reference basicsr/models/base_model.py:13-383 with functional
TPU internals: instead of mutable torch modules/optimizers, each model
owns flax variable pytrees, optax optimizer states, and jitted step
functions. The public surface the pipelines call is unchanged —
``feed_data / optimize_parameters / save / validation /
update_learning_rate / resume_training``.

Shared services:
  * data-parallel placement over the device mesh (replaces the
    model_to_device DDP wrap, reference base_model.py:87-104) — params
    replicated, batches sharded, gradient all-reduce inserted by XLA
    inside jit;
  * optax optimizer/schedule factories (reference :106-124, :126-170);
  * EMA as a params pytree blended inside the train step (reference
    model_ema :75-82);
  * checkpoint save/load in the reference's ``.pth`` format
    (reference :198-306) plus a native ``.state`` trainer state
    (reference :308-356).
"""
import os
import os.path as osp
import pickle
import time

import jax
import jax.numpy as jnp
import numpy as np
import optax

from mrefsr_tpu.convert import (load_torch_state_dict, save_torch_checkpoint,
                                torch_to_flax)
from mrefsr_tpu.parallel import get_data_mesh, replicate, shard_batch
from mrefsr_tpu.utils import get_root_logger
from mrefsr_tpu.utils.dist_util import master_only

from .lr_scheduler import build_schedule


class BaseModel:

    def __init__(self, opt):
        self.opt = opt
        self.is_train = opt['is_train']
        self.mesh = get_data_mesh(opt.get('num_gpu'))
        self.log_dict = {}
        self.schedulers = []  # schedule fns (step -> multiplier)
        self.base_lrs = []    # base lr per optimizer group, for logging
        self.current_iter = 0
        self._rngs = jax.random.PRNGKey(opt.get('manual_seed') or 0)

    # ------------------------------------------------------------------ API
    def feed_data(self, data):
        raise NotImplementedError

    def optimize_parameters(self, current_iter):
        raise NotImplementedError

    def get_current_visuals(self):
        raise NotImplementedError

    def save(self, epoch, current_iter):
        raise NotImplementedError

    def validation(self, dataloader, current_iter, tb_logger,
                   save_img=False):
        """Dispatch dist/nondist validation (reference base_model.py:36-48).
        With a single controller process driving all chips, dist
        validation == nondist validation on process 0."""
        if self.opt['dist']:
            self.dist_validation(dataloader, current_iter, tb_logger,
                                 save_img)
        else:
            self.nondist_validation(dataloader, current_iter, tb_logger,
                                    save_img)

    def dist_validation(self, dataloader, current_iter, tb_logger,
                        save_img):
        if self.opt['rank'] == 0:
            self.nondist_validation(dataloader, current_iter, tb_logger,
                                    save_img)

    # --------------------------------------------------------- best metrics
    def _initialize_best_metric_results(self, dataset_name):
        """Track best metric per dataset (reference base_model.py:50-73)."""
        if hasattr(self, 'best_metric_results') and \
                dataset_name in self.best_metric_results:
            return
        if not hasattr(self, 'best_metric_results'):
            self.best_metric_results = {}
        record = {}
        for metric, content in self.opt['val']['metrics'].items():
            better = content.get('better', 'higher')
            init_val = float('-inf') if better == 'higher' else float('inf')
            record[metric] = {'better': better, 'val': init_val, 'iter': -1}
        self.best_metric_results[dataset_name] = record

    def _update_best_metric_result(self, dataset_name, metric, val,
                                   current_iter):
        rec = self.best_metric_results[dataset_name][metric]
        if rec['better'] == 'higher':
            if val >= rec['val']:
                rec['val'] = val
                rec['iter'] = current_iter
        elif val <= rec['val']:
            rec['val'] = val
            rec['iter'] = current_iter

    # ------------------------------------------------------------ rng utils
    def next_rng(self):
        self._rngs, sub = jax.random.split(self._rngs)
        return sub

    # ----------------------------------------------------------- optimizers
    def build_optimizer(self, optim_type, base_lr, schedule_fn, **kwargs):
        """optax optimizer with a schedule-modulated lr
        (reference get_optimizer, base_model.py:126-170)."""
        lr_fn = lambda step: base_lr * schedule_fn(step)  # noqa: E731
        kwargs.pop('lr', None)
        if optim_type == 'Adam':
            betas = kwargs.pop('betas', (0.9, 0.999))
            wd = kwargs.pop('weight_decay', 0)
            if wd:
                # torch.optim.Adam applies COUPLED L2 (decay added to
                # the gradient before the adaptive normalization), not
                # adamw's decoupled decay — match the reference's
                # trajectory exactly
                tx = optax.chain(
                    optax.add_decayed_weights(wd),
                    optax.scale_by_adam(b1=betas[0], b2=betas[1]),
                    optax.scale_by_learning_rate(lr_fn))
            else:
                tx = optax.adam(lr_fn, b1=betas[0], b2=betas[1])
        elif optim_type == 'AdamW':
            betas = kwargs.pop('betas', (0.9, 0.999))
            wd = kwargs.pop('weight_decay', 1e-2)
            tx = optax.adamw(lr_fn, b1=betas[0], b2=betas[1],
                             weight_decay=wd)
        elif optim_type == 'SGD':
            tx = optax.sgd(lr_fn, momentum=kwargs.pop('momentum', 0))
        else:
            raise NotImplementedError(
                f'optimizer {optim_type} is not supported yet.')
        return tx

    def setup_schedulers(self):
        """Parse the YAML scheduler block into a schedule fn
        (reference base_model.py:106-124)."""
        train_opt = self.opt['train']
        warmup_iter = train_opt.get('warmup_iter', -1)
        scheduler_opt = train_opt.get('scheduler')
        # the primary group's base lr, for the cosine schedule's
        # ABSOLUTE eta_min floor (multiplier = eta_min / base_lr)
        base_lr = (train_opt.get('optim_g') or {}).get('lr') \
            or train_opt.get('lr_g') or 1.0
        self.schedule_fn = build_schedule(scheduler_opt, warmup_iter,
                                          base_lr=base_lr)
        return self.schedule_fn

    def update_learning_rate(self, current_iter, warmup_iter=-1):
        """Schedules are pure functions of the step baked into optax;
        this records the iter for logging parity
        (reference base_model.py:172-193)."""
        self.current_iter = current_iter

    def get_current_learning_rate(self):
        # the optimizer's schedule count during iter i is i - 1 (optax
        # counts completed updates), so log the multiplier the step
        # actually applies
        mult = float(self.schedule_fn(self.current_iter - 1)) if hasattr(
            self, 'schedule_fn') else 1.0
        return [lr * mult for lr in self.base_lrs] or [0.0]

    # ------------------------------------------------------------------ eval
    def _prepare_eval_variables(self, variables, dtype=None, name='g'):
        """Per-validation-round eval copy of ``variables`` (cached by
        source-pytree identity), applying two transformations ONCE
        instead of on every jitted eval call:

        * **multi-process locality**: validation work is per-process —
          frame shards (reference video_base_model.py:46) or rank-0-only
          (reference multi_ref_restoration_model.py:310-316) — so the
          eval jit must be a process-LOCAL computation. The training
          variables are replicated over the *global* mesh; feeding them
          in would make every eval call a global SPMD program, and a
          different call count per process deadlocks the collective.
          Pull the (fully-replicated, hence locally-addressable) values
          to host and let the local jit re-place them.
        * **serving dtype** (``val: mixed_precision: bfloat16``): cast
          f32 leaves once, instead of re-materializing a transient bf16
          copy of all params inside the step on every invocation.
        """
        cache = getattr(self, '_eval_vars_cache', None)
        if cache is None:
            cache = self._eval_vars_cache = {}
        hit = cache.get(name)
        if hit is not None and hit[0] is variables and hit[1] == dtype:
            return hit[2]
        out = variables
        if jax.process_count() > 1:
            out = jax.tree_util.tree_map(np.asarray, out)
        if dtype is not None:
            out = jax.tree_util.tree_map(
                lambda v: v.astype(dtype)
                if v.dtype == jnp.float32 else v, out)
        cache[name] = (variables, dtype, out)
        return out

    # ------------------------------------------------------------------ EMA
    @staticmethod
    def ema_update(ema_params, params, decay):
        """params_ema = decay*ema + (1-decay)*params
        (reference model_ema, base_model.py:75-82)."""
        return jax.tree_util.tree_map(
            lambda e, p: e * decay + p * (1 - decay), ema_params, params)

    # ------------------------------------------------------------ checkpoint
    @master_only
    def save_network(self, params_list, net_label, current_iter,
                     param_key='params'):
        """Save network params as a reference-format .pth
        (reference base_model.py:198-243): ``{param_key: state_dict}``
        with torch OIHW layouts, retried 3 times."""
        if current_iter == -1:
            current_iter = 'latest'
        save_filename = f'{net_label}_{current_iter}.pth'
        save_path = osp.join(self.opt['path']['models'], save_filename)

        if not isinstance(params_list, list):
            params_list = [params_list]
        if not isinstance(param_key, list):
            param_key = [param_key]
        assert len(params_list) == len(param_key)

        import torch
        from mrefsr_tpu.convert import flax_to_torch
        save_dict = {}
        for params_, key_ in zip(params_list, param_key):
            params_np = jax.tree_util.tree_map(np.asarray,
                                               params_.get('params',
                                                           params_))
            bs = params_.get('batch_stats') if isinstance(params_, dict) \
                else None
            # SN power-iteration buffers save as weight_orig/u/v like
            # torch.nn.utils.spectral_norm (keeps the saved .pth loadable
            # by the reference and round-trippable here)
            sn = params_.get('spectral') if isinstance(params_, dict) \
                else None
            sd = {k: torch.from_numpy(np.ascontiguousarray(v))
                  for k, v in flax_to_torch(params_np, bs,
                                            spectral=sn).items()}
            save_dict[key_] = sd

        for retry in range(3):
            try:
                torch.save(save_dict, save_path)
                break
            except Exception as e:
                get_root_logger().warning(
                    f'Save model error: {e}, remaining retry times: '
                    f'{2 - retry}')
                time.sleep(1)
        else:
            get_root_logger().warning(
                f'Still cannot save {save_path}. Just ignore it.')

    def load_network(self, load_path, strict=True, param_key='params',
                     rename=None):
        """Load a .pth into flax variables
        (reference base_model.py:280-306, incl. params_ema->params
        fallback). Returns the variables dict."""
        logger = get_root_logger()
        # key selection (incl. the params_ema -> params fallback) lives
        # in load_torch_state_dict — passing None here used to strip the
        # 'params' entry first, silently loading NON-EMA weights for
        # every param_key='params_ema' request on dual-key files
        sd = load_torch_state_dict(load_path, param_key=param_key)
        logger.info(f'Loading model from {load_path} '
                    f'[param_key: {param_key}].')
        variables = torch_to_flax(sd, rename=rename)
        return jax.tree_util.tree_map(jnp.asarray, variables)

    @master_only
    def save_training_state(self, epoch, current_iter, state_trees=None):
        """Serialize trainer state (reference base_model.py:308-341):
        {epoch, iter, opt_states...} into ``<iter>.state``."""
        if current_iter == -1:
            return
        from flax import serialization
        state = {
            'epoch': epoch,
            'iter': current_iter,
            'trees': {
                k: serialization.to_bytes(
                    jax.tree_util.tree_map(np.asarray, v))
                for k, v in (state_trees or {}).items()
            },
        }
        save_filename = f'{current_iter}.state'
        save_path = osp.join(self.opt['path']['training_states'],
                             save_filename)
        for retry in range(3):
            try:
                with open(save_path, 'wb') as f:
                    pickle.dump(state, f)
                break
            except Exception as e:
                get_root_logger().warning(
                    f'Save training state error: {e}, remaining retry '
                    f'times: {2 - retry}')
                time.sleep(1)

    def load_training_state(self, path):
        with open(path, 'rb') as f:
            return pickle.load(f)

    def resume_training(self, resume_state):
        """Restore optimizer/EMA states (reference base_model.py:343-356).
        Concrete models override to deserialize their own trees."""
        raise NotImplementedError

    # -------------------------------------------------------------- logging
    def _merge_loaded(self, init_vars, loaded_vars, strict=False):
        """Overlay loaded arrays onto the initialized structure
        (reference _print_different_keys_loading, base_model.py:245-278).
        strict=False logs missing/unexpected/size-mismatched keys and
        keeps the initialized values; strict=True raises on any of them
        (torch load_state_dict(strict=True) semantics)."""
        import jax.numpy as jnp
        logger = get_root_logger()
        problems = []

        def report(msg):
            problems.append(msg)
            if not strict:
                logger.warning(msg)

        def merge(init_node, loaded_node, path=''):
            if not isinstance(init_node, dict):
                if loaded_node is None:
                    report(f'missing key in checkpoint: {path}')
                    return init_node
                if hasattr(loaded_node, 'shape') and \
                        tuple(loaded_node.shape) != tuple(init_node.shape):
                    report(f'Size different for {path}: ckpt '
                           f'{loaded_node.shape} vs model '
                           f'{init_node.shape}; ignored.')
                    return init_node
                return jnp.asarray(loaded_node)
            out = {}
            for k, v in init_node.items():
                lv = loaded_node.get(k) if isinstance(loaded_node, dict) \
                    else None
                out[k] = merge(v, lv, f'{path}.{k}' if path else k)
            if isinstance(loaded_node, dict):
                for k in loaded_node:
                    if k not in init_node:
                        report(f'unexpected ckpt key: '
                               f'{path}.{k}' if path else k)
            return out

        merged = merge(init_vars, loaded_vars)
        if strict and problems:
            raise ValueError(
                'Checkpoint does not match the network (strict load): '
                + '; '.join(problems[:20])
                + (f'; ... {len(problems) - 20} more'
                   if len(problems) > 20 else ''))
        return merged

    def _load_vgg_variables(self, vgg_module):
        """VGG weights for perceptual/texture losses: from
        path.vgg_pretrain_path (torchvision-layout .pth) if given, else
        random init (tests). Shared by the SRModel family and the
        Ref/MultiRef models' legacy perceptual losses."""
        import jax
        import jax.numpy as jnp
        from mrefsr_tpu.archs.vgg_arch import vgg_rename
        path = self.opt['path'].get('vgg_pretrain_path')
        if path:
            from mrefsr_tpu.convert import load_torch_state_dict, \
                torch_to_flax
            sd = load_torch_state_dict(path, param_key=None)
            variables = torch_to_flax(sd,
                                      rename=vgg_rename(
                                          vgg_module.vgg_type))
            return jax.tree_util.tree_map(jnp.asarray, variables)
        dummy = jnp.zeros((1, 32, 32, 3), jnp.float32)
        return vgg_module.init(jax.random.PRNGKey(0), dummy)

    @staticmethod
    def _as_f32(v):
        """Batch input -> float32, host or device. Device arrays from
        BackgroundDevicePrefetcher pass through untouched (they are
        already f32 on the mesh — a np.asarray here would pull them
        back to the host); host arrays get the usual f32 view. Host
        uint8 arrays (``output_dtype: uint8`` datasets consumed by a
        prefetcher that does not transfer them) get the same
        ``astype(f32)/255.`` the device path applies — without this,
        pairing uint8 shipping with the CPU prefetcher would silently
        train on [0, 255] inputs."""
        if isinstance(v, jax.Array):
            return v
        arr = np.asarray(v)
        if arr.dtype == np.uint8:
            return arr.astype(np.float32) / 255.
        return np.asarray(arr, np.float32)

    def get_current_log(self):
        # device scalars convert here, NOT in reduce_loss_dict: reading
        # a loss right after dispatch would block the host on the whole
        # step/wave and serialize compute against the next wave's
        # loader+H2D work. Logging happens at print_freq, so this sync
        # is rare and cheap.
        return {k: float(v) for k, v in self.log_dict.items()}

    def reduce_loss_dict(self, loss_dict):
        """Average losses for logging (reference base_model.py:358-383).
        With a single controller the jitted step already returns
        globally-reduced means; values stay as (async) device scalars
        and become python floats lazily in get_current_log.

        Doubles as the dispatch throttle: block on the PREVIOUS
        dispatch's losses before returning, so the host runs at most
        ONE step/wave ahead (double buffering — the next wave's loader
        work and H2D overlap this wave's compute, but the dispatch
        queue and its input buffers stay bounded)."""
        import jax
        prev = getattr(self, '_pending_sync', None)
        if prev is not None:
            jax.block_until_ready(prev)
        vals = [v for v in loss_dict.values()
                if hasattr(v, 'block_until_ready')]
        self._pending_sync = vals[0] if vals else None
        return dict(loss_dict)

    def print_network(self, net):
        logger = get_root_logger()
        logger.info(f'Network: {net.__class__.__name__}')
