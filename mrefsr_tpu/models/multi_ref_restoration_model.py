"""Multi-reference restoration training strategy (the LMR north star).

Rebuild of reference basicsr/models/multi_ref_restoration_model.py:21-386:
three networks — frozen correspondence generator (net_map), frozen
contrastive VGG16 extractor (net_extractor), trainable MRAPA net (net_g)
— with per-parameter-group LRs for the DCN offset convs
('offset'/'small'/'medium' name routing, reference :60-89), a
pixel-pretrain phase then optional WGAN phase, and PSNR/PSNR_Y/SSIM_Y
validation with un-padding.

TPU form: the whole forward (extractor -> per-ref matching -> MRAPA) is
ONE jitted graph per step; the reference's per-ref python loops
(:198-205) are a T-into-batch fold, and the per-sample matching loop
(corres generation) is a vmap. Gradients flow only into net_g; the
frozen towers' variables ride along as untraced constants.
"""
import os
import os.path as osp
from collections import OrderedDict

import jax
import jax.numpy as jnp
import numpy as np
import optax

from mrefsr_tpu.archs import build_network
from mrefsr_tpu.losses import legacy_losses
from mrefsr_tpu.metrics import calculate_psnr, calculate_ssim
from mrefsr_tpu.parallel import batch_sharding, put_sharded, replicate
from mrefsr_tpu.utils import get_root_logger, imwrite, tensor2img
from mrefsr_tpu.utils.registry import MODEL_REGISTRY

from .base_model import BaseModel


def _drop_buffer_keys(key):
    """Drop torch buffers (imagenet mean/std) when importing extractor
    checkpoints (reference registers them as buffers,
    contras_extractor_arch.py:31-38; ours are constants)."""
    if key.endswith('.mean') or key.endswith('.std') or key in ('mean',
                                                                'std'):
        return None
    return key


@MODEL_REGISTRY.register()
class MultiRefRestorationModel(BaseModel):

    _multi_ref = True

    def __init__(self, opt):
        super().__init__(opt)
        self.net_map = build_network(opt['network_map'])
        self.net_extractor = build_network(opt['network_extractor'])
        self.net_g = build_network(opt['network_g'])
        self.net_d = build_network(opt['network_d']) \
            if opt.get('network_d') else None

        self.vars_map = None
        self.vars_extractor = None
        self.vars_g = None
        self.vars_d = None
        self.opt_state_g = None
        self.opt_state_d = None
        self._train_step_pix = None
        self._train_step_gan = None
        self._train_step_wave = None
        self._train_step_gan_wave = None
        self._eval_step = None
        self._resume_trees = None

        if self.is_train:
            self.init_training_settings()

    # ------------------------------------------------------------- settings
    def init_training_settings(self):
        train_opt = self.opt['train']
        logger = get_root_logger()

        # losses from the legacy module, fetched by name
        # (reference :116-168)
        if train_opt['pixel_weight'] > 0:
            cri_pix_cls = getattr(legacy_losses,
                                  train_opt['pixel_criterion'])
            self.cri_pix = cri_pix_cls(
                loss_weight=train_opt['pixel_weight'], reduction='mean')
        else:
            logger.info('Remove pixel loss.')
            self.cri_pix = None

        if train_opt.get('perceptual_opt'):
            self.cri_perceptual = legacy_losses.PerceptualLoss(
                **train_opt['perceptual_opt'])
        else:
            logger.info('Remove perceptual loss.')
            self.cri_perceptual = None

        if train_opt.get('style_opt'):
            self.cri_style = legacy_losses.PerceptualLoss(
                **train_opt['style_opt'])
        else:
            logger.info('Remove style loss.')
            self.cri_style = None

        # VGG towers for the legacy perceptual/style losses (the
        # reference builds them inside the loss module at
        # models/losses.py:141-240; here weights are explicit variables)
        self.vgg_variables = None
        self.vgg_style_variables = None
        if self.cri_perceptual is not None:
            self.vgg_variables = self._load_vgg_variables(
                self.cri_perceptual.vgg)
        if self.cri_style is not None:
            self.vgg_style_variables = self._load_vgg_variables(
                self.cri_style.vgg)

        if train_opt.get('gan_type'):
            self.cri_gan = legacy_losses.GANLoss(
                train_opt['gan_type'], real_label_val=1.0,
                fake_label_val=0.0, loss_weight=train_opt['gan_weight'])
            if train_opt.get('grad_penalty_weight', 0) > 0:
                self.cri_grad_penalty = legacy_losses.GradientPenaltyLoss(
                    loss_weight=train_opt['grad_penalty_weight'])
            else:
                logger.info('Remove gradient penalty.')
                self.cri_grad_penalty = None
        else:
            logger.info('Remove GAN loss.')
            self.cri_gan = None
            self.cri_grad_penalty = None

        self.net_g_pretrain_steps = train_opt['net_g_pretrain_steps']
        self.net_d_steps = train_opt.get('net_d_steps', 1)
        self.net_d_init_steps = train_opt.get('net_d_init_steps', 0)

        self.setup_schedulers()
        self._setup_optimizer_defs()
        self.log_dict = OrderedDict()

    def _setup_optimizer_defs(self):
        """Four-group Adam via optax.multi_transform with path-based labels
        (reference :60-89)."""
        train_opt = self.opt['train']
        wd = train_opt.get('weight_decay_g', 0)
        betas = train_opt.get('beta_g', [0.9, 0.999])
        self.base_lrs = [train_opt['lr_g'], train_opt['lr_offset'],
                         train_opt['lr_relu3_offset'],
                         train_opt['lr_relu2_offset']]

        def adam(lr):
            fn = lambda step: lr * self.schedule_fn(step)  # noqa: E731
            if wd:
                # coupled L2 like torch.optim.Adam (decay enters the
                # gradient before the adaptive normalization)
                return optax.chain(
                    optax.add_decayed_weights(wd),
                    optax.scale_by_adam(b1=betas[0], b2=betas[1]),
                    optax.scale_by_learning_rate(fn))
            return optax.adam(fn, b1=betas[0], b2=betas[1])

        transforms = {
            'g': adam(train_opt['lr_g']),
            'offset': adam(train_opt['lr_offset']),
            'relu3_offset': adam(train_opt['lr_relu3_offset']),
            'relu2_offset': adam(train_opt['lr_relu2_offset']),
        }

        def label_fn(params):
            def label(path):
                joined = '.'.join(str(p) for p in path)
                if 'offset' in joined:
                    if 'small' in joined:
                        return 'relu3_offset'
                    if 'medium' in joined:
                        return 'relu2_offset'
                    return 'offset'
                return 'g'

            flat = jax.tree_util.tree_map_with_path(
                lambda path, _: label(
                    tuple(getattr(k, 'key', str(k)) for k in path)),
                params)
            return flat

        self.tx_g = optax.multi_transform(transforms, label_fn)

        if self.net_d is not None:
            lr_d = train_opt['lr_d']
            beta_d = train_opt.get('beta_d', [0.9, 0.999])
            fn = lambda step: lr_d * self.schedule_fn(step)  # noqa: E731
            self.tx_d = optax.adam(fn, b1=beta_d[0], b2=beta_d[1])

    # ------------------------------------------------------------ lazy init
    def _ensure_initialized(self, batch):
        if self.vars_g is not None:
            return
        logger = get_root_logger()
        rng = jax.random.PRNGKey(self.opt.get('manual_seed') or 0)
        r1, r2, r3, r4 = jax.random.split(rng, 4)

        match_img_in = jnp.asarray(batch['img_in_up'][:1])
        refs = jnp.asarray(batch['img_ref_list'][:1])
        lq = jnp.asarray(batch['img_in_lq'][:1])

        def init_towers(r1, r2, r3, match_img_in, refs, lq):
            """All three net inits + the two bridging forwards in ONE
            traced computation. Eagerly, the b=1 extractor/matching
            forwards cost hundreds of op dispatches, each paying the
            device-tunnel round trip (~270 s of the round-2 driver
            bench); jitted they are one dispatch and the executable
            lands in the persistent compile cache."""
            vars_ex = self.net_extractor.init(
                r1, *self._extractor_args(match_img_in, refs))
            d1, d2 = self._apply_extractor(vars_ex, match_img_in, refs)
            b, t = refs.shape[0], refs.shape[1]
            d1_flat = jnp.broadcast_to(
                d1[:, None], (b, t) + d1.shape[1:]).reshape(
                (b * t,) + d1.shape[1:])
            d2_flat = d2.reshape((b * t,) + d2.shape[2:])
            refs_flat = refs.reshape((b * t,) + refs.shape[2:])
            vars_map = self.net_map.init(
                r2, {'dense_features1': d1_flat,
                     'dense_features2': d2_flat}, refs_flat)
            pre_offset, img_ref_feat = self._net_g_ref_inputs(
                *self._run_map(d1, d2, refs, vars_map))
            vars_g = self.net_g.init(r3, lq, pre_offset, img_ref_feat)
            return vars_ex, vars_map, vars_g

        if jax.default_backend() != 'cpu' or os.environ.get(
                'MREFSR_JIT_INIT'):
            init_towers = jax.jit(init_towers)
        (self.vars_extractor, self.vars_map,
         self.vars_g) = init_towers(r1, r2, r3, match_img_in, refs, lq)

        load_path = self.opt['path'].get(
            'pretrain_network_feature_extractor')
        if load_path:
            loaded = self.load_network(load_path, param_key='params',
                                       rename=_drop_buffer_keys)
            self.vars_extractor = self._merge(self.vars_extractor, loaded)
            logger.info('Loaded feature extractor from '
                        f'{load_path}')

        vgg_path = self.opt['path'].get('vgg_pretrain_path')
        if vgg_path:
            from mrefsr_tpu.archs.vgg_arch import vgg_rename
            from mrefsr_tpu.convert import (load_torch_state_dict,
                                            torch_to_flax)
            base = vgg_rename(self.net_map.vgg_type)

            def rename(key):
                r = base(key)
                return f'vgg.{r}' if r else None

            sd = load_torch_state_dict(vgg_path, param_key=None)
            loaded = torch_to_flax(sd, rename=rename)
            self.vars_map = self._merge(self.vars_map, loaded)
            logger.info(f'Loaded VGG for net_map from {vgg_path}')

        load_path = self.opt['path'].get('pretrain_network_g')
        if load_path:
            loaded = self.load_network(load_path, param_key='params')
            self.vars_g = self._merge(self.vars_g, loaded)
            logger.info(f'Loaded net_g from {load_path}')

        if self.net_d is not None:
            gt = jnp.asarray(batch['img_in'][:1])
            self.vars_d = self.net_d.init(r4, gt)
            load_path = self.opt['path'].get('pretrain_network_d')
            if load_path:
                loaded = self.load_network(load_path, param_key='params')
                self.vars_d = self._merge(self.vars_d, loaded)

        # replicate over the mesh
        self.vars_extractor = replicate(self.vars_extractor, self.mesh)
        self.vars_map = replicate(self.vars_map, self.mesh)
        self.vars_g = replicate(self.vars_g, self.mesh)
        if self.vars_d is not None:
            self.vars_d = replicate(self.vars_d, self.mesh)

        if self.is_train and self.opt_state_g is None:
            self.opt_state_g = self.tx_g.init(self.vars_g['params'])
            if self.net_d is not None:
                self.opt_state_d = self.tx_d.init(self.vars_d['params'])
            if self._resume_trees:
                self._restore_trees()

    def _merge(self, init_vars, loaded_vars, strict=False):
        return self._merge_loaded(init_vars, loaded_vars, strict=strict)

    # ---------------------------------------------------------- forward fns
    def _extractor_args(self, match_img_in, refs):
        """Example args for net_extractor.init — the single-ref subclass
        squeezes the T=1 axis (ContrasExtractorSep takes one ref)."""
        return match_img_in, refs

    def _apply_extractor(self, vars_ex, match_img_in, refs):
        """Run net_extractor; returns (d1 (B,h,w,C), d2 (B,T,h,w,C))."""
        feats = self.net_extractor.apply(vars_ex, match_img_in, refs)
        return feats['dense_features1'], feats['dense_features2']

    def _net_g_ref_inputs(self, pre_offset, img_ref_feat):
        """Adapt the stacked (B,T,...) map outputs to net_g's inputs —
        identity here (MRAPARestorationNet keeps the T axis); the
        single-ref subclass squeezes T=1 (RestorationNet takes
        un-stacked dicts)."""
        return pre_offset, img_ref_feat

    def _run_map(self, d1, d2, refs, vars_map=None):
        """Correspondence generation with the T refs folded into batch.

        d1: (B,h,w,C); d2: (B,T,h,w,C); refs: (B,T,H,W,3).
        Returns pre_offset / img_ref_feat dicts with (B,T,...) leaves.
        """
        b, t = refs.shape[0], refs.shape[1]
        d1_flat = jnp.broadcast_to(
            d1[:, None], (b, t) + d1.shape[1:]).reshape(
            (b * t,) + d1.shape[1:])
        d2_flat = d2.reshape((b * t,) + d2.shape[2:])
        refs_flat = refs.reshape((b * t,) + refs.shape[2:])
        pre_offset, img_ref_feat = self.net_map.apply(
            self.vars_map if vars_map is None else vars_map,
            {'dense_features1': d1_flat, 'dense_features2': d2_flat},
            refs_flat)
        unflat = lambda v: v.reshape((b, t) + v.shape[1:])  # noqa: E731
        pre_offset = {k: unflat(v) for k, v in pre_offset.items()}
        img_ref_feat = {k: unflat(v) for k, v in img_ref_feat.items()}
        return pre_offset, img_ref_feat

    def _forward(self, params_g, vars_ex, vars_map, match_img_in, refs,
                 lq):
        """Full 3-net forward. Frozen-tower variables are explicit args so
        jit treats them as inputs, not baked-in constants (a closure
        capture makes XLA constant-fold ~30M VGG params — pathological
        compile times)."""
        d1, d2 = self._apply_extractor(vars_ex, match_img_in, refs)
        pre_offset, img_ref_feat = self._net_g_ref_inputs(
            *self._run_map(d1, d2, refs, vars_map))
        return self.net_g.apply({'params': params_g}, lq, pre_offset,
                                img_ref_feat)

    def _build_train_step_pix(self):
        cri_pix = self.cri_pix
        tx = self.tx_g
        # opt-in bf16 compute (train: mixed_precision: bfloat16): frozen
        # towers, matching, and net_g forward run in bf16 (the DCN gather
        # rows halve); loss/grads/optimizer stay f32. pre_offset flows are
        # integer-valued and exact in bf16 at these resolutions.
        mp = self.opt['train'].get('mixed_precision')

        def cast_tree(tree, dtype):
            return jax.tree_util.tree_map(
                lambda v: v.astype(dtype)
                if v.dtype == jnp.float32 else v, tree)

        def step(vars_g, opt_state, vars_ex, vars_map, match_img_in, refs,
                 lq, gt, step_idx):
            if mp == 'bfloat16':
                bf = jnp.bfloat16
                vars_ex = cast_tree(vars_ex, bf)
                vars_map = cast_tree(vars_map, bf)
                match_img_in = match_img_in.astype(bf)
                refs = refs.astype(bf)
                lq = lq.astype(bf)

            def loss_fn(params):
                if mp == 'bfloat16':
                    params = cast_tree(params, jnp.bfloat16)
                output = self._forward(params, vars_ex, vars_map,
                                       match_img_in, refs, lq)
                return cri_pix(output.astype(jnp.float32), gt)

            l_pix, grads = jax.value_and_grad(loss_fn)(vars_g['params'])
            updates, opt_state = tx.update(grads, opt_state,
                                           vars_g['params'])
            params = optax.apply_updates(vars_g['params'], updates)
            return dict(vars_g, params=params), opt_state, \
                {'l_pix': l_pix}

        # unjitted step, for callers that fuse multiple steps into one
        # dispatch (lax.scan over steps — bench.py, wave training)
        self._train_step_pix_raw = step
        return jax.jit(step, donate_argnums=(0, 1))

    def _build_eval_step(self):
        # opt-in bf16 inference (val: mixed_precision: bfloat16): the
        # same cast policy as the bf16 train step — frozen towers, dense
        # matching, and net_g all compute in bf16; the restored image is
        # cast back to f32 before un-pad/metrics. Default stays f32 so
        # reported PSNR/SSIM match the reference bit policy.
        mp = (self.opt.get('val') or {}).get('mixed_precision')

        def step(vars_g, vars_ex, vars_map, match_img_in, refs, lq):
            if mp == 'bfloat16':
                bf = jnp.bfloat16
                match_img_in = match_img_in.astype(bf)
                refs = refs.astype(bf)
                lq = lq.astype(bf)
            out = self._forward(vars_g['params'], vars_ex, vars_map,
                                match_img_in, refs, lq)
            return out.astype(jnp.float32)

        return jax.jit(step)

    # ------------------------------------------------------------------ API
    # keys BackgroundDevicePrefetcher should place on the mesh (the
    # ref lq/up stacks ride along in batches for dataset parity but are
    # not consumed by this strategy — transferring them would triple
    # the H2D bytes)
    device_input_keys = ('img_in', 'img_in_lq', 'img_in_up',
                         'img_ref_list')

    def feed_data(self, data):
        self.img_in_lq = self._as_f32(data['img_in_lq'])
        self.img_ref_list = self._as_f32(data['img_ref_list'])
        self.gt = self._as_f32(data['img_in'])
        self.match_img_in = self._as_f32(data['img_in_up'])
        self._ensure_initialized({
            'img_in_up': self.match_img_in,
            'img_ref_list': self.img_ref_list,
            'img_in_lq': self.img_in_lq,
            'img_in': self.gt,
        })

    def optimize_parameters(self, step):
        sharding = batch_sharding(self.mesh)
        match_img_in = put_sharded(self.match_img_in, sharding)
        refs = put_sharded(self.img_ref_list, sharding)
        lq = put_sharded(self.img_in_lq, sharding)
        gt = put_sharded(self.gt, sharding)

        if step <= self.net_g_pretrain_steps or self.net_d is None:
            if self._train_step_pix is None:
                self._train_step_pix = self._build_train_step_pix()
            self.vars_g, self.opt_state_g, losses = self._train_step_pix(
                self.vars_g, self.opt_state_g, self.vars_extractor,
                self.vars_map, match_img_in, refs, lq, gt, step - 1)
            self.log_dict = self.reduce_loss_dict(losses)
        else:
            self._optimize_gan(step, match_img_in, refs, lq, gt)

    def _stack_wave(self, *arg_lists):
        """Stack per-step input lists along a leading wave axis, sharded
        (None, 'data'). Host arrays stack in numpy then transfer; device
        arrays (BackgroundDevicePrefetcher output — already on the mesh)
        stack ON DEVICE, so no host copy or re-transfer happens."""
        from jax.sharding import NamedSharding, PartitionSpec as P
        sh = NamedSharding(self.mesh, P(None, 'data'))
        out = []
        for arrs in arg_lists:
            if isinstance(arrs[0], jax.Array):
                out.append(jax.device_put(jnp.stack(arrs), sh))
            else:
                out.append(put_sharded(np.stack(arrs), sh))
        return out

    def optimize_parameters_wave(self, batches, first_iter):
        """Run ``len(batches)`` pixel-phase optimizer steps fused into
        ONE device dispatch: a jitted ``lax.scan`` threads
        (params, opt state) through the steps. This is the standard TPU
        multi-step training dispatch — it removes per-step host/dispatch
        latency entirely (the LR schedules are pure functions of the
        step index, so each scanned step sees its own LR). Enabled by
        ``train: steps_per_dispatch: K`` in the options YAML.

        GAN-phase waves are fused too (``_optimize_gan_wave``): the D/G
        alternation is pure arithmetic on the step index, so ``g_turn``
        is computed inside the scan body. Only a wave that CROSSES the
        pixel→GAN boundary (happens once per run) falls back to
        per-step dispatch.
        """
        k = len(batches)
        gan_phase = (self.net_d is not None
                     and first_iter > self.net_g_pretrain_steps)
        crosses = (self.net_d is not None and not gan_phase
                   and first_iter + k - 1 > self.net_g_pretrain_steps)
        if k == 1 or crosses:
            for j, b in enumerate(batches):
                self.feed_data(b)
                self.optimize_parameters(first_iter + j)
            return
        if gan_phase:
            self._optimize_gan_wave(batches, first_iter)
            return

        # normalize every batch through feed_data (the single-ref
        # subclass reshapes its ref there), then stack along a leading
        # step axis
        mis, refss, lqs, gts = [], [], [], []
        for b in batches:
            self.feed_data(b)  # also lazy param init on the first wave
            mis.append(self.match_img_in)
            refss.append(self.img_ref_list)
            lqs.append(self.img_in_lq)
            gts.append(self.gt)
        if self._train_step_pix is None:
            self._train_step_pix = self._build_train_step_pix()

        mi, refs, lq, gt = self._stack_wave(mis, refss, lqs, gts)

        if self._train_step_wave is None:
            raw = self._train_step_pix_raw

            # ONE jitted fn for every wave length: the scan length is
            # baked in by the leading batch-stack dim, so jit's own
            # cache keeps full waves AND epoch-tail short waves
            # compiled side by side
            def wave(vars_g, opt_state, vars_ex, vars_map, mi, refs,
                     lq, gt, i0):
                def body(carry, xs):
                    vg, os_ = carry
                    mi_, r_, lq_, gt_, idx = xs
                    vg, os_, losses = raw(vg, os_, vars_ex, vars_map,
                                          mi_, r_, lq_, gt_, idx)
                    return (vg, os_), losses['l_pix']
                (vg, os_), l_pix = jax.lax.scan(
                    body, (vars_g, opt_state),
                    (mi, refs, lq, gt, i0 + jnp.arange(mi.shape[0])))
                return vg, os_, l_pix
            self._train_step_wave = jax.jit(wave, donate_argnums=(0, 1))

        self.vars_g, self.opt_state_g, l_pix = self._train_step_wave(
            self.vars_g, self.opt_state_g, self.vars_extractor,
            self.vars_map, mi, refs, lq, gt,
            jnp.asarray(first_iter - 1))
        self.log_dict = self.reduce_loss_dict({'l_pix': l_pix[-1]})

    def _build_train_step_gan(self):
        cri_pix = self.cri_pix
        cri_gan = self.cri_gan
        cri_grad_penalty = self.cri_grad_penalty
        tx_g, tx_d = self.tx_g, self.tx_d
        net_d = self.net_d
        import inspect
        d_train_kwarg = 'train' in inspect.signature(
            type(net_d).__call__).parameters

        def d_apply(dv, x, train=True):
            """D forward in the reference's train() semantics:
            ImageDiscriminator's BatchNorms normalize by batch stats
            (they ran frozen on init statistics before) and state
            collections thread back to the caller."""
            kwargs = {'train': train} if d_train_kwarg else {}
            mut = [c for c in ('batch_stats', 'spectral') if c in dv] \
                if train else []
            if mut:
                out, updates = net_d.apply(dv, x, mutable=mut, **kwargs)
                return out, dict(dv, **updates)
            return net_d.apply(dv, x, **kwargs), dv

        vgg_vars = self.vgg_variables
        vgg_style_vars = self.vgg_style_variables
        cri_perceptual = self.cri_perceptual
        cri_style = self.cri_style
        # which loss terms exist is static config; both lax.cond
        # branches must emit the same aux pytree
        has_percep = (cri_perceptual is not None
                      and cri_perceptual.perceptual_weight > 0)
        has_style = (cri_style is not None and cri_style.style_weight > 0)

        def step(vars_g, vars_d, opt_g, opt_d, vars_ex, vars_map,
                 match_img_in, refs, lq, gt, rng, g_turn):
            output = self._forward(vars_g['params'], vars_ex, vars_map,
                                   match_img_in, refs, lq)
            output_sg = jax.lax.stop_gradient(output)
            losses = {}

            # ---- discriminator update (reference :219-242)
            def d_loss_fn(params_d):
                dv = dict(vars_d, params=params_d)
                real_pred, dv = d_apply(dv, gt)
                fake_pred, dv = d_apply(dv, output_sg)
                l_d_real = cri_gan(real_pred, True, is_disc=True)
                l_d_fake = cri_gan(fake_pred, False, is_disc=True)
                total = l_d_real + l_d_fake
                aux = {'l_d_real': l_d_real, 'l_d_fake': l_d_fake,
                       'out_d_real': real_pred.mean(),
                       'out_d_fake': fake_pred.mean(),
                       '_new_vars_d': dv}
                if cri_grad_penalty is not None:
                    l_gp = cri_grad_penalty(
                        lambda z: d_apply(dv, z)[0], gt, output_sg, rng)
                    total = total + l_gp
                    aux['l_grad_penalty'] = l_gp
                return total, aux

            (l_d, d_aux), grads_d = jax.value_and_grad(
                d_loss_fn, has_aux=True)(vars_d['params'])
            new_vars_d = d_aux.pop('_new_vars_d')
            updates_d, opt_d = tx_d.update(grads_d, opt_d,
                                           vars_d['params'])
            params_d = optax.apply_updates(vars_d['params'], updates_d)
            vars_d = dict(new_vars_d, params=params_d)
            losses.update(d_aux)

            # ---- generator update (reference :244-279), gated on g_turn
            def g_loss_fn(params_g):
                out = self._forward(params_g, vars_ex, vars_map,
                                    match_img_in, refs, lq)
                total = 0.
                aux = {}
                if cri_pix is not None:
                    l_g_pix = cri_pix(out, gt)
                    total += l_g_pix
                    aux['l_g_pix'] = l_g_pix
                if has_percep:
                    l_p, _ = cri_perceptual(out, gt, vgg_vars)
                    total += l_p
                    aux['l_g_percep'] = l_p
                if has_style:
                    _, l_s = cri_style(out, gt, vgg_style_vars)
                    total += l_s
                    aux['l_g_style'] = l_s
                # train-mode D forward; its state updates are dropped
                # (only the D step's persist), matching the reference's
                # always-train() discriminator
                fake_g_pred = d_apply(vars_d, out)[0]
                l_g_gan = cri_gan(fake_g_pred, True, is_disc=False)
                total += l_g_gan
                aux['l_g_gan'] = l_g_gan
                return total, aux

            def do_g(_):
                (l_g, g_aux), grads_g = jax.value_and_grad(
                    g_loss_fn, has_aux=True)(vars_g['params'])
                updates_g, new_opt_g = tx_g.update(grads_g, opt_g,
                                                   vars_g['params'])
                params_g = optax.apply_updates(vars_g['params'],
                                               updates_g)
                return params_g, new_opt_g, g_aux

            def skip_g(_):
                zero_aux = {'l_g_gan': jnp.zeros(())}
                if cri_pix is not None:
                    zero_aux['l_g_pix'] = jnp.zeros(())
                if has_percep:
                    zero_aux['l_g_percep'] = jnp.zeros(())
                if has_style:
                    zero_aux['l_g_style'] = jnp.zeros(())
                return vars_g['params'], opt_g, zero_aux

            params_g, opt_g, g_aux = jax.lax.cond(g_turn, do_g, skip_g,
                                                  None)
            vars_g = dict(vars_g, params=params_g)
            losses.update(g_aux)
            return vars_g, vars_d, opt_g, opt_d, losses

        # unjitted step for the GAN wave (lax.scan over steps)
        self._train_step_gan_raw = step
        return jax.jit(step, donate_argnums=(0, 1, 2, 3))

    def _release_pretrain_executables(self):
        """Unload the pixel-phase compiled programs before loading the
        GAN step. TPU executables reserve their scratch HBM when
        LOADED, not per run: past the one-time pixel→GAN boundary the
        pixel wave's multi-GB reservation would stay resident for the
        rest of training, and the GAN wave (D step + gradient-penalty
        double-backward) then fails to load at shapes that fit solo —
        measured RESOURCE_EXHAUSTED at the first GAN dispatch of the
        stage3 A/B arms (b=8, gt=160, bf16) for BOTH alignments, while
        the same GAN wave benches fine alone (BENCH_GAN.json). The
        pixel step never runs again, so drop the jitted wrappers and
        their executables (the raw python fns stay for rebuilds), then
        clear every jit cache: the validation forward's scratch
        reservation is resident too (a val ran mid-pretrain), and the
        GAN wave needs all the headroom it can get. Cleared graphs
        reload from the persistent compile cache at next use (seconds,
        not a recompile). One-time cost at the boundary."""
        released = False
        for attr in ('_train_step_pix', '_train_step_wave'):
            fn = getattr(self, attr, None)
            if fn is not None:
                if hasattr(fn, 'clear_cache'):
                    fn.clear_cache()
                setattr(self, attr, None)
                released = True
        if released:
            import gc
            jax.clear_caches()
            gc.collect()

    def _optimize_gan(self, step, match_img_in, refs, lq, gt):
        self._release_pretrain_executables()
        if self._train_step_gan is None:
            self._train_step_gan = self._build_train_step_gan()
        g_turn = ((step - self.net_g_pretrain_steps) % self.net_d_steps
                  == 0) and (step - self.net_g_pretrain_steps
                             ) > self.net_d_init_steps
        rng = self.next_rng()
        (self.vars_g, self.vars_d, self.opt_state_g, self.opt_state_d,
         losses) = self._train_step_gan(
            self.vars_g, self.vars_d, self.opt_state_g, self.opt_state_d,
            self.vars_extractor, self.vars_map,
            match_img_in, refs, lq, gt, rng, g_turn)
        self.log_dict = self.reduce_loss_dict(losses)

    def _optimize_gan_wave(self, batches, first_iter):
        """``len(batches)`` GAN-phase steps fused into one jitted
        ``lax.scan`` dispatch. Trajectory-identical to per-step
        ``_optimize_gan``: the rng keys are drawn host-side from the
        same stream (one ``next_rng()`` per step) and ``g_turn`` is the
        same step-index arithmetic, evaluated on the traced index."""
        self._release_pretrain_executables()
        if self._train_step_gan is None:
            self._train_step_gan = self._build_train_step_gan()

        mis, refss, lqs, gts = [], [], [], []
        for b in batches:
            self.feed_data(b)
            mis.append(self.match_img_in)
            refss.append(self.img_ref_list)
            lqs.append(self.img_in_lq)
            gts.append(self.gt)
        rngs = jnp.stack([self.next_rng() for _ in batches])

        mi, refs, lq, gt = self._stack_wave(mis, refss, lqs, gts)

        if self._train_step_gan_wave is None:
            raw = self._train_step_gan_raw
            pretrain = self.net_g_pretrain_steps
            d_steps = self.net_d_steps
            init_steps = self.net_d_init_steps

            def wave(vars_g, vars_d, opt_g, opt_d, vars_ex, vars_map,
                     mi, refs, lq, gt, rngs, i0):
                def body(carry, xs):
                    vg, vd, og, od = carry
                    mi_, r_, lq_, gt_, rng_, idx = xs
                    g_turn = jnp.logical_and(
                        (idx - pretrain) % d_steps == 0,
                        idx - pretrain > init_steps)
                    vg, vd, og, od, losses = raw(
                        vg, vd, og, od, vars_ex, vars_map,
                        mi_, r_, lq_, gt_, rng_, g_turn)
                    return (vg, vd, og, od), losses
                carry, losses = jax.lax.scan(
                    body, (vars_g, vars_d, opt_g, opt_d),
                    (mi, refs, lq, gt, rngs,
                     i0 + jnp.arange(mi.shape[0])))
                return carry + (losses,)
            self._train_step_gan_wave = jax.jit(
                wave, donate_argnums=(0, 1, 2, 3))

        (self.vars_g, self.vars_d, self.opt_state_g, self.opt_state_d,
         losses) = self._train_step_gan_wave(
            self.vars_g, self.vars_d, self.opt_state_g, self.opt_state_d,
            self.vars_extractor, self.vars_map, mi, refs, lq, gt, rngs,
            jnp.asarray(first_iter))
        # full per-step loss trajectory of the wave (k scalars per key);
        # kept for trajectory-parity tests and rich logging
        self.wave_loss_trajectory = jax.tree_util.tree_map(
            np.asarray, losses)
        self.log_dict = self.reduce_loss_dict(
            jax.tree_util.tree_map(lambda x: x[-1], losses))

    def test(self):
        if self._eval_step is None:
            self._eval_step = self._build_eval_step()
        mp = (self.opt.get('val') or {}).get('mixed_precision')
        dt = jnp.bfloat16 if mp == 'bfloat16' else None
        vars_g = self._prepare_eval_variables(self.vars_g, dt, 'g')
        vars_ex = self._prepare_eval_variables(self.vars_extractor, dt,
                                               'extractor')
        vars_map = self._prepare_eval_variables(self.vars_map, dt, 'map')
        self.output = self._eval_step(vars_g, vars_ex, vars_map,
                                      jnp.asarray(self.match_img_in),
                                      jnp.asarray(self.img_ref_list),
                                      jnp.asarray(self.img_in_lq))

    def get_current_visuals(self):
        out_dict = OrderedDict()
        out_dict['img_in_lq'] = np.asarray(self.img_in_lq)
        out_dict['rlt'] = np.asarray(self.output)
        if self.gt is not None:
            out_dict['gt'] = np.asarray(self.gt)
        return out_dict

    def save(self, epoch, current_iter):
        self.save_network(self.vars_g, 'net_g', current_iter)
        if self.net_d is not None and self.vars_d is not None:
            self.save_network(self.vars_d, 'net_d', current_iter)
        trees = {'opt_state_g': self.opt_state_g}
        if self.opt_state_d is not None:
            trees['opt_state_d'] = self.opt_state_d
        self.save_training_state(epoch, current_iter, trees)

    def resume_training(self, resume_state):
        self._resume_trees = resume_state.get('trees', {})

    def _restore_trees(self):
        from flax import serialization
        if 'opt_state_g' in self._resume_trees:
            self.opt_state_g = serialization.from_bytes(
                self.opt_state_g, self._resume_trees['opt_state_g'])
        if 'opt_state_d' in self._resume_trees and \
                self.opt_state_d is not None:
            self.opt_state_d = serialization.from_bytes(
                self.opt_state_d, self._resume_trees['opt_state_d'])
        self._resume_trees = None

    # ---------------------------------------------------------- validation
    def dist_validation(self, dataloader, current_iter, tb_logger,
                        save_img):
        """Image-sharded multi-process validation.

        The reference evaluates CUFED5 on rank 0 only
        (reference multi_ref_restoration_model.py:310-316) — every other
        GPU idles through validation. Here each process evaluates images
        ``rank::world_size`` of the set and the metric sums reduce via
        ``process_allgather`` (the same collective the video validation
        uses), so eval wall time scales with the host count and every
        process ends with the full-set averages in ``metric_results``.
        Forwards stay process-local (``_prepare_eval_variables``), so
        unequal shard sizes cannot deadlock a global SPMD program.

        The reduced sums ride f32 device arrays through the collective
        (x64 stays off), so dist-reported averages can differ from a
        single-process run by ~1e-7 relative — below the 5 significant
        digits the validation log prints.

        ``save_img`` writes are sharded the same way: each process
        writes ITS images to its local visualization dir (the write
        cost scales with the hosts too). On a multi-host pod no single
        filesystem ends up with the full set — collect the per-host
        dirs after the run if one location is needed (the reference
        wrote everything from rank 0 while the other GPUs idled).
        """
        sums = self._validate_images(
            dataloader, current_iter, save_img,
            rank=self.opt['rank'], world=self.opt['world_size'])
        from jax.experimental import multihost_utils
        sums = np.asarray(
            multihost_utils.process_allgather(sums)).sum(axis=0)
        self._finalize_validation(sums, dataloader.dataset.opt['name'],
                                  current_iter, tb_logger,
                                  log=self.opt['rank'] == 0)

    def nondist_validation(self, dataloader, current_iter, tb_logger,
                           save_img):
        """CUFED5-style validation: un-pad, PSNR (RGB), PSNR_Y, SSIM_Y at
        crop_border (reference :316-387)."""
        sums = self._validate_images(dataloader, current_iter, save_img)
        self._finalize_validation(sums, dataloader.dataset.opt['name'],
                                  current_iter, tb_logger)

    def _validate_images(self, dataloader, current_iter, save_img,
                         rank=0, world=1):
        """Evaluate images ``rank::world`` of the loader; return metric
        sums ``[psnr, psnr_y, ssim_y, count]`` (float64).

        Sharded runs index the DATASET directly (the video validation's
        idiom, video_base_model.py): iterating the full loader and
        skipping foreign indices would still decode every image on
        every process, replicating the host-side work world times and
        defeating the wall-time scaling on decode-bound sets.
        """
        sum_psnr = sum_psnr_y = sum_ssim_y = 0.
        n = 0
        dataset_name = dataloader.dataset.opt['name']
        if world > 1:
            from mrefsr_tpu.data.loader import default_collate
            dataset = dataloader.dataset
            # direct dataset indexing assumes the loader applies no
            # sharding/batching of its own (build_dataloader always
            # makes val loaders batch-1 with no sampler); a future val
            # sampler would double-shard silently without this guard
            assert getattr(dataloader, 'sampler', None) is None and \
                getattr(dataloader, 'batch_size', 1) in (None, 1), (
                'dist validation shards by indexing the dataset '
                'directly; it cannot honor a val sampler or batch_size')
            collate = getattr(dataloader, 'collate_fn', None) \
                or default_collate
            batches = (collate([dataset[i]])
                       for i in range(rank, len(dataset), world))
        else:
            batches = dataloader
        for val_data in batches:
            lq_path = val_data['lq_path'][0] if isinstance(
                val_data['lq_path'], list) else val_data['lq_path']
            img_name = osp.splitext(osp.basename(lq_path))[0]

            self.feed_data(val_data)
            self.test()

            visuals = self.get_current_visuals()
            sr_img = tensor2img(visuals['rlt'])
            gt_img = tensor2img(visuals['gt'])

            if 'padding' in val_data:
                original_size = val_data['original_size']
                if isinstance(original_size, np.ndarray):
                    original_size = original_size[0]
                elif isinstance(original_size, list):
                    original_size = original_size[0]
                sr_img = sr_img[:int(original_size[0]),
                                :int(original_size[1])]

            if save_img:
                if self.opt['is_train']:
                    save_img_path = osp.join(
                        self.opt['path']['visualization'], img_name,
                        f'{img_name}_{current_iter}.png')
                else:
                    save_img_path = osp.join(
                        self.opt['path']['visualization'], dataset_name,
                        f"{img_name}_{self.opt['name']}.png")
                    if self.opt.get('suffix'):
                        save_img_path = save_img_path.replace(
                            '.png', f'_{self.opt["suffix"]}.png')
                imwrite(sr_img, save_img_path)

            crop_border = self.opt['crop_border']
            sum_psnr += calculate_psnr(sr_img, gt_img,
                                       crop_border=crop_border,
                                       test_y_channel=False)
            sum_psnr_y += calculate_psnr(sr_img, gt_img,
                                         crop_border=crop_border,
                                         test_y_channel=True)
            sum_ssim_y += calculate_ssim(sr_img, gt_img,
                                         crop_border=crop_border,
                                         test_y_channel=True)
            n += 1
        return np.asarray([sum_psnr, sum_psnr_y, sum_ssim_y, n],
                          np.float64)

    def _finalize_validation(self, sums, dataset_name, current_iter,
                             tb_logger, log=True):
        if sums[3] <= 0:
            return
        avg_psnr, avg_psnr_y, avg_ssim_y = (sums[:3] / sums[3]).tolist()
        self.metric_results = {'psnr': avg_psnr, 'psnr_y': avg_psnr_y,
                               'ssim_y': avg_ssim_y}
        if not log:
            return
        get_root_logger().info(
            f'# Validation {dataset_name} # PSNR: {avg_psnr:.4e} '
            f'# PSNR_Y: {avg_psnr_y:.4e} '
            f'# SSIM_Y: {avg_ssim_y:.4e}.')
        if tb_logger:
            tb_logger.add_scalar('psnr', avg_psnr, current_iter)
            tb_logger.add_scalar('psnr_y', avg_psnr_y, current_iter)
            tb_logger.add_scalar('ssim_y', avg_ssim_y, current_iter)
