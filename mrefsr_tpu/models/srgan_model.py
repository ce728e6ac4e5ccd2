"""SRGAN training strategy, functional TPU form.

Rebuild of reference basicsr/models/srgan_model.py:12-149: alternating
generator/discriminator Adam updates with pixel + perceptual + GAN
losses. Both updates live in ONE jitted step; the generator update is
gated with lax.cond on the net_d_iters schedule. Discriminator BatchNorm
state (batch_stats) threads through the step.
"""
from collections import OrderedDict

import jax
import jax.numpy as jnp
import numpy as np
import optax

from mrefsr_tpu.archs import build_network
from mrefsr_tpu.losses import build_loss
from mrefsr_tpu.parallel import batch_sharding, put_sharded, replicate
from mrefsr_tpu.utils import get_root_logger
from mrefsr_tpu.utils.registry import MODEL_REGISTRY

from .sr_model import SRModel


@MODEL_REGISTRY.register()
class SRGANModel(SRModel):
    """SRGAN model for single image super-resolution."""

    _relativistic = False

    def init_training_settings(self):
        train_opt = self.opt['train']
        logger = get_root_logger()

        self.ema_decay = train_opt.get('ema_decay', 0)
        if self.ema_decay > 0:
            logger.info('Use Exponential Moving Average with decay: '
                        f'{self.ema_decay}')

        self.net_d = build_network(self.opt['network_d'])
        self.vars_d = None
        self.opt_state_d = None

        self.cri_pix = build_loss(train_opt['pixel_opt']) \
            if train_opt.get('pixel_opt') else None
        self.cri_perceptual = build_loss(train_opt['perceptual_opt']) \
            if train_opt.get('perceptual_opt') else None
        self.cri_gan = build_loss(train_opt['gan_opt'])
        self.cri_ldl = build_loss(train_opt['ldl_opt']) \
            if train_opt.get('ldl_opt') else None
        self.vgg_variables = None
        if self.cri_perceptual is not None:
            self.vgg_variables = self._load_vgg_variables(
                self.cri_perceptual.vgg)

        self.net_d_iters = train_opt.get('net_d_iters', 1)
        self.net_d_init_iters = train_opt.get('net_d_init_iters', 0)

        self.setup_schedulers()
        self.setup_optimizers()

    def setup_optimizers(self):
        train_opt = self.opt['train']
        og = dict(train_opt['optim_g'])
        self.base_lrs = [og['lr']]
        self.tx = self.build_optimizer(og.pop('type'), og.pop('lr'),
                                       self.schedule_fn, **og)
        od = dict(train_opt['optim_d'])
        self.tx_d = self.build_optimizer(od.pop('type'), od.pop('lr'),
                                         self.schedule_fn, **od)

    def _ensure_initialized(self, example_lq):
        first = self.variables is None
        super()._ensure_initialized(example_lq)
        if first and self.is_train and self.vars_d is None:
            rng = jax.random.PRNGKey(
                (self.opt.get('manual_seed') or 0) + 1)
            # video batches are (b, t, h, w, c)
            h = example_lq.shape[-3] * self.opt['scale']
            w = example_lq.shape[-2] * self.opt['scale']
            gt_example = jnp.zeros((1, h, w, 3), jnp.float32)
            self.vars_d = self.net_d.init(rng, gt_example)
            load_path = self.opt['path'].get('pretrain_network_d')
            if load_path:
                strict_d = self.opt['path'].get('strict_load_d', True)
                loaded = self.load_network(
                    load_path, strict=strict_d,
                    param_key=self.opt['path'].get('param_key_d',
                                                   'params'))
                self.vars_d = self._merge_loaded(self.vars_d, loaded,
                                                 strict=strict_d)
            self.vars_d = replicate(self.vars_d, self.mesh)
            self.opt_state_d = self.tx_d.init(self.vars_d['params'])
            # the super() call above ran _restore_trees before the D
            # optimizer existed; its opt_state_d entry stayed pending
            if self._resume_trees is not None:
                self._restore_trees()

    def _apply_d(self, vars_d, x, train=True):
        """Discriminator apply in the reference's train() semantics:
        train=True runs BatchNorm on batch statistics and spectral
        norm's power iteration, returning the updated state collections
        (callers that don't persist them just drop the second return);
        train=False is pure eval on stored state."""
        if not hasattr(self, '_d_train_kwarg'):
            import inspect
            self._d_train_kwarg = 'train' in inspect.signature(
                type(self.net_d).__call__).parameters
        kwargs = {'train': train} if self._d_train_kwarg else {}
        mut = [c for c in ('batch_stats', 'spectral') if c in vars_d] \
            if train else []
        if mut:
            out, updates = self.net_d.apply(vars_d, x, mutable=mut,
                                            **kwargs)
            return out, dict(vars_d, **updates)
        return self.net_d.apply(vars_d, x, **kwargs), vars_d

    def _build_train_step(self):
        cri_pix = self.cri_pix
        cri_perceptual = self.cri_perceptual
        cri_gan = self.cri_gan
        net_g_apply = self.net_g.apply
        tx, tx_d = self.tx, self.tx_d
        ema_decay = self.ema_decay
        relativistic = self._relativistic
        apply_d = self._apply_d

        cri_ldl = self.cri_ldl
        freeze_grads = self._freeze_grads
        # video outputs are (b,t,h,w,c): flatten frames for D / VGG
        # (reference video_recurrent_gan_model.py:132-166)
        flat = (lambda x: x.reshape((-1,) + x.shape[-3:])
                if x.ndim == 5 else x)
        # per-loss GT routing for RealESRGAN's USM'd targets (reference
        # realesrgan_model.py:196-204); plain SRGAN passes gt three times
        # which aux keys the perceptual criterion emits is static config
        # (losses.py returns None for a zero-weight term) — skip_g must
        # mirror it exactly or lax.cond rejects the branch pytrees
        has_percep = (cri_perceptual is not None
                      and cri_perceptual.perceptual_weight > 0)
        has_style = (cri_perceptual is not None
                     and cri_perceptual.style_weight > 0)

        def step(vars_g, opt_g, ema, vars_d, opt_d, vgg_variables, lq,
                 gt_pix, gt_percep, gt_gan, gt_ldl, g_turn, step_idx):
            losses = OrderedDict()

            # ---- generator (reference srgan_model.py:95-127 /
            # esrgan relativistic :13-48), gated on g_turn
            def g_loss_fn(params_g):
                out = net_g_apply({'params': params_g}, lq)
                total = 0.
                aux = {}
                if cri_pix is not None:
                    l_g_pix = cri_pix(out, gt_pix)
                    total += l_g_pix
                    aux['l_g_pix'] = l_g_pix
                if cri_ldl is not None:
                    from mrefsr_tpu.losses.loss_util import \
                        get_refined_artifact_map
                    out_ema = net_g_apply({'params': ema['params']}, lq)
                    pixel_weight = get_refined_artifact_map(
                        gt_ldl, out, jax.lax.stop_gradient(out_ema), 7)
                    l_g_ldl = cri_ldl(pixel_weight * out,
                                      pixel_weight * gt_ldl)
                    total += l_g_ldl
                    aux['l_g_ldl'] = l_g_ldl
                if cri_perceptual is not None:
                    l_p, l_s = cri_perceptual(flat(out), flat(gt_percep),
                                              vgg_variables)
                    if l_p is not None:
                        total += l_p
                        aux['l_g_percep'] = l_p
                    if l_s is not None:
                        total += l_s
                        aux['l_g_style'] = l_s
                # the reference keeps D in train() during the G step too
                # (BN normalizes by batch stats); the state updates from
                # these forwards are dropped — only the D step's persist
                fake_g_pred, _ = apply_d(vars_d, flat(out), train=True)
                if relativistic:
                    real_d_pred, _ = apply_d(vars_d, flat(gt_gan),
                                             train=True)
                    real_d_pred = jax.lax.stop_gradient(real_d_pred)
                    l_g_real = cri_gan(
                        real_d_pred - fake_g_pred.mean(), False,
                        is_disc=False)
                    l_g_fake = cri_gan(
                        fake_g_pred - real_d_pred.mean(), True,
                        is_disc=False)
                    l_g_gan = (l_g_real + l_g_fake) / 2
                else:
                    l_g_gan = cri_gan(fake_g_pred, True, is_disc=False)
                total += l_g_gan
                aux['l_g_gan'] = l_g_gan
                # carry the pre-update output for the D step (reference
                # trains D on self.output.detach(), computed BEFORE
                # optimizer_g.step(); srgan_model.py:95,129-146)
                aux['_out'] = out
                return total, aux

            def do_g(_):
                (_, aux), grads = jax.value_and_grad(
                    g_loss_fn, has_aux=True)(vars_g['params'])
                grads = freeze_grads(grads, step_idx)
                updates, new_opt = tx.update(grads, opt_g,
                                             vars_g['params'])
                return optax.apply_updates(vars_g['params'],
                                           updates), new_opt, aux

            def skip_g(_):
                aux = {'l_g_gan': jnp.zeros(())}
                if cri_pix is not None:
                    aux['l_g_pix'] = jnp.zeros(())
                if cri_ldl is not None:
                    aux['l_g_ldl'] = jnp.zeros(())
                if has_percep:
                    aux['l_g_percep'] = jnp.zeros(())
                if has_style:
                    aux['l_g_style'] = jnp.zeros(())
                aux['_out'] = net_g_apply({'params': vars_g['params']},
                                          lq)
                return vars_g['params'], opt_g, aux

            params_g, opt_g, g_aux = jax.lax.cond(g_turn, do_g, skip_g,
                                                  None)
            vars_g = dict(vars_g, params=params_g)
            output_sg = jax.lax.stop_gradient(g_aux.pop('_out'))
            losses.update(g_aux)

            # ---- discriminator (reference srgan_model.py:129-146)
            def d_loss_fn(params_d):
                dv = dict(vars_d, params=params_d)
                real_pred, dv = apply_d(dv, flat(gt_gan))
                fake_pred, dv = apply_d(dv, flat(output_sg))
                if relativistic:
                    l_d_real = cri_gan(
                        real_pred - jax.lax.stop_gradient(
                            fake_pred).mean(), True, is_disc=True) * 0.5
                    l_d_fake = cri_gan(
                        fake_pred - jax.lax.stop_gradient(
                            real_pred).mean(), False, is_disc=True) * 0.5
                else:
                    l_d_real = cri_gan(real_pred, True, is_disc=True)
                    l_d_fake = cri_gan(fake_pred, False, is_disc=True)
                aux = {'l_d_real': l_d_real, 'l_d_fake': l_d_fake,
                       'out_d_real': real_pred.mean(),
                       'out_d_fake': fake_pred.mean(),
                       '_new_vars_d': dv}
                return l_d_real + l_d_fake, aux

            (_, d_aux), grads_d = jax.value_and_grad(
                d_loss_fn, has_aux=True)(vars_d['params'])
            new_vars_d = d_aux.pop('_new_vars_d')
            updates_d, opt_d = tx_d.update(grads_d, opt_d,
                                           vars_d['params'])
            params_d = optax.apply_updates(vars_d['params'], updates_d)
            new_vars_d = dict(new_vars_d, params=params_d)
            losses.update(d_aux)

            if ema_decay > 0:
                ema = jax.tree_util.tree_map(
                    lambda e, p: e * ema_decay + p * (1 - ema_decay),
                    ema, vars_g)
            return vars_g, opt_g, ema, new_vars_d, opt_d, losses

        # unjitted step for multi-step (wave) dispatch — lax.scan over
        # steps with g_turn computed from the traced step index
        self._train_step_raw = step
        return jax.jit(step, donate_argnums=(0, 1, 2, 3, 4))

    def _train_step_inputs(self):
        """Per-step (lq, gt_pix, gt_percep, gt_gan, gt_ldl) after
        feed_data — the per-loss GT routing hook. RealESRGAN overrides
        this to route its USM'd targets (reference
        realesrgan_model.py:196-204); plain SRGAN feeds gt to every
        loss."""
        return self.lq, self.gt, self.gt, self.gt, self.gt

    def optimize_parameters(self, current_iter):
        if self._train_step is None:
            self._train_step = self._build_train_step()
        sharding = batch_sharding(self.mesh)
        # the GT slots usually alias one array (plain SRGAN: all four) —
        # dedupe by identity so the batch crosses H2D once, not 4x
        cache = {}

        def put(x):
            key = id(x)
            if key not in cache:
                cache[key] = put_sharded(x, sharding)
            return cache[key]

        lq, gt_pix, gt_percep, gt_gan, gt_ldl = (
            put(x) for x in self._train_step_inputs())
        g_turn = (current_iter % self.net_d_iters == 0
                  and current_iter > self.net_d_init_iters)
        ema = self.ema_variables if self.ema_decay > 0 else None
        (self.variables, self.opt_state, self.ema_variables, self.vars_d,
         self.opt_state_d, losses) = self._train_step(
            self.variables, self.opt_state, ema, self.vars_d,
            self.opt_state_d, self.vgg_variables, lq, gt_pix, gt_percep,
            gt_gan, gt_ldl, g_turn, current_iter - 1)
        self.log_dict = self.reduce_loss_dict(losses)

    def optimize_parameters_wave(self, batches, first_iter):
        """``len(batches)`` GAN steps fused into ONE jitted ``lax.scan``
        dispatch (``train: steps_per_dispatch``). The D/G alternation is
        pure arithmetic on the step index, so ``g_turn`` is evaluated on
        the traced index inside the scan body — trajectory semantics are
        identical to per-step dispatch. Subclasses that override
        ``optimize_parameters`` itself (not just ``_train_step_inputs``)
        fall back to per-step dispatch."""
        k = len(batches)
        overridden = type(self).optimize_parameters \
            is not SRGANModel.optimize_parameters
        if k == 1 or overridden:
            for j, b in enumerate(batches):
                self.feed_data(b)
                self.optimize_parameters(first_iter + j)
            return

        cols = None
        for b in batches:
            self.feed_data(b)  # lazy init + per-model synthesis/routing
            row = self._train_step_inputs()
            cols = cols or [[] for _ in row]
            for c, v in zip(cols, row):
                c.append(v)
        if self._train_step is None:
            self._train_step = self._build_train_step()

        from jax.sharding import NamedSharding, PartitionSpec as P
        sh = NamedSharding(self.mesh, P(None, 'data'))
        # RealESRGAN synthesizes lq/gt ON DEVICE — stack device arrays
        # with jnp so batches don't round-trip through the host. GT
        # columns usually alias one array per step (plain SRGAN: all
        # four) — dedupe identical columns so the wave stacks and
        # transfers each distinct batch once, not 4x
        cache = {}

        def stack_put(c):
            key = tuple(id(v) for v in c)
            if key not in cache:
                cache[key] = put_sharded(
                    (jnp.stack if isinstance(c[0], jax.Array)
                     else np.stack)(c), sh)
            return cache[key]

        stacked = [stack_put(c) for c in cols]

        if getattr(self, '_train_step_gan_wave', None) is None:
            raw = self._train_step_raw
            d_iters = self.net_d_iters
            d_init = self.net_d_init_iters

            def wave(vars_g, opt_g, ema, vars_d, opt_d, vgg_vars,
                     lq, gt_pix, gt_percep, gt_gan, gt_ldl, i0):
                def body(carry, xs):
                    vg, og, e, vd, od = carry
                    lq_, gp_, gpe_, gg_, gl_, idx = xs
                    cur = idx + 1  # step_idx = current_iter - 1
                    g_turn = jnp.logical_and(cur % d_iters == 0,
                                             cur > d_init)
                    vg, og, e, vd, od, losses = raw(
                        vg, og, e, vd, od, vgg_vars,
                        lq_, gp_, gpe_, gg_, gl_, g_turn, idx)
                    return (vg, og, e, vd, od), losses
                carry, losses = jax.lax.scan(
                    body, (vars_g, opt_g, ema, vars_d, opt_d),
                    (lq, gt_pix, gt_percep, gt_gan, gt_ldl,
                     i0 + jnp.arange(lq.shape[0])))
                return carry + (losses,)
            self._train_step_gan_wave = jax.jit(
                wave, donate_argnums=(0, 1, 2, 3, 4))

        ema = self.ema_variables if self.ema_decay > 0 else None
        (self.variables, self.opt_state, self.ema_variables, self.vars_d,
         self.opt_state_d, losses) = self._train_step_gan_wave(
            self.variables, self.opt_state, ema, self.vars_d,
            self.opt_state_d, self.vgg_variables, *stacked,
            jnp.asarray(first_iter - 1))
        self.wave_loss_trajectory = jax.tree_util.tree_map(
            np.asarray, losses)
        self.log_dict = self.reduce_loss_dict(
            {name: v[-1] for name, v in losses.items()})

    def save(self, epoch, current_iter):
        if self.ema_decay > 0 and self.ema_variables is not None:
            self.save_network([self.variables, self.ema_variables],
                              'net_g', current_iter,
                              param_key=['params', 'params_ema'])
        else:
            self.save_network(self.variables, 'net_g', current_iter)
        self.save_network(self.vars_d, 'net_d', current_iter)
        trees = {'opt_state_g': self.opt_state,
                 'opt_state_d': self.opt_state_d}
        self.save_training_state(epoch, current_iter, trees)
