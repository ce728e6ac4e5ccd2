"""HiFaceGAN face renovation training
(reference basicsr/models/hifacegan_model.py:15-288).

Conditional multiscale-discriminator GAN with feature matching. Fake
and real are discriminated in ONE batch (reference ``discriminate``
:75-97). Spectral-norm power-iteration state ('spectral' collection)
threads through the jitted step exactly like torch's pre-forward hook.
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
class HiFaceGANModel(SRModel):
    """HiFaceGAN model for generic-purpose face restoration."""

    def init_training_settings(self):
        train_opt = self.opt['train']
        self.ema_decay = train_opt.get('ema_decay', 0)
        if self.ema_decay > 0:
            raise NotImplementedError(
                'HiFaceGAN does not support EMA now. Pass')

        self.net_d = build_network(self.opt['network_d'])
        self.vars_d = None
        self.opt_state_d = None

        self.cri_pix = build_loss(train_opt['pixel_opt']) \
            if train_opt.get('pixel_opt') else None
        self.cri_perceptual = build_loss(train_opt['perceptual_opt']) \
            if train_opt.get('perceptual_opt') else None
        self.cri_feat = build_loss(train_opt['feature_matching_opt']) \
            if train_opt.get('feature_matching_opt') else None
        if self.cri_pix is None and self.cri_perceptual is None:
            raise ValueError('Both pixel and perceptual losses are None.')
        self.cri_gan = build_loss(train_opt['gan_opt']) \
            if train_opt.get('gan_opt') else None
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
            rng = jax.random.PRNGKey((self.opt.get('manual_seed') or 0)
                                     + 1)
            h, w = example_lq.shape[1:3]
            cond = jnp.zeros((2, h, w, 6), jnp.float32)
            self.vars_d = self.net_d.init(rng, cond)
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

    @staticmethod
    def _divide_pred(pred):
        """Split the combined fake|real batch predictions
        (reference hifacegan_model.py:99-115)."""
        fake, real = [], []
        for p in pred:
            fake.append([t[:t.shape[0] // 2] for t in p])
            real.append([t[t.shape[0] // 2:] for t in p])
        return fake, real

    def _build_train_step(self):
        cri_pix = self.cri_pix
        cri_perceptual = self.cri_perceptual
        cri_feat = self.cri_feat
        cri_gan = self.cri_gan
        net_g, net_d = self.net_g, self.net_d
        tx, tx_d = self.tx, self.tx_d
        divide_pred = self._divide_pred

        def apply_g(vars_g, lq):
            if 'spectral' in vars_g:
                out, updates = net_g.apply(vars_g, lq,
                                           mutable=['spectral'])
                return out, dict(vars_g, **updates)
            return net_g.apply(vars_g, lq), vars_g

        def discriminate(vars_d, lq, output, gt, mutable):
            fake_concat = jnp.concatenate([lq, output], axis=-1)
            real_concat = jnp.concatenate([lq, gt], axis=-1)
            fake_and_real = jnp.concatenate([fake_concat, real_concat],
                                            axis=0)
            if mutable and 'spectral' in vars_d:
                pred, updates = net_d.apply(vars_d, fake_and_real,
                                            mutable=['spectral'])
                vars_d = dict(vars_d, **updates)
            else:
                pred = net_d.apply(vars_d, fake_and_real)
            fake, real = divide_pred(pred)
            return fake, real, vars_d

        def step(vars_g, opt_g, vars_d, opt_d, vgg_variables, lq, gt,
                 g_turn, step_idx):
            losses = OrderedDict()

            def g_loss_fn(params_g):
                vg = dict(vars_g, params=params_g)
                out, vg = apply_g(vg, lq)
                total = 0.
                aux = {'_vars_g': vg}
                if cri_pix is not None:
                    l_g_pix = cri_pix(out, gt)
                    total += l_g_pix
                    aux['l_g_pix'] = l_g_pix
                if cri_perceptual is not None:
                    l_p, l_s = cri_perceptual(out, gt, vgg_variables)
                    if l_p is not None:
                        total += l_p
                        aux['l_g_percep'] = l_p
                    if l_s is not None:
                        total += l_s
                        aux['l_g_style'] = l_s
                pred_fake, pred_real, _ = discriminate(
                    vars_d, lq, out, gt, mutable=False)
                l_g_gan = cri_gan(pred_fake, True, is_disc=False)
                total += l_g_gan
                aux['l_g_gan'] = l_g_gan
                if cri_feat is not None:
                    l_g_feat = cri_feat(pred_fake, pred_real)
                    total += l_g_feat
                    aux['l_g_feat'] = l_g_feat
                aux['_out'] = out
                return total, aux

            def do_g(_):
                (_, aux), grads = jax.value_and_grad(
                    g_loss_fn, has_aux=True)(vars_g['params'])
                updates, new_opt = tx.update(grads, opt_g,
                                             vars_g['params'])
                new_params = optax.apply_updates(vars_g['params'],
                                                 updates)
                return new_params, new_opt, aux

            def skip_g(_):
                aux = {'l_g_gan': jnp.zeros(())}
                if cri_pix is not None:
                    aux['l_g_pix'] = jnp.zeros(())
                # mirror g_loss_fn's static key set: the criterion
                # returns None (no aux key) for zero-weight terms, and
                # lax.cond requires identical branch pytrees
                if cri_perceptual is not None \
                        and cri_perceptual.perceptual_weight > 0:
                    aux['l_g_percep'] = jnp.zeros(())
                if cri_perceptual is not None \
                        and cri_perceptual.style_weight > 0:
                    aux['l_g_style'] = jnp.zeros(())
                if cri_feat is not None:
                    aux['l_g_feat'] = jnp.zeros(())
                out, vg = apply_g(vars_g, lq)
                aux['_out'] = out
                aux['_vars_g'] = vg
                return vars_g['params'], opt_g, aux

            params_g, opt_g, g_aux = jax.lax.cond(g_turn, do_g, skip_g,
                                                  None)
            output = jax.lax.stop_gradient(g_aux.pop('_out'))
            new_vars_g = g_aux.pop('_vars_g')
            new_vars_g = dict(new_vars_g, params=params_g)
            losses.update(g_aux)

            # ---- D update (reference :160-186): same fake as SRGAN
            def d_loss_fn(params_d):
                dv = dict(vars_d, params=params_d)
                pred_fake, pred_real, dv = discriminate(
                    dv, lq, output, gt, mutable=True)
                l_d_real = cri_gan(pred_real, True, is_disc=True)
                l_d_fake = cri_gan(pred_fake, False, is_disc=True)
                aux = {'l_d_real': l_d_real, 'l_d_fake': l_d_fake,
                       '_vars_d': dv}
                return (l_d_real + l_d_fake) / 2, aux

            (_, d_aux), grads_d = jax.value_and_grad(
                d_loss_fn, has_aux=True)(vars_d['params'])
            new_vars_d = d_aux.pop('_vars_d')
            updates_d, opt_d = tx_d.update(grads_d, opt_d,
                                           vars_d['params'])
            params_d = optax.apply_updates(vars_d['params'], updates_d)
            new_vars_d = dict(new_vars_d, params=params_d)
            losses.update(d_aux)
            return new_vars_g, opt_g, new_vars_d, opt_d, losses

        # unjitted step for multi-step (wave) dispatch
        self._train_step_raw = step
        return jax.jit(step, donate_argnums=(0, 1, 2, 3))

    def optimize_parameters(self, current_iter):
        if self._train_step is None:
            self._train_step = self._build_train_step()
        sharding = batch_sharding(self.mesh)
        lq = put_sharded(self.lq, sharding)
        gt = put_sharded(self.gt, sharding)
        g_turn = (current_iter % self.net_d_iters == 0
                  and current_iter > self.net_d_init_iters)
        (self.variables, self.opt_state, self.vars_d, self.opt_state_d,
         losses) = self._train_step(
            self.variables, self.opt_state, self.vars_d,
            self.opt_state_d, self.vgg_variables, lq, gt, g_turn,
            current_iter - 1)
        self.log_dict = self.reduce_loss_dict(losses)

    def optimize_parameters_wave(self, batches, first_iter):
        """``len(batches)`` HiFaceGAN steps fused into one jitted
        ``lax.scan`` dispatch (``train: steps_per_dispatch``): g_turn is
        the same step-index arithmetic, evaluated on the traced index
        inside the scan body. Same oracle and semantics as the SRGAN
        wave (srgan_model.py)."""
        k = len(batches)
        overridden = type(self).optimize_parameters \
            is not HiFaceGANModel.optimize_parameters
        if k == 1 or overridden:
            for j, b in enumerate(batches):
                self.feed_data(b)
                self.optimize_parameters(first_iter + j)
            return

        lqs, gts = [], []
        for b in batches:
            self.feed_data(b)
            lqs.append(self.lq)
            gts.append(self.gt)
        if self._train_step is None:
            self._train_step = self._build_train_step()

        from jax.sharding import NamedSharding, PartitionSpec as P
        sh = NamedSharding(self.mesh, P(None, 'data'))
        lq = put_sharded(np.stack(lqs), sh)
        gt = put_sharded(np.stack(gts), sh)

        if getattr(self, '_train_step_gan_wave', None) is None:
            raw = self._train_step_raw
            d_iters = self.net_d_iters
            d_init = self.net_d_init_iters

            def wave(vars_g, opt_g, vars_d, opt_d, vgg_vars, lq, gt,
                     i0):
                def body(carry, xs):
                    vg, og, vd, od = carry
                    lq_, gt_, idx = xs
                    cur = idx + 1  # step_idx = current_iter - 1
                    g_turn = jnp.logical_and(cur % d_iters == 0,
                                             cur > d_init)
                    vg, og, vd, od, losses = raw(
                        vg, og, vd, od, vgg_vars, lq_, gt_, g_turn, idx)
                    return (vg, og, vd, od), losses
                carry, losses = jax.lax.scan(
                    body, (vars_g, opt_g, vars_d, opt_d),
                    (lq, gt, i0 + jnp.arange(lq.shape[0])))
                return carry + (losses,)
            self._train_step_gan_wave = jax.jit(
                wave, donate_argnums=(0, 1, 2, 3))

        (self.variables, self.opt_state, self.vars_d, self.opt_state_d,
         losses) = self._train_step_gan_wave(
            self.variables, self.opt_state, self.vars_d,
            self.opt_state_d, self.vgg_variables, lq, gt,
            jnp.asarray(first_iter - 1))
        self.wave_loss_trajectory = jax.tree_util.tree_map(
            np.asarray, losses)
        self.log_dict = self.reduce_loss_dict(
            {name: v[-1] for name, v in losses.items()})

    def save(self, epoch, current_iter):
        self.save_network(self.variables, 'net_g', current_iter)
        self.save_network(self.vars_d, 'net_d', current_iter)
        trees = {'opt_state_g': self.opt_state,
                 'opt_state_d': self.opt_state_d}
        self.save_training_state(epoch, current_iter, trees)
