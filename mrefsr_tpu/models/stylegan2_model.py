"""StyleGAN2 training strategy (reference
basicsr/models/stylegan2_model.py:18-283).

Non-saturating logistic GAN with lazy regularization: R1 on the
discriminator every ``net_d_reg_every`` steps and path-length on the
generator every ``net_g_reg_every`` steps. The whole alternating update
is one jitted step; the two lazy-regularizer branches are static flags
(four small graph variants, each compiled once). The reference's
autograd penalties become explicit ``jax.grad`` calls
(losses.r1_penalty / g_path_regularize).
"""
from collections import OrderedDict
from os import path as osp

import jax
import jax.numpy as jnp
import numpy as np
import optax

from mrefsr_tpu.archs import build_network
from mrefsr_tpu.losses import build_loss
from mrefsr_tpu.losses.losses import g_path_regularize, r1_penalty
from mrefsr_tpu.parallel import replicate
from mrefsr_tpu.utils import get_root_logger, imwrite, tensor2img
from mrefsr_tpu.utils.registry import MODEL_REGISTRY

from .base_model import BaseModel


@MODEL_REGISTRY.register()
class StyleGAN2Model(BaseModel):
    """StyleGAN2 model."""

    def __init__(self, opt):
        super().__init__(opt)
        self.net_g = build_network(opt['network_g'])
        self.num_style_feat = opt['network_g']['num_style_feat']
        num_val_samples = self.opt['val'].get('num_val_samples', 16) \
            if self.opt.get('val') else 16
        self.fixed_sample = np.asarray(jax.random.normal(
            jax.random.PRNGKey(2020),
            (num_val_samples, self.num_style_feat)))

        self.variables = None
        self.ema_variables = None
        self.vars_d = None
        self.opt_state = None
        self.opt_state_d = None
        self.mean_path_length = jnp.zeros(())
        self._steps = {}

        if self.is_train:
            self.init_training_settings()

    def init_training_settings(self):
        train_opt = self.opt['train']
        self.net_d = build_network(self.opt['network_d'])
        self.cri_gan = build_loss(train_opt['gan_opt'])
        self.r1_reg_weight = train_opt['r1_reg_weight']
        self.path_reg_weight = train_opt['path_reg_weight']
        self.net_g_reg_every = train_opt['net_g_reg_every']
        self.net_d_reg_every = train_opt['net_d_reg_every']
        self.mixing_prob = train_opt['mixing_prob']
        self.path_batch_shrink = train_opt.get('path_batch_shrink', 2)
        self.setup_schedulers()
        self.setup_optimizers()

    def setup_optimizers(self):
        """Lazy-regularization-scaled Adam (reference :88-168)."""
        train_opt = self.opt['train']
        g_ratio = self.net_g_reg_every / (self.net_g_reg_every + 1)
        d_ratio = self.net_d_reg_every / (self.net_d_reg_every + 1)
        lr_g = train_opt['optim_g']['lr'] * g_ratio
        lr_d = train_opt['optim_d']['lr'] * d_ratio
        self.base_lrs = [lr_g, lr_d]
        self.tx = optax.adam(
            lambda step: lr_g * self.schedule_fn(step),
            b1=0**g_ratio, b2=0.99**g_ratio)
        self.tx_d = optax.adam(
            lambda step: lr_d * self.schedule_fn(step),
            b1=0**d_ratio, b2=0.99**d_ratio)

    def feed_data(self, data):
        self.real_img = np.asarray(data['gt'], np.float32)
        self._ensure_initialized()

    def _ensure_initialized(self):
        if self.variables is not None:
            return
        rng = jax.random.PRNGKey(self.opt.get('manual_seed') or 0)
        style = jnp.zeros((1, self.num_style_feat))
        self.variables = self.net_g.init(
            {'params': rng, 'noise': rng}, [style])
        load_path = self.opt['path'].get('pretrain_network_g')
        if load_path:
            strict_g = self.opt['path'].get('strict_load_g', True)
            loaded = self.load_network(
                load_path, strict=strict_g,
                param_key=self.opt['path'].get('param_key_g', 'params'))
            self.variables = self._merge_loaded(self.variables, loaded,
                                                strict=strict_g)
        self.variables = replicate(self.variables, self.mesh)
        if not self.is_train:
            self.ema_variables = self.variables
            return
        self.ema_variables = jax.tree_util.tree_map(jnp.copy,
                                                    self.variables)
        if load_path:
            # load_network falls back params_ema -> params with a log
            # line when the checkpoint has no EMA key; real load errors
            # propagate loudly (the reference also fails loudly)
            loaded = self.load_network(load_path, strict=True,
                                       param_key='params_ema')
            self.ema_variables = self._merge_loaded(
                self.ema_variables, loaded)
        out_size = self.opt['network_d'].get(
            'out_size', self.opt['network_g']['out_size'])
        img = jnp.zeros((1, out_size, out_size, 3))
        self.vars_d = self.net_d.init(jax.random.PRNGKey(1), img)
        load_path = self.opt['path'].get('pretrain_network_d')
        if load_path:
            strict_d = self.opt['path'].get('strict_load_d', True)
            loaded = self.load_network(
                load_path, strict=strict_d,
                param_key=self.opt['path'].get('param_key_d', 'params'))
            self.vars_d = self._merge_loaded(self.vars_d, loaded,
                                             strict=strict_d)
        self.vars_d = replicate(self.vars_d, self.mesh)
        self.opt_state = self.tx.init(self.variables['params'])
        self.opt_state_d = self.tx_d.init(self.vars_d['params'])
        if self._resume_trees is not None:
            self._restore_trees()

    _resume_trees = None

    def resume_training(self, resume_state):
        """Defer optimizer-state restore until the nets are built
        (mirrors SRModel.resume_training; without this override the
        BaseModel stub raises and --auto_resume crashes)."""
        self._resume_trees = dict(resume_state.get('trees', {}))

    def _restore_trees(self):
        from flax import serialization
        if 'opt_state_g' in self._resume_trees:
            self.opt_state = serialization.from_bytes(
                self.opt_state, self._resume_trees['opt_state_g'])
        if 'opt_state_d' in self._resume_trees:
            self.opt_state_d = serialization.from_bytes(
                self.opt_state_d, self._resume_trees['opt_state_d'])
        self._resume_trees = None

    # --------------------------------------------------------------- step
    def _build_step(self, mixing, do_r1, do_path):
        net_g, net_d = self.net_g, self.net_d
        cri_gan = self.cri_gan
        tx, tx_d = self.tx, self.tx_d
        r1_w, path_w = self.r1_reg_weight, self.path_reg_weight
        d_every, g_every = self.net_d_reg_every, self.net_g_reg_every
        shrink = self.path_batch_shrink
        ema_decay = 0.5**(32 / (10 * 1000))

        def gen_apply(params_g, noises, rng, inject_index=None,
                      return_latents=False, input_is_latent=False):
            return net_g.apply(
                {'params': params_g}, noises, inject_index=inject_index,
                return_latents=return_latents,
                input_is_latent=input_is_latent, rngs={'noise': rng})

        def step(vars_g, opt_g, ema, vars_d, opt_d, real_img,
                 mean_path_length, rng, inject_index, step_idx):
            losses = OrderedDict()
            b = real_img.shape[0]
            keys = jax.random.split(rng, 8)

            def make_styles(k):
                if mixing:
                    return [jax.random.normal(kk,
                                              (b, self.num_style_feat))
                            for kk in jax.random.split(k, 2)]
                return [jax.random.normal(k, (b, self.num_style_feat))]

            # ---- D update (reference :188-227)
            styles = make_styles(keys[0])
            fake_img, _ = gen_apply(jax.lax.stop_gradient(
                vars_g['params']), styles, keys[1], inject_index)
            fake_img = jax.lax.stop_gradient(fake_img)

            def d_loss_fn(params_d):
                real_pred = net_d.apply({'params': params_d}, real_img)
                fake_pred = net_d.apply({'params': params_d}, fake_img)
                l_d = cri_gan(real_pred, True, is_disc=True) \
                    + cri_gan(fake_pred, False, is_disc=True)
                if do_r1:
                    l_d_r1 = r1_penalty(
                        lambda img: net_d.apply({'params': params_d},
                                                img), real_img)
                    l_d = l_d + (r1_w / 2 * l_d_r1 * d_every)
                else:
                    l_d_r1 = jnp.zeros(())
                aux = {'l_d': l_d, 'real_score': real_pred.mean(),
                       'fake_score': fake_pred.mean(), 'l_d_r1': l_d_r1}
                return l_d, aux

            (_, d_aux), grads_d = jax.value_and_grad(
                d_loss_fn, has_aux=True)(vars_d['params'])
            updates_d, opt_d = tx_d.update(grads_d, opt_d,
                                           vars_d['params'])
            params_d = optax.apply_updates(vars_d['params'], updates_d)
            vars_d = dict(vars_d, params=params_d)
            losses.update(d_aux)

            # ---- G update (reference :229-258)
            styles = make_styles(keys[2])

            def g_loss_fn(params_g):
                fake, _ = gen_apply(params_g, styles, keys[3],
                                    inject_index)
                fake_pred = net_d.apply(
                    {'params': jax.lax.stop_gradient(params_d)}, fake)
                l_g = cri_gan(fake_pred, True, is_disc=False)
                aux = {'l_g': l_g}
                mpl = mean_path_length
                if do_path:
                    pb = max(1, b // shrink)
                    path_styles = [s[:pb] for s in make_styles(keys[4])]
                    _, latents = gen_apply(params_g, path_styles, keys[5],
                                           inject_index,
                                           return_latents=True)

                    def img_from_latents(z):
                        img, _ = gen_apply(params_g, [z], keys[5],
                                           input_is_latent=True)
                        return img

                    l_g_path, path_lengths, mpl = g_path_regularize(
                        img_from_latents, latents, mean_path_length,
                        keys[6])
                    l_g = l_g + path_w * g_every * l_g_path
                    aux['l_g_path'] = l_g_path
                    aux['path_length'] = path_lengths
                aux['_mpl'] = mpl
                return l_g, aux

            (_, g_aux), grads_g = jax.value_and_grad(
                g_loss_fn, has_aux=True)(vars_g['params'])
            mean_path_length = g_aux.pop('_mpl')
            updates_g, opt_g = tx.update(grads_g, opt_g, vars_g['params'])
            params_g = optax.apply_updates(vars_g['params'], updates_g)
            vars_g = dict(vars_g, params=params_g)
            losses.update(g_aux)

            ema = jax.tree_util.tree_map(
                lambda e, p: e * ema_decay + p * (1 - ema_decay), ema,
                vars_g)
            return vars_g, opt_g, ema, vars_d, opt_d, \
                mean_path_length, losses

        return jax.jit(step, donate_argnums=(0, 1, 2, 3, 4))

    def optimize_parameters(self, current_iter):
        import random as _pyrandom
        mixing = _pyrandom.random() < self.mixing_prob
        do_r1 = current_iter % self.net_d_reg_every == 0
        do_path = current_iter % self.net_g_reg_every == 0
        key = (mixing, do_r1, do_path)
        if key not in self._steps:
            self._steps[key] = self._build_step(*key)
        inject_index = jnp.int32(
            _pyrandom.randint(1, self.net_g.num_latent - 1))
        (self.variables, self.opt_state, self.ema_variables, self.vars_d,
         self.opt_state_d, self.mean_path_length, losses) = \
            self._steps[key](
                self.variables, self.opt_state, self.ema_variables,
                self.vars_d, self.opt_state_d,
                jnp.asarray(self.real_img), self.mean_path_length,
                self.next_rng(), inject_index, current_iter - 1)
        self.log_dict = self.reduce_loss_dict(losses)

    # ----------------------------------------------------------------- val
    def test(self):
        # test.py calls validation without feed_data (sampling needs no
        # input batch), so build/load the nets here if needed
        self._ensure_initialized()
        variables = self.ema_variables or self.variables
        variables = self._prepare_eval_variables(variables)
        self.output, _ = self.net_g.apply(
            {'params': variables['params']},
            [jnp.asarray(self.fixed_sample)],
            rngs={'noise': self.next_rng()})

    def dist_validation(self, dataloader, current_iter, tb_logger,
                        save_img):
        if self.opt['rank'] == 0:
            self.nondist_validation(dataloader, current_iter, tb_logger,
                                    save_img)

    def nondist_validation(self, dataloader, current_iter, tb_logger,
                           save_img):
        assert dataloader is None, 'Validation dataloader should be None.'
        self.test()
        result = tensor2img(self.output, min_max=(-1, 1))
        if self.opt['is_train']:
            save_img_path = osp.join(self.opt['path']['visualization'],
                                     'train', f'train_{current_iter}.png')
        else:
            save_img_path = osp.join(self.opt['path']['visualization'],
                                     'test',
                                     f'test_{self.opt["name"]}.png')
        imwrite(result, save_img_path)
        if tb_logger is not None:
            import cv2
            result = (result / 255.).astype(np.float32)
            result = cv2.cvtColor(result, cv2.COLOR_BGR2RGB)
            tb_logger.add_image('samples', result,
                                global_step=current_iter,
                                dataformats='HWC')

    def save(self, epoch, current_iter):
        self.save_network([self.variables, self.ema_variables], 'net_g',
                          current_iter, param_key=['params', 'params_ema'])
        self.save_network(self.vars_d, 'net_d', current_iter)
        trees = {'opt_state_g': self.opt_state,
                 'opt_state_d': self.opt_state_d}
        self.save_training_state(epoch, current_iter, trees)

    def get_current_visuals(self):
        return OrderedDict(result=np.asarray(self.output))
