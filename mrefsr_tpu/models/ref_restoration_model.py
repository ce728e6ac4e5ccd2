"""Single-reference restoration training strategy.

Rebuild of reference basicsr/models/ref_restoration_model.py:21-375 —
identical structure to the multi-ref model but with one reference image
(``img_ref``) and un-stacked pre_offset / img_ref_feat. Implemented by
specializing the multi-ref model: a single ref is a T=1 stack whose T
axis is squeezed before net_g (RestorationNet takes un-stacked dicts).
"""
import jax
import jax.numpy as jnp
import numpy as np

from mrefsr_tpu.utils.registry import MODEL_REGISTRY

from .multi_ref_restoration_model import MultiRefRestorationModel


@MODEL_REGISTRY.register()
class RefRestorationModel(MultiRefRestorationModel):

    _multi_ref = False

    def feed_data(self, data):
        self.img_in_lq = np.asarray(data['img_in_lq'], np.float32)
        # single ref rides as a T=1 stack internally
        self.img_ref_list = np.asarray(data['img_ref'],
                                       np.float32)[:, None]
        self.gt = np.asarray(data['img_in'], np.float32)
        self.match_img_in = np.asarray(data['img_in_up'], np.float32)
        self._ensure_initialized({
            'img_in_up': self.match_img_in,
            'img_ref_list': self.img_ref_list,
            'img_in_lq': self.img_in_lq,
            'img_in': self.gt,
        })

    def _forward(self, params_g, vars_ex, vars_map, match_img_in, refs,
                 lq):
        # extractor is the single-ref ContrasExtractorSep: takes one ref
        feats = self.net_extractor.apply(vars_ex, match_img_in,
                                         refs[:, 0])
        d2 = feats['dense_features2'][:, None]  # re-stack as T=1
        pre_offset, img_ref_feat = self._run_map(
            feats['dense_features1'], d2, refs, vars_map)
        # RestorationNet consumes un-stacked (B,...) dicts
        pre_offset = {k: v[:, 0] for k, v in pre_offset.items()}
        img_ref_feat = {k: v[:, 0] for k, v in img_ref_feat.items()}
        return self.net_g.apply({'params': params_g}, lq, pre_offset,
                                img_ref_feat)

    def _ensure_initialized(self, batch):
        if self.vars_g is not None:
            return
        from mrefsr_tpu.parallel import replicate
        from mrefsr_tpu.utils import get_root_logger
        logger = get_root_logger()
        rng = jax.random.PRNGKey(self.opt.get('manual_seed') or 0)
        r1, r2, r3, r4 = jax.random.split(rng, 4)

        match_img_in = jnp.asarray(batch['img_in_up'][:1])
        refs = jnp.asarray(batch['img_ref_list'][:1])
        lq = jnp.asarray(batch['img_in_lq'][:1])

        self.vars_extractor = self.net_extractor.init(r1, match_img_in,
                                                      refs[:, 0])
        load_path = self.opt['path'].get(
            'pretrain_network_feature_extractor')
        if load_path:
            from .multi_ref_restoration_model import _drop_buffer_keys
            loaded = self.load_network(load_path, param_key='params',
                                       rename=_drop_buffer_keys)
            self.vars_extractor = self._merge(self.vars_extractor, loaded)
            logger.info(f'Loaded feature extractor from {load_path}')

        feats = self.net_extractor.apply(self.vars_extractor, match_img_in,
                                         refs[:, 0])
        d1, d2 = feats['dense_features1'], feats['dense_features2']
        self.vars_map = self.net_map.init(
            r2, {'dense_features1': d1, 'dense_features2': d2},
            refs[:, 0])
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
            self.vars_map = self._merge(self.vars_map,
                                        torch_to_flax(sd, rename=rename))

        pre_offset, img_ref_feat = self._run_map(d1, d2[:, None], refs)
        pre_offset = {k: v[:, 0] for k, v in pre_offset.items()}
        img_ref_feat = {k: v[:, 0] for k, v in img_ref_feat.items()}
        self.vars_g = self.net_g.init(r3, lq, pre_offset, img_ref_feat)
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
