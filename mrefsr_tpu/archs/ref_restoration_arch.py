"""Single-reference RestorationNet (C2-Matching-style), flax/NHWC.

Behavioral rebuild of reference basicsr/archs/ref_restoration_arch.py:
100-259: same 3-scale DynAgg decoder as MRAPA, but with one reference and
concat+conv fusion heads instead of attention.
"""
import flax.linen as nn
import jax
import jax.numpy as jnp

from mrefsr_tpu.ops import interpolate, pixel_shuffle
from mrefsr_tpu.utils.registry import ARCH_REGISTRY

from .arch_util import ResidualBlockNoBN, run_blocks, srntt_normal_init
from .ref_mrapa_restoration_arch import ContentExtractor, DynAgg


def _lrelu(x):
    return jax.nn.leaky_relu(x, 0.1)


def _scale_stage(x, pre_offset, ref_feat, nf, ref_nf, n_blocks, groups,
                 prefix, dcn_outer_remat=False):
    """One single-ref decoder scale (reference :219-259): offset convs ->
    DynAgg -> concat+conv head -> residual body -> tail."""
    init = srntt_normal_init(0.02)
    p = prefix

    off = jnp.concatenate([x, ref_feat], axis=-1)
    off = _lrelu(nn.Conv(ref_nf, (3, 3), padding=1, kernel_init=init,
                         name=f'{p}_offset_conv1')(off))
    off = _lrelu(nn.Conv(ref_nf, (3, 3), padding=1, kernel_init=init,
                         name=f'{p}_offset_conv2')(off))
    # same outer-remat policy (and measured trade-off) as the multi-ref
    # arch — see ref_mrapa_restoration_arch._align_one_ref
    dyn_agg_cls = nn.remat(DynAgg) if dcn_outer_remat else DynAgg
    swapped = _lrelu(dyn_agg_cls(ref_nf, ref_nf, 3, deform_groups=groups,
                                 name=f'{p}_dyn_agg')(ref_feat, off,
                                                      pre_offset))

    h = jnp.concatenate([x, swapped], axis=-1)
    h = _lrelu(nn.Conv(nf, (3, 3), padding=1, kernel_init=init,
                       name=f'head_{p}.0')(h))
    # srntt_init_weights covers these blocks too (reference :111)
    h = run_blocks(h, ResidualBlockNoBN, n_blocks, f'body_{p}',
                   num_feat=nf, kernel_init=init) + x

    if p in ('small', 'medium'):
        h = nn.Conv(nf * 4, (3, 3), padding=1, kernel_init=init,
                    name=f'tail_{p}.0')(h)
        h = _lrelu(pixel_shuffle(h, 2))
    else:
        h = _lrelu(nn.Conv(nf // 2, (3, 3), padding=1, kernel_init=init,
                           name=f'tail_{p}.0')(h))
        h = nn.Conv(3, (3, 3), padding=1, kernel_init=init,
                    name=f'tail_{p}.2')(h)
    return h


class DynamicAggregationRestoration(nn.Module):
    """Single-ref 3-scale decoder (reference :139-259)."""
    ngf: int = 64
    n_blocks: int = 16
    groups: int = 8
    dcn_outer_remat: bool = False

    @nn.compact
    def __call__(self, x, pre_offset, img_ref_feat):
        x = _scale_stage(x, pre_offset['relu3_1'], img_ref_feat['relu3_1'],
                         self.ngf, 256, self.n_blocks, self.groups, 'small',
                         self.dcn_outer_remat)
        x = _scale_stage(x, pre_offset['relu2_1'], img_ref_feat['relu2_1'],
                         self.ngf, 128, self.n_blocks, self.groups,
                         'medium', self.dcn_outer_remat)
        x = _scale_stage(x, pre_offset['relu1_1'], img_ref_feat['relu1_1'],
                         self.ngf, 64, self.n_blocks, self.groups, 'large',
                         self.dcn_outer_remat)
        return x


@ARCH_REGISTRY.register()
class RestorationNet(nn.Module):
    """Single-reference restoration net (reference :100-136).

    Call: (x (B,h,w,3), pre_offset {level: (B,H,W,9,2)},
    img_ref_feat {level: (B,H,W,C)}).
    """
    ngf: int = 64
    n_blocks: int = 16
    groups: int = 8
    dcn_outer_remat: bool = False

    @nn.compact
    def __call__(self, x, pre_offset, img_ref_feat):
        base = interpolate(x, scale_factor=4, mode='bilinear',
                           align_corners=False)
        content_feat = ContentExtractor(self.ngf, self.n_blocks,
                                        name='content_extractor')(x)
        upscale = DynamicAggregationRestoration(
            self.ngf, self.n_blocks, self.groups, self.dcn_outer_remat,
            name='dyn_agg_restore')(content_feat, pre_offset, img_ref_feat)
        return upscale + base
