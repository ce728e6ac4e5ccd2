from .correlation import (feature_match_index, index_to_flow,
                          sample_patches, tensor_shift)
from .dcn import deform_conv2d, deform_sample, modulated_deform_conv2d, \
    offset_mask_from_conv_out
from .fused_act import fused_leaky_relu
from .resize import interpolate, pixel_shuffle, pixel_unshuffle
from .upfirdn2d import upfirdn2d
from .warp import flow_warp, grid_sample, resize_flow

__all__ = [
    'feature_match_index', 'index_to_flow', 'sample_patches', 'tensor_shift',
    'deform_conv2d', 'modulated_deform_conv2d', 'offset_mask_from_conv_out',
    'fused_leaky_relu', 'interpolate', 'pixel_shuffle', 'pixel_unshuffle',
    'upfirdn2d', 'flow_warp', 'grid_sample', 'resize_flow',
]
