"""VGG feature extractor with named-layer taps, flax/NHWC.

Behavioral rebuild of reference basicsr/archs/vgg_arch.py:10-161: a
truncated VGG tower whose forward returns a dict of activations for the
requested layer names. Weights import from either reference-format
checkpoints (keys ``vgg_net.conv1_1.weight``) or raw torchvision VGG
state dicts (``features.0.weight``) via ``vgg_rename``.
"""
from typing import Any, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

from mrefsr_tpu.utils.registry import ARCH_REGISTRY

# standard VGG layer-name rosters (public architecture definition; same
# tables as reference vgg_arch.py:10-33)
NAMES = {
    'vgg11': [
        'conv1_1', 'relu1_1', 'pool1', 'conv2_1', 'relu2_1', 'pool2',
        'conv3_1', 'relu3_1', 'conv3_2', 'relu3_2', 'pool3', 'conv4_1',
        'relu4_1', 'conv4_2', 'relu4_2', 'pool4', 'conv5_1', 'relu5_1',
        'conv5_2', 'relu5_2', 'pool5'
    ],
    'vgg13': [
        'conv1_1', 'relu1_1', 'conv1_2', 'relu1_2', 'pool1', 'conv2_1',
        'relu2_1', 'conv2_2', 'relu2_2', 'pool2', 'conv3_1', 'relu3_1',
        'conv3_2', 'relu3_2', 'pool3', 'conv4_1', 'relu4_1', 'conv4_2',
        'relu4_2', 'pool4', 'conv5_1', 'relu5_1', 'conv5_2', 'relu5_2',
        'pool5'
    ],
    'vgg16': [
        'conv1_1', 'relu1_1', 'conv1_2', 'relu1_2', 'pool1', 'conv2_1',
        'relu2_1', 'conv2_2', 'relu2_2', 'pool2', 'conv3_1', 'relu3_1',
        'conv3_2', 'relu3_2', 'conv3_3', 'relu3_3', 'pool3', 'conv4_1',
        'relu4_1', 'conv4_2', 'relu4_2', 'conv4_3', 'relu4_3', 'pool4',
        'conv5_1', 'relu5_1', 'conv5_2', 'relu5_2', 'conv5_3', 'relu5_3',
        'pool5'
    ],
    'vgg19': [
        'conv1_1', 'relu1_1', 'conv1_2', 'relu1_2', 'pool1', 'conv2_1',
        'relu2_1', 'conv2_2', 'relu2_2', 'pool2', 'conv3_1', 'relu3_1',
        'conv3_2', 'relu3_2', 'conv3_3', 'relu3_3', 'conv3_4', 'relu3_4',
        'pool3', 'conv4_1', 'relu4_1', 'conv4_2', 'relu4_2', 'conv4_3',
        'relu4_3', 'conv4_4', 'relu4_4', 'pool4', 'conv5_1', 'relu5_1',
        'conv5_2', 'relu5_2', 'conv5_3', 'relu5_3', 'conv5_4', 'relu5_4',
        'pool5'
    ]
}

# ImageNet normalization for [0,1] inputs
IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)


def _conv_features(name):
    """Output channels for a named VGG conv."""
    block = int(name[4])
    return {1: 64, 2: 128, 3: 256, 4: 512, 5: 512}[block]


def max_pool_2x2(x, stride=2):
    """Torch MaxPool2d(2, stride) on NHWC (floor mode)."""
    return nn.max_pool(x, (2, 2), strides=(stride, stride))


class VGGTower(nn.Module):
    """Sequential VGG body up to ``last_layer``, taps at ``tap_layers``.

    Conv children carry the VGG layer names so reference checkpoints map
    directly.
    """
    vgg_type: str = 'vgg19'
    tap_layers: Sequence[str] = ()
    last_layer: str = 'pool5'
    remove_pooling: bool = False
    pooling_stride: int = 2

    @nn.compact
    def __call__(self, x):
        names = NAMES[self.vgg_type]
        last_idx = names.index(self.last_layer)
        out = {}
        for name in names[:last_idx + 1]:
            if name.startswith('conv'):
                x = nn.Conv(_conv_features(name), (3, 3), padding=1,
                            name=name)(x)
            elif name.startswith('relu'):
                x = nn.relu(x)
            elif name.startswith('pool'):
                if not self.remove_pooling:
                    x = max_pool_2x2(x, self.pooling_stride)
            if name in self.tap_layers:
                out[name] = x
        return out


@ARCH_REGISTRY.register()
class VGGFeatureExtractor(nn.Module):
    """Named-tap VGG feature extractor
    (reference vgg_arch.py:55-161).

    Input NHWC, range [0,1] (or [-1,1] with range_norm). Returns
    {layer_name: NHWC activation}.
    """
    layer_name_list: Sequence[str]
    vgg_type: str = 'vgg19'
    use_input_norm: bool = True
    range_norm: bool = False
    requires_grad: bool = False  # honored by the train step, kept for API
    remove_pooling: bool = False
    pooling_stride: int = 2

    @nn.compact
    def __call__(self, x):
        if self.range_norm:
            x = (x + 1) / 2
        if self.use_input_norm:
            mean = jnp.asarray(IMAGENET_MEAN, x.dtype)
            std = jnp.asarray(IMAGENET_STD, x.dtype)
            x = (x - mean) / std

        names = NAMES[self.vgg_type]
        last = max(self.layer_name_list, key=names.index)
        return VGGTower(self.vgg_type, tuple(self.layer_name_list), last,
                        self.remove_pooling, self.pooling_stride,
                        name='vgg_net')(x)


def vgg_rename(vgg_type='vgg19'):
    """Rename raw torchvision VGG keys (``features.<idx>.*``) to the
    reference layout (``vgg_net.<layer_name>.*``) for torch_to_flax."""
    names = NAMES[vgg_type]
    # torchvision indexes every layer (convs, relus, pools) sequentially
    idx_to_name = {i: n for i, n in enumerate(names)}

    def rename(key):
        if key.startswith('classifier.'):
            return None
        if key.startswith('features.'):
            parts = key.split('.')
            idx = int(parts[1])
            name = idx_to_name.get(idx)
            if name is None or not name.startswith('conv'):
                return None
            return 'vgg_net.' + name + '.' + parts[2]
        return key

    return rename
