"""Convert the official RIDNet checkpoint: the official and our module
graphs enumerate parameters in the same order, so the mapping is
positional (reference scripts/model_conversion/convert_ridnet.py)."""
import os.path as osp
import sys
from collections import OrderedDict

import torch

sys.path.insert(0, osp.dirname(osp.dirname(osp.dirname(
    osp.abspath(__file__)))))


def ridnet_key_order():
    """The reference-layout key list in the POSITIONAL order of the
    torch arch's named_parameters (module-definition order, weight
    before bias per conv) — the order the official checkpoint's
    tensors arrive in. NOTE: a flax param tree cannot supply this
    (flax dicts iterate alphabetically), so the order is spelled out
    from the reference module structure (reference
    basicsr/archs/ridnet_arch.py:131-180) and cross-checked against
    our flax RIDNet's key SET."""
    names = []

    def conv(base):
        names.extend([f'{base}.weight', f'{base}.bias'])

    conv('sub_mean')
    conv('add_mean')
    conv('head')
    for i in range(4):  # 4 EAM blocks
        for m in ('merge.dilation1.0', 'merge.dilation1.2',
                  'merge.dilation2.0', 'merge.dilation2.2',
                  'merge.aggregation.0'):
            conv(f'body.{i}.{m}')
        conv(f'body.{i}.block1.conv1')
        conv(f'body.{i}.block1.conv2')
        for m in ('block2.body.0', 'block2.body.2', 'block2.body.4'):
            conv(f'body.{i}.{m}')
        conv(f'body.{i}.ca.attention.1')
        conv(f'body.{i}.ca.attention.3')
    conv('tail')

    import jax
    import jax.numpy as jnp
    from mrefsr_tpu.archs.ridnet_arch import RIDNet
    from mrefsr_tpu.convert import flax_to_torch

    net = RIDNet(3, 64, 3)
    shapes = jax.eval_shape(
        lambda k: net.init(k, jnp.zeros((1, 16, 16, 3))),
        jax.random.PRNGKey(0))
    flax_keys = set(flax_to_torch(jax.tree_util.tree_map(
        lambda s: jnp.zeros(s.shape), shapes['params'])))
    if set(names) != flax_keys:
        raise RuntimeError(
            'positional layout drifted from the flax RIDNet: '
            f'only-here={sorted(set(names) - flax_keys)[:5]} '
            f'only-flax={sorted(flax_keys - set(names))[:5]}')
    return names


def convert_ridnet(ori_sd, names):
    """Positional official->reference mapping: official tensor i lands
    on reference key i (reference convert_ridnet.py:16-19)."""
    if len(ori_sd) != len(names):
        raise ValueError(f'official checkpoint has {len(ori_sd)} '
                         f'tensors, reference layout has {len(names)}')
    new_dict = OrderedDict()
    for (name, param), crt_name in zip(ori_sd.items(), names):
        new_dict[crt_name] = param
    return new_dict


if __name__ == '__main__':
    ori = torch.load(
        'experiments/pretrained_models/RIDNet/'
        'RIDNet_official_original.pt', map_location='cpu')
    new_dict = convert_ridnet(ori, ridnet_key_order())
    torch.save({'params': new_dict},
               'experiments/pretrained_models/RIDNet/RIDNet.pth')
    print(f'converted {len(new_dict)} tensors')
