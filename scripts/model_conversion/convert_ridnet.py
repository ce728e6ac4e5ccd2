"""Convert the official RIDNet checkpoint: the official and our module
graphs enumerate parameters in the same order, so the mapping is
positional (reference scripts/model_conversion/convert_ridnet.py)."""
import os.path as osp
import sys
from collections import OrderedDict

import torch

sys.path.insert(0, osp.dirname(osp.dirname(osp.dirname(
    osp.abspath(__file__)))))

if __name__ == '__main__':
    import jax
    import jax.numpy as jnp
    from mrefsr_tpu.archs.ridnet_arch import RIDNet
    from mrefsr_tpu.convert import flax_to_torch

    ori = torch.load(
        'experiments/pretrained_models/RIDNet/'
        'RIDNet_official_original.pt', map_location='cpu')

    net = RIDNet(3, 64, 3)
    variables = net.init(jax.random.PRNGKey(0),
                         jnp.zeros((1, 16, 16, 3)))
    ref_sd = flax_to_torch(variables['params'])

    new_dict = OrderedDict()
    names = list(ref_sd)
    for (name, param), crt_name in zip(ori.items(), names):
        new_dict[crt_name] = param
    torch.save({'params': new_dict},
               'experiments/pretrained_models/RIDNet/RIDNet.pth')
    print(f'converted {len(new_dict)} tensors')
