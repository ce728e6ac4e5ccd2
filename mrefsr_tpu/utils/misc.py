"""Miscellaneous host-side utilities (seeding, dirs, scandir, resume).

Rebuild of reference basicsr/utils/misc.py semantics for the TPU stack:
seeding covers python/numpy and returns a root ``jax.random`` key instead of
seeding CUDA (reference: misc.py:13-22); experiment dirs / archive-rename and
``check_resume`` keep the reference behavior (misc.py:26-126).
"""
import os
import os.path as osp
import random
import re
import time

import numpy as np

from .dist_util import master_only


def set_random_seed(seed):
    """Seed python & numpy RNGs; return the seed for deriving jax keys.

    Device-side randomness in this framework flows through explicit
    ``jax.random`` keys derived from this seed — there is no global device
    RNG to seed (unlike torch.cuda.manual_seed_all in the reference).
    """
    random.seed(seed)
    np.random.seed(seed)
    return seed


def get_time_str():
    return time.strftime('%Y%m%d_%H%M%S', time.localtime())


def mkdir_and_rename(path):
    """mkdir; if the path exists, rename it with a timestamp then mkdir.

    Mirrors reference misc.py:26-37 so old experiment dirs are archived, not
    clobbered.
    """
    if osp.exists(path):
        new_name = path + '_archived_' + get_time_str()
        print(f'Path already exists. Rename it to {new_name}', flush=True)
        os.rename(path, new_name)
    os.makedirs(path, exist_ok=True)


@master_only
def make_exp_dirs(opt):
    """Create experiment directories (reference misc.py:40-51)."""
    path_opt = opt['path'].copy()
    if opt['is_train']:
        mkdir_and_rename(path_opt.pop('experiments_root'))
    else:
        mkdir_and_rename(path_opt.pop('results_root'))
    for key, path in path_opt.items():
        if ('strict_load' in key) or ('pretrain_network' in key) or (
                'resume' in key) or ('param_key' in key):
            continue
        if isinstance(path, str):
            os.makedirs(path, exist_ok=True)


def scandir(dir_path, suffix=None, recursive=False, full_path=False):
    """Scan a directory for files (reference misc.py:54-93)."""
    if (suffix is not None) and not isinstance(suffix, (str, tuple)):
        raise TypeError('"suffix" must be a string or tuple of strings')

    root = dir_path

    def _scandir(dir_path, suffix, recursive):
        for entry in os.scandir(dir_path):
            if not entry.name.startswith('.') and entry.is_file():
                if full_path:
                    return_path = entry.path
                else:
                    return_path = osp.relpath(entry.path, root)
                if suffix is None:
                    yield return_path
                elif return_path.endswith(suffix):
                    yield return_path
            elif recursive and entry.is_dir():
                yield from _scandir(entry.path, suffix=suffix,
                                    recursive=recursive)

    return _scandir(dir_path, suffix=suffix, recursive=recursive)


def check_resume(opt, resume_iter):
    """Rewrite pretrain paths to the resumed checkpoints.

    Mirrors reference misc.py:96-126: when ``resume_state`` is set, every
    ``network_*`` in the config gets its ``pretrain_network_*`` pointed at
    ``models/net_*_<iter>`` (orbax dir or .pth), except ignore-listed nets.
    """
    if opt['path'].get('resume_state'):
        # get all the networks
        networks = [key for key in opt.keys() if key.startswith('network_')]
        flag_pretrain = False
        for network in networks:
            if opt['path'].get(f'pretrain_{network}') is not None:
                flag_pretrain = True
        if flag_pretrain:
            print('pretrain_network paths will be ignored during resuming.',
                  flush=True)
        for network in networks:
            name = f'pretrain_{network}'
            basename = network.replace('network_', '')
            if opt['path'].get('ignore_resume_networks') is None or (
                    network not in opt['path']['ignore_resume_networks']):
                opt['path'][name] = osp.join(
                    opt['path']['models'],
                    f'net_{basename}_{resume_iter}.pth')
                print(f"Set {name} to {opt['path'][name]}", flush=True)
        # param_key follows the EMA convention
        param_keys = [key for key in opt['path'].keys()
                      if key.startswith('param_key')]
        for param_key in param_keys:
            if opt['path'][param_key] == 'params_ema':
                opt['path'][param_key] = 'params'
                print(f'Set {param_key} to params', flush=True)


def sizeof_fmt(size, suffix='B'):
    """Human readable size (reference misc.py:129-143)."""
    for unit in ['', 'K', 'M', 'G', 'T', 'P', 'E', 'Z']:
        if abs(size) < 1024.0:
            return f'{size:3.1f} {unit}{suffix}'
        size /= 1024.0
    return f'{size:3.1f} Y{suffix}'
