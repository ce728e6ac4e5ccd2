"""YAML experiment options: parse, override, derive paths.

Keeps the reference's public config surface (one YAML fully describes an
experiment; CLI flags ``-opt``, ``--launcher``, ``--auto_resume``,
``--debug``, ``--force_yml``; reference: basicsr/utils/options.py:82-178)
while replacing unsafe ``exec``/``eval`` overrides with
``ast.literal_eval`` and the NCCL bootstrap with jax process info.
"""
import argparse
import ast
import os
import os.path as osp
import random
import sys

import yaml

from .dist_util import get_dist_info, init_dist, master_only
from .misc import set_random_seed


def _parse_scalar(value):
    """Best-effort safe literal parse of a CLI override value."""
    if value in ('~', 'none', 'None', 'null'):
        return None
    if value in ('true', 'True'):
        return True
    if value in ('false', 'False'):
        return False
    try:
        return ast.literal_eval(value)
    except (ValueError, SyntaxError):
        return value


def ordered_yaml():
    """Return (Loader, Dumper) preserving mapping order.

    Python 3.7+ dicts are ordered, so plain dicts suffice; this keeps the
    reference API name (options.py:12-34).
    """
    try:
        from yaml import CSafeDumper as Dumper
        from yaml import CSafeLoader as Loader
    except ImportError:
        from yaml import SafeDumper as Dumper
        from yaml import SafeLoader as Loader
    return Loader, Dumper


def yaml_load(f):
    """Load yaml from a file path or a string (reference options.py:37-49)."""
    if os.path.isfile(f):
        with open(f, 'r') as fh:
            return yaml.load(fh, Loader=ordered_yaml()[0])
    if f.endswith(('.yml', '.yaml')) and '\n' not in f:
        # a path was clearly intended: fail loudly instead of yaml-parsing
        # the path string into a scalar
        raise FileNotFoundError(f'Option file not found: {f}')
    return yaml.load(f, Loader=ordered_yaml()[0])


def dict2str(opt, indent_level=1):
    """Pretty-print an options dict (reference options.py:52-70)."""
    msg = '\n'
    for k, v in opt.items():
        if isinstance(v, dict):
            msg += ' ' * (indent_level * 2) + k + ':['
            msg += dict2str(v, indent_level + 1)
            msg += ' ' * (indent_level * 2) + ']\n'
        else:
            msg += ' ' * (indent_level * 2) + k + ': ' + str(v) + '\n'
    return msg


def _set_by_path(d, keys, value):
    for key in keys[:-1]:
        d = d.setdefault(key, {})
    d[keys[-1]] = value


def parse_options(root_path, is_train=True, args=None):
    """Parse CLI args + YAML into the experiment options dict.

    Mirrors reference options.py:82-178: distributed bootstrap, rank
    injection, seeding, per-dataset phase/scale propagation, derived
    experiment paths, and debug-mode frequency shrinking.
    """
    parser = argparse.ArgumentParser()
    parser.add_argument('-opt', type=str, required=True,
                        help='Path to option YAML file.')
    parser.add_argument('--launcher', choices=['none', 'pytorch', 'slurm',
                                               'jax'],
                        default='none', help='job launcher')
    parser.add_argument('--auto_resume', action='store_true')
    parser.add_argument('--debug', action='store_true')
    parser.add_argument('--local_rank', type=int, default=0)
    parser.add_argument(
        '--force_yml', nargs='+', default=None,
        help='Force to update yml files. Examples: train:ema_decay=0.999')
    args = parser.parse_args(args=args if args is not None
                             else sys.argv[1:])

    opt = yaml_load(args.opt)

    # distributed settings
    if args.launcher == 'none':
        opt['dist'] = False
    else:
        opt['dist'] = True
        init_dist(args.launcher, **opt.get('dist_params', {}) or {})
    opt['rank'], opt['world_size'] = get_dist_info()

    # random seed
    seed = opt.get('manual_seed')
    if seed is None:
        seed = random.randint(1, 10000)
        opt['manual_seed'] = seed
    set_random_seed(seed + opt['rank'])

    # force to update yml options
    if args.force_yml is not None:
        for entry in args.force_yml:
            entry = entry.replace(' ', '')
            keys, value = entry.split('=', 1)
            _set_by_path(opt, keys.split(':'), _parse_scalar(value))

    opt['auto_resume'] = args.auto_resume
    opt['is_train'] = is_train

    # debug setting
    if args.debug and not opt['name'].startswith('debug'):
        opt['name'] = 'debug_' + opt['name']

    if opt.get('num_gpu', None) == 'auto':
        import jax
        opt['num_gpu'] = jax.local_device_count()

    # datasets
    for phase, dataset in (opt.get('datasets') or {}).items():
        # for multiple datasets, e.g., val_1, val_2; test_1, test_2
        phase = phase.split('_')[0]
        dataset['phase'] = phase
        if 'scale' in opt:
            dataset['scale'] = opt['scale']
        if dataset.get('dataroot_gt') is not None:
            dataset['dataroot_gt'] = osp.expanduser(dataset['dataroot_gt'])
        if dataset.get('dataroot_lq') is not None:
            dataset['dataroot_lq'] = osp.expanduser(dataset['dataroot_lq'])

    # paths
    opt.setdefault('path', {})
    for key, val in opt['path'].items():
        if (val is not None) and ('resume_state' in key
                                  or 'pretrain_network' in key):
            opt['path'][key] = osp.expanduser(val)

    if is_train:
        experiments_root = opt['path'].get('experiments_root')
        if experiments_root is None:
            experiments_root = osp.join(root_path, 'experiments')
        experiments_root = osp.join(experiments_root, opt['name'])
        opt['path']['experiments_root'] = experiments_root
        opt['path']['models'] = osp.join(experiments_root, 'models')
        opt['path']['training_states'] = osp.join(experiments_root,
                                                  'training_states')
        opt['path']['log'] = experiments_root
        opt['path']['visualization'] = osp.join(experiments_root,
                                                'visualization')

        # change some options for debug mode
        if 'debug' in opt['name']:
            if 'val' in opt:
                opt['val']['val_freq'] = 8
            opt['logger']['print_freq'] = 1
            opt['logger']['save_checkpoint_freq'] = 8
    else:  # test
        results_root = opt['path'].get('results_root')
        if results_root is None:
            results_root = osp.join(root_path, 'results')
        results_root = osp.join(results_root, opt['name'])
        opt['path']['results_root'] = results_root
        opt['path']['log'] = results_root
        opt['path']['visualization'] = osp.join(results_root,
                                                'visualization')

    _enable_compilation_cache(opt, root_path)
    return opt, args


def _enable_compilation_cache(opt, root_path):
    """Persistent XLA compilation cache for the CLI pipelines, STRICTLY
    OPT-IN (``compilation_cache: true`` in YAML or
    ``MREFSR_XLA_CACHE_DIR=<dir>``): on a standard TPU runtime it lets
    reruns of the same config skip the minutes-long compile, but on
    remote-compile runtimes (e.g. the tunneled axon platform) cache
    keys were observed never to match across sessions (entries written,
    zero reused), making it pure serialization overhead — so it must
    not be the default. (No reference equivalent — torch has no AOT
    graph compile to cache.)"""
    env = os.environ.get('MREFSR_XLA_CACHE_DIR')
    if not env and not opt.get('compilation_cache'):
        return
    if env == '0' or opt.get('compilation_cache') is False:
        return
    cache_dir = (env if env and env != '1' else None) \
        or opt['path'].get('compilation_cache') \
        or osp.join(root_path, 'experiments', '.xla_cache')
    try:
        import jax
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update('jax_compilation_cache_dir', cache_dir)
        # cache even fast compiles: CLI processes are short-lived
        jax.config.update('jax_persistent_cache_min_compile_time_secs',
                          0.5)
    except Exception as e:  # cache is an optimization, never fatal
        print(f'compilation cache disabled: {e}')


@master_only
def copy_opt_file(opt_file, experiments_root):
    """Archive the YAML into the experiment dir with provenance info
    (reference options.py:181-195; @master_only like the reference —
    non-zero ranks would race on, or lack, the experiment dir)."""
    import time
    from shutil import copyfile
    cmd = ' '.join(sys.argv)
    filename = osp.join(experiments_root, osp.basename(opt_file))
    copyfile(opt_file, filename)
    with open(filename, 'r+') as f:
        lines = f.readlines()
        lines.insert(0,
                     f'# GENERATE TIME: {time.asctime()}\n# CMD:\n# {cmd}\n\n')
        f.seek(0)
        f.writelines(lines)
