"""Torch ``.pth`` checkpoint -> flax pytree conversion.

Keeps the reference's checkpoint surface importable
(reference base_model.py:198-243 saves ``{param_key: state_dict}`` with
``module.`` prefixes stripped): the same files load into this framework's
flax modules. Name mapping is mechanical because our flax modules mirror
the reference's torch attribute names:

    torch key                      flax path
    conv_first.weight          ->  ('conv_first', 'kernel')   OIHW->HWIO
    body.0.conv1.bias          ->  ('body', '0', 'conv1', 'bias')
    linear.weight              ->  ('linear', 'kernel')       (O,I)->(I,O)
    prelu.weight               ->  ('prelu', 'weight')
    bn.weight / bn.bias        ->  ('bn', 'scale') / ('bn', 'bias')
    bn.running_mean/var        ->  batch_stats ('bn', 'mean'/'var')
"""
import numpy as np


def load_torch_state_dict(path, param_key='params'):
    """Load a reference-format .pth: {param_key: state_dict} or a bare
    state_dict; strips ``module.`` prefixes (reference
    base_model.py:280-306).

    param_key selection happens HERE (with the reference's
    params_ema -> params fallback, base_model.py:294-297): asking for
    'params_ema' from a {'params': ...}-only file falls back to
    'params' with a log line; a key absent entirely means the file is a
    bare state dict and is used as-is. param_key=None skips selection
    (bare external checkpoints, e.g. torchvision VGG)."""
    import torch
    ckpt = torch.load(path, map_location='cpu', weights_only=True)
    if param_key is not None and isinstance(ckpt, dict):
        if param_key not in ckpt and param_key == 'params_ema' \
                and isinstance(ckpt.get('params'), dict):
            from mrefsr_tpu.utils import get_root_logger
            get_root_logger().info(
                'Loading: params_ema does not exist, use params.')
            param_key = 'params'
        if isinstance(ckpt.get(param_key), dict):
            ckpt = ckpt[param_key]
    out = {}
    for k, v in ckpt.items():
        if isinstance(v, dict):
            raise ValueError(
                f'{path} is a wrapped checkpoint (keys {list(ckpt)}); '
                f'pass param_key to select one (got {param_key!r})')
        if k.startswith('module.'):
            k = k[7:]
        out[k] = v.numpy() if hasattr(v, 'numpy') else np.asarray(v)
    return out


def torch_to_flax(state_dict, rename=None):
    """Convert a flat torch state dict to flax {'params':..,'batch_stats':..}.

    Args:
        state_dict: {torch_key: numpy array}.
        rename: optional callable(torch_key)->torch_key applied first
            (for archs whose module graph differs from ours).

    Returns:
        dict with 'params' (and 'batch_stats' if BN buffers present).
    """
    params = {}
    batch_stats = {}
    spectral = {}
    # apply rename up front so norm-module detection below sees the SAME
    # key space as the mapping loop (deriving norm_modules from the
    # pre-rename keys mis-mapped a renamed BatchNorm's gamma to 'weight'
    # instead of 'scale')
    items = []
    for key, val in state_dict.items():
        if rename is not None:
            key = rename(key)
            if key is None:
                continue
        items.append((key, val))
    # modules owning running stats are norm layers: their 1-D 'weight' maps
    # to flax's 'scale'
    norm_modules = {k.rsplit('.', 1)[0] for k, _ in items
                    if k.endswith('running_mean')}
    for key, val in items:
        parts = _split_key(key)
        leaf = parts[-1]
        path = parts[:-1]
        val = np.asarray(val)

        if leaf == 'running_mean':
            _set(batch_stats, path + ['mean'], val)
            continue
        if leaf == 'running_var':
            _set(batch_stats, path + ['var'], val)
            continue
        if leaf == 'num_batches_tracked':
            continue
        # torch spectral_norm buffers: weight_orig is the raw kernel,
        # u/v are the power-iteration state (collection 'spectral')
        if leaf == 'weight_orig':
            leaf = 'weight'
        elif leaf == 'weight_u':
            _set(spectral, path + ['u'], val)
            continue
        elif leaf == 'weight_v':
            _set(spectral, path + ['v'], val)
            continue
        if leaf == 'weight':
            if val.ndim == 5:  # conv3d OIDHW -> DHWIO
                _set(params, path + ['kernel'],
                     val.transpose(2, 3, 4, 1, 0))
            elif val.ndim == 4:  # conv OIHW -> HWIO
                _set(params, path + ['kernel'], val.transpose(2, 3, 1, 0))
            elif val.ndim == 2:  # linear (O,I) -> (I,O)
                _set(params, path + ['kernel'], val.transpose(1, 0))
            elif val.ndim == 1 and key.rsplit('.', 1)[0] in norm_modules:
                _set(params, path + ['scale'], val)  # BatchNorm gamma
            else:
                # 1-D non-norm weight: PReLU alpha etc. keeps torch name
                _set(params, path + ['weight'], val)
            continue
        _set(params, path + [leaf], val)

    out = {'params': params}
    if batch_stats:
        out['batch_stats'] = batch_stats
    if spectral:
        out['spectral'] = spectral
    return out


def _split_key(key):
    """Split a torch key into flax path components, merging numeric
    Sequential indices into their parent: ``body.0.conv1.weight`` ->
    ``['body.0', 'conv1', 'weight']`` (our flax modules name list children
    ``parent.i``)."""
    import re
    out = []
    for part in key.split('.'):
        # numeric Sequential indices and the pyramid-level ModuleDict keys
        # ('l1'..'l3', used by EDVR's PCDAlignment) merge into the parent
        if out and (part.isdigit() or re.fullmatch(r'l[0-9]', part)
                    or re.fullmatch(r'noise[0-9]+', part)
                    # BasicVSR++ ModuleDict branches (basicvsrpp_arch.py:72)
                    or re.fullmatch(r'(backward|forward)_[12]', part)):
            out[-1] = f'{out[-1]}.{part}'
        else:
            out.append(part)
    return out


def _set(tree, path, val):
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    node[path[-1]] = val


def _flatten(tree):
    """Nested dict -> {dotted_key: np.ndarray}."""
    flat = {}

    def walk(node, prefix):
        for k, v in node.items():
            p = f'{prefix}.{k}' if prefix else k
            if isinstance(v, dict):
                walk(v, p)
            else:
                flat[p] = np.asarray(v)

    walk(tree, '')
    return flat


def flax_to_torch(params, batch_stats=None, spectral=None):
    """Inverse conversion for saving reference-compatible .pth files.

    spectral: the 'spectral' collection of SN layers (u/v power-iteration
    buffers); their modules save kernel as ``.weight_orig`` plus
    ``.weight_u``/``.weight_v``, matching torch.nn.utils.spectral_norm's
    state-dict layout (the forward mapping at torch_to_flax above).
    """
    sn_flat = _flatten(spectral) if spectral else {}
    # modules whose kernel must save as weight_orig
    sn_modules = {k.rsplit('.', 1)[0] for k in sn_flat}
    out = {}
    for key, val in _flatten(params).items():
        parts = key.split('.')
        leaf = parts[-1]
        base = '.'.join(parts[:-1])
        if leaf == 'kernel':
            name = 'weight_orig' if base in sn_modules else 'weight'
            if val.ndim == 5:
                out[f'{base}.{name}'] = val.transpose(4, 3, 0, 1, 2)
            elif val.ndim == 4:
                out[f'{base}.{name}'] = val.transpose(3, 2, 0, 1)
            else:
                out[f'{base}.{name}'] = val.transpose(1, 0)
        elif leaf == 'scale':
            out[f'{base}.weight'] = val
        else:
            out[f'{base}.{leaf}'] = val
    for key, val in sn_flat.items():
        parts = key.split('.')
        leaf = parts[-1]  # 'u' | 'v'
        base = '.'.join(parts[:-1])
        out[f'{base}.weight_{leaf}'] = val
    if batch_stats:
        for key, val in _flatten(batch_stats).items():
            parts = key.split('.')
            leaf = parts[-1]
            base = '.'.join(parts[:-1])
            if leaf == 'mean':
                out[f'{base}.running_mean'] = val
            elif leaf == 'var':
                out[f'{base}.running_var'] = val
    return out


def save_torch_checkpoint(path, params, batch_stats=None,
                          param_key='params', spectral=None):
    """Write a reference-format .pth via torch.save."""
    import torch
    sd = {k: torch.from_numpy(np.ascontiguousarray(v))
          for k, v in flax_to_torch(params, batch_stats,
                                    spectral=spectral).items()}
    torch.save({param_key: sd}, path)
