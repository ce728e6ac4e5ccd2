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


def dcn_to_flow_state_dict(sd, deform_groups=8, kernel_size=3):
    """Warm-start a flow-alignment (FlowAgg) checkpoint from a
    DCN-alignment (DynAgg) one, in the reference torch key layout.

    Basis: the correspondence pre-offsets are tap-shifted copies of ONE
    flow field (corres_generation_arch.py:28-36; reference
    corres_generation_arch.py:73-78), so a DynAgg whose learned offset
    residual is zero is EXACTLY a 3x3 conv over the flow-warped ref
    (sample position p + k_t + flow = warp position of p + k_t when the
    flow is locally constant) — which is FlowAgg's structure. The
    mapping therefore:

      * ``conv_flow_gate`` flow rows <- ``conv_offset_mask``'s
        center-tap (t=4) offset rows per deform group (the center-tap
        learned residual transfers to the flow residual);
      * gate rows <- zero (gate == sigmoid(0) = 0.5), and the per-tap
        mask-at-bias folds into the conv:
        ``conv_after_warp.weight[o, ci, ky, kx] =
        dyn.weight[...] * 2 * sigmoid(mask_bias[g, t])`` with
        g = ci // cg, t = ky*K + kx (2x compensates the 0.5 gate);
      * ``conv_after_warp.bias`` <- DynAgg bias;
      * every other tensor passes through, ``*_dyn_agg`` keys renamed
        ``*_flow_agg``.

    Dropped (the expressivity delta between the parameterizations —
    refine with fine-tuning): non-center-tap offset residuals, and the
    feature-DEPENDENT part of the mask (only its bias is folded).

    Exact for INTERIOR pixels when the learned offset residual is zero
    and the flow is constant; at the zero-init state
    (re_init_dcn_offset semantics, reference
    ref_mrapa_restoration_arch.py:114-121) both conditions hold up to
    flow smoothness. The image border band (1 px plus the flow's
    reach) differs by construction: DynAgg bilinear-samples x directly
    at p + tap + flow (in-bounds even when p + tap alone is off-grid),
    while the converted FlowAgg warps first and then zero-pads the
    3x3 conv over the warped grid, so off-grid taps read 0 instead of
    the flow-displaced sample. Fine-tuning absorbs the band quickly
    (measured warm-start cost -0.057 dB full-image). Tested — with the
    interior/border split asserted at module level — in
    tests/test_utils/test_dcn_to_flow.py.

    Args:
        sd: reference-layout state dict (torch tensors or numpy),
            containing ``<base>_dyn_agg.{weight,bias,
            conv_offset_mask.weight,conv_offset_mask.bias}`` groups.
    Returns:
        New dict of the same value type, FlowAgg-layout keys.
    """
    import numpy as _np
    k2 = kernel_size * kernel_size
    dg = deform_groups
    center = (kernel_size // 2) * kernel_size + kernel_size // 2

    def _np_of(v):
        return v.detach().cpu().numpy() if hasattr(v, 'detach') else \
            _np.asarray(v)

    def _like(arr, ref_val):
        if hasattr(ref_val, 'detach'):
            import torch
            return torch.from_numpy(_np.ascontiguousarray(arr))
        return arr

    bases = sorted({key[:-len('.conv_offset_mask.weight')]
                    for key in sd
                    if key.endswith('_dyn_agg.conv_offset_mask.weight')})
    out = {}
    converted = set()
    for base in bases:
        w_om = _np_of(sd[f'{base}.conv_offset_mask.weight'])
        b_om = _np_of(sd[f'{base}.conv_offset_mask.bias'])
        w_dyn = _np_of(sd[f'{base}.weight'])
        b_dyn = _np_of(sd[f'{base}.bias'])
        assert w_om.shape[0] == 3 * dg * k2, (
            f'{base}: conv_offset_mask out={w_om.shape[0]} != '
            f'3*dg*K={3 * dg * k2}')
        cin = w_dyn.shape[1]
        assert cin % dg == 0
        cg = cin // dg

        # flow/gate head: (dg*3) out rows
        w_fg = _np.zeros((dg * 3,) + w_om.shape[1:], w_om.dtype)
        b_fg = _np.zeros((dg * 3,), b_om.dtype)
        for g in range(dg):
            for j in range(2):  # (dy, dx)
                src = g * 2 * k2 + 2 * center + j
                w_fg[2 * g + j] = w_om[src]
                b_fg[2 * g + j] = b_om[src]
        # gate rows stay zero: gate == 0.5 everywhere

        # fold sigmoid(mask bias) per (group, tap) into the conv
        mask_bias = b_om[2 * dg * k2:].reshape(dg, k2)
        m_hat = 1.0 / (1.0 + _np.exp(-mask_bias))  # (dg, K)
        scale = _np.repeat(2.0 * m_hat, cg, axis=0)  # (cin, K)
        scale = scale.reshape(cin, kernel_size, kernel_size)
        w_cv = (w_dyn * scale[None]).astype(w_dyn.dtype)

        flow_base = base.replace('_dyn_agg', '_flow_agg')
        ref_val = sd[f'{base}.weight']
        out[f'{flow_base}.conv_flow_gate.weight'] = _like(w_fg, ref_val)
        out[f'{flow_base}.conv_flow_gate.bias'] = _like(b_fg, ref_val)
        out[f'{flow_base}.conv_after_warp.weight'] = _like(w_cv, ref_val)
        out[f'{flow_base}.conv_after_warp.bias'] = _like(
            b_dyn.copy(), ref_val)
        converted.update({f'{base}.conv_offset_mask.weight',
                          f'{base}.conv_offset_mask.bias',
                          f'{base}.weight', f'{base}.bias'})

    for key, val in sd.items():
        if key not in converted:
            assert '_dyn_agg' not in key, f'unmapped DynAgg key {key}'
            out[key] = val
    return out
