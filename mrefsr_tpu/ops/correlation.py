"""Dense LR<->ref patch correlation with running top-1 matching.

TPU-native rebuild of the reference's hot kernel
(basicsr/archs/ref_map_util.py:26-86): the reference unfolds the ref
feature into 3x3 patches and runs chunked F.conv2d correlations with a
running max merge. Here both sides are unfolded to patch matrices and the
correlation is one (HW, 9C) x (9C, HW_ref) matmul on the MXU, tiled over
ref patches with an online running max/argmax (flash-attention-style) so
the full score matrix never materializes in HBM.

Layout: features are (H, W, C) single-sample arrays (vmap for batch).
"""
from functools import partial

import jax
import jax.numpy as jnp
from jax import lax


def sample_patches(feat, patch_size=3, stride=1):
    """Extract sliding patches row-major.

    feat: (H, W, C) -> (n_patches, patch_size*patch_size*C) where patch
    element order is (i, j, c) — any consistent order works since both
    sides use the same one (reference ref_map_util.py:4-23 uses (c,i,j)).
    """
    h, w, c = feat.shape
    ph = (h - patch_size) // stride + 1
    pw = (w - patch_size) // stride + 1
    slices = []
    for i in range(patch_size):
        for j in range(patch_size):
            slices.append(
                lax.slice(feat, (i, j, 0),
                          (i + (ph - 1) * stride + 1,
                           j + (pw - 1) * stride + 1, c),
                          (stride, stride, 1)))
    patches = jnp.stack(slices, axis=2)  # (ph, pw, k, c)
    return patches.reshape(ph * pw, patch_size * patch_size * c)


@partial(jax.jit, static_argnames=('patch_size', 'input_stride',
                                  'ref_stride', 'is_norm', 'norm_input',
                                  'chunk'))
def feature_match_index(feat_input, feat_ref, patch_size=3, input_stride=1,
                        ref_stride=1, is_norm=True, norm_input=False,
                        chunk=2048):
    """Top-1 patch matching between input and reference features.

    Args:
        feat_input, feat_ref: (H, W, C) float arrays (callers pre-normalize
            per-position channel vectors, as the reference does at
            corres_generation_arch.py:57-59).
        is_norm: L2-normalize each ref patch before correlation (affects
            the argmax; reference ref_map_util.py:62-63).
        norm_input: divide the max correlation by the input patch norm
            (affects only max_val; reference ref_map_util.py:78-84).
        chunk: ref-patch tile size for the online max (static).

    Returns:
        max_idx: (ph, pw) int32 row-major index into ref patch grid.
        max_val: (ph, pw) float32 best correlation score.
    """
    h, w, c = feat_input.shape
    pin = sample_patches(feat_input, patch_size, input_stride)  # (Nin, D)
    pref = sample_patches(feat_ref, patch_size, ref_stride)  # (Nref, D)
    n_in, d = pin.shape
    n_ref = pref.shape[0]

    if is_norm:
        norms = jnp.linalg.norm(pref, axis=1, keepdims=True) + 1e-5
        pref = pref / norms

    # pad ref patches to a multiple of chunk; padded rows are zero so their
    # scores are 0 — mask them to -inf via the validity mask.
    n_pad = (-n_ref) % chunk
    pref_p = jnp.pad(pref, ((0, n_pad), (0, 0)))
    n_tiles = (n_ref + n_pad) // chunk
    pref_t = pref_p.reshape(n_tiles, chunk, d)
    valid_t = (jnp.arange(n_tiles * chunk).reshape(n_tiles, chunk) < n_ref)

    def body(carry, tile):
        best_val, best_idx = carry
        pref_c, valid, base = tile
        scores = jnp.dot(pin, pref_c.T,
                         preferred_element_type=jnp.float32)  # (Nin, chunk)
        scores = jnp.where(valid[None, :], scores, -jnp.inf)
        val_c = jnp.max(scores, axis=1)
        idx_c = jnp.argmax(scores, axis=1).astype(jnp.int32) + base
        take = val_c > best_val
        return (jnp.where(take, val_c, best_val),
                jnp.where(take, idx_c, best_idx)), None

    init = (jnp.full((n_in,), -jnp.inf, jnp.float32),
            jnp.zeros((n_in,), jnp.int32))
    bases = jnp.arange(n_tiles, dtype=jnp.int32) * chunk
    (max_val, max_idx), _ = lax.scan(body, init, (pref_t, valid_t, bases))

    ph = (h - patch_size) // input_stride + 1
    pw = (w - patch_size) // input_stride + 1
    if norm_input:
        in_norms = jnp.linalg.norm(pin, axis=1) + 1e-5
        max_val = max_val / in_norms
    return max_idx.reshape(ph, pw), max_val.reshape(ph, pw)


def index_to_flow(max_idx):
    """Convert a row-major match-index map to a flow field.

    Reference corres_generation_arch.py:30-47: flow = matched position -
    own position, last dim (x, y); the result is zero-padded by 2 on the
    bottom/right so it covers the full feature map (the patch grid is 2
    smaller than the feature map for 3x3 patches).

    max_idx: (h, w) int -> flow: (h+2, w+2, 2) float32.
    """
    h, w = max_idx.shape
    flow_w = (max_idx % w).astype(jnp.float32)
    flow_h = (max_idx // w).astype(jnp.float32)
    grid_y, grid_x = jnp.meshgrid(jnp.arange(h, dtype=jnp.float32),
                                  jnp.arange(w, dtype=jnp.float32),
                                  indexing='ij')
    flow = jnp.stack([flow_w - grid_x, flow_h - grid_y], axis=-1)
    return jnp.pad(flow, ((0, 2), (0, 2), (0, 0)))


def tensor_shift(x, shift=(2, 2), fill_val=0.):
    """Shift a (h, w, c) array down/right by (shift_h, shift_w), filling
    vacated area (reference arch_util.py:386-411, without the batch dim).
    """
    h, w, _ = x.shape
    sh, sw = shift
    if sh == 0 and sw == 0:
        return x
    x = jnp.pad(x, ((sh, 0), (sw, 0), (0, 0)),
                constant_values=fill_val)
    return x[:h, :w]


def feature_match_index_sharded(feat_input, feat_ref_shard, axis_name,
                                patch_size=3, input_stride=1, ref_stride=1,
                                is_norm=True, norm_input=False, chunk=2048):
    """Reference-patch-sharded top-1 matching for images that outgrow one
    chip — the spatial analog of sequence parallelism (SURVEY §5: shard
    the ref-patch axis across ICI and combine with a collective max).

    Call inside shard_map with ``feat_ref_shard`` split along H over the
    mesh axis: each device matches against its local row band, then the
    global best fuses with pmax (ties resolve to the lowest global patch
    index, matching single-device argmax).

    feat_ref_shard must carry ``ref_base``: pass a tuple
    (shard (Hs, W, C), row_offset int) where row_offset is the shard's
    first row in the full ref image. Shards MUST overlap by a
    (patch_size - 1)-row halo (shard d covers full-image rows
    [d*Hs, d*Hs + Hs + patch_size - 1)) — with disjoint bands the
    patches straddling each boundary belong to no shard and
    boundary-straddling matches are silently lost. row_offset must be a
    multiple of ref_stride so the local patch grid embeds in the global
    one.
    """
    shard, row_offset = feat_ref_shard
    local_idx, local_val = feature_match_index(
        feat_input, shard, patch_size=patch_size,
        input_stride=input_stride, ref_stride=ref_stride, is_norm=is_norm,
        norm_input=norm_input, chunk=chunk)
    # local patch grid -> global row-major index over the FULL ref grid
    # (row_offset is in IMAGE rows; the patch grid is strided)
    hs, w, _ = shard.shape
    pw_local = (w - patch_size) // ref_stride + 1
    local_rows = local_idx // pw_local
    local_cols = local_idx % pw_local
    global_idx = (local_rows + row_offset // ref_stride) * pw_local \
        + local_cols

    global_val = jax.lax.pmax(local_val, axis_name)
    big = jnp.iinfo(jnp.int32).max
    cand = jnp.where(local_val >= global_val, global_idx, big)
    global_idx = jax.lax.pmin(cand, axis_name)
    return global_idx, global_val
