"""Sharded patch matching == unsharded matching on an 8-device mesh."""
import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental.shard_map import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from mrefsr_tpu.ops import feature_match_index
from mrefsr_tpu.ops.correlation import feature_match_index_sharded


def test_sharded_matching_matches_unsharded():
    n_dev = jax.device_count()
    assert n_dev == 8
    rng = np.random.RandomState(0)
    c, h, w = 8, 18, 16      # ref rows split 8 x hs
    hs = 16 // 8
    feat_in = rng.rand(h, w, c).astype(np.float32)
    feat_ref = rng.rand(16 + 2, w, c).astype(np.float32)

    idx_ref, val_ref = feature_match_index(
        jnp.asarray(feat_in), jnp.asarray(feat_ref), patch_size=3,
        is_norm=True, norm_input=True, chunk=64)

    # shard ref rows with a 2-row halo so every 3x3 patch is covered:
    # device d owns patch rows [d*hs, (d+1)*hs) -> needs image rows
    # [d*hs, d*hs + hs + 2)
    mesh = Mesh(np.array(jax.devices()), ('sp',))
    shards = np.stack([feat_ref[d * hs:d * hs + hs + 2]
                       for d in range(n_dev)])  # (8, hs+2, w, c)
    offsets = np.arange(n_dev, dtype=np.int32) * hs

    def fn(fi, shard, off):
        gi, gv = feature_match_index_sharded(
            fi, (shard[0], off[0]), 'sp', patch_size=3, is_norm=True,
            norm_input=True, chunk=64)
        return gi[None], gv[None]

    sharded = shard_map(
        fn, mesh=mesh,
        in_specs=(P(), P('sp'), P('sp')),
        out_specs=(P('sp'), P('sp')),
        check_rep=False)
    gi, gv = sharded(jnp.asarray(feat_in), jnp.asarray(shards),
                     jnp.asarray(offsets))
    # every device holds the same fused answer
    gi = np.asarray(gi)
    gv = np.asarray(gv)
    for d in range(n_dev):
        np.testing.assert_allclose(gv[d], np.asarray(val_ref), rtol=1e-5)
        np.testing.assert_array_equal(gi[d], np.asarray(idx_ref))


def test_sharded_matching_ref_stride_2():
    """Regression: the global index fuse added row_offset in IMAGE rows
    without dividing by ref_stride, so strided matching returned wrong
    global patch indices on every shard but the first."""
    n_dev = jax.device_count()
    assert n_dev == 8
    rng = np.random.RandomState(1)
    c, h, w = 4, 12, 12
    hs = 4                      # image rows owned per device
    feat_in = rng.rand(h, w, c).astype(np.float32)
    # 8*4 + 2 halo rows -> global strided patch grid tiles exactly:
    # (34-3)//2+1 = 16 rows = 8 devices x 2 local rows
    feat_ref = rng.rand(8 * hs + 2, w, c).astype(np.float32)

    idx_ref, val_ref = feature_match_index(
        jnp.asarray(feat_in), jnp.asarray(feat_ref), patch_size=3,
        ref_stride=2, is_norm=True, norm_input=True, chunk=64)

    mesh = Mesh(np.array(jax.devices()), ('sp',))
    shards = np.stack([feat_ref[d * hs:d * hs + hs + 2]
                       for d in range(n_dev)])
    offsets = np.arange(n_dev, dtype=np.int32) * hs  # multiples of 2

    def fn(fi, shard, off):
        gi, gv = feature_match_index_sharded(
            fi, (shard[0], off[0]), 'sp', patch_size=3, ref_stride=2,
            is_norm=True, norm_input=True, chunk=64)
        return gi[None], gv[None]

    gi, gv = shard_map(fn, mesh=mesh,
                       in_specs=(P(), P('sp'), P('sp')),
                       out_specs=(P('sp'), P('sp')),
                       check_rep=False)(
        jnp.asarray(feat_in), jnp.asarray(shards), jnp.asarray(offsets))
    for d in range(n_dev):
        np.testing.assert_allclose(np.asarray(gv)[d], np.asarray(val_ref),
                                   rtol=1e-5)
        np.testing.assert_array_equal(np.asarray(gi)[d],
                                      np.asarray(idx_ref))
