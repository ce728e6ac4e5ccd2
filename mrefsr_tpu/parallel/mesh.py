"""Device-mesh utilities: the TPU-native replacement for the reference's
DDP/NCCL layer (reference basicsr/utils/dist_util.py + base_model
DistributedDataParallel wrapping at base_model.py:87-104).

Data parallelism = a 1-D ``data`` mesh over all addressable devices:
batches are sharded over the axis, params replicated, and XLA inserts the
gradient all-reduce over ICI inside the jitted train step. No explicit
collectives or process groups in user code.
"""
import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

_mesh = None


def get_data_mesh(num_devices=None):
    """1-D data-parallel mesh (cached by size).

    num_devices=None means ALL addressable devices — a previously cached
    truncated mesh (e.g. a model built with num_gpu < device count) is
    NOT returned for a default request; the cache rebuilds whenever the
    requested size differs. Models keep their own ``self.mesh`` handle,
    so a rebuild never changes an existing model's sharding."""
    global _mesh
    devices = jax.devices()
    nproc = jax.process_count()
    # falsy (None / 0 / 'auto'-resolved absent) means ALL devices — an
    # empty mesh is never meaningful
    if not num_devices:
        want = len(devices)
    elif nproc > 1:
        # multi-process: ``num_gpu`` counts chips PER PROCESS (the
        # yml's "chips of the local mesh" semantics) and the global
        # mesh must span every process's chips — truncating the global
        # device list would leave some process with no addressable
        # shard (make_array_from_process_local_data then fails)
        if int(num_devices) != jax.local_device_count():
            raise ValueError(
                f'num_gpu={num_devices} != local device count '
                f'{jax.local_device_count()} in a {nproc}-process run; '
                'per-process mesh truncation is not supported — set '
                'num_gpu to the per-process chip count (or omit it)')
        want = len(devices)
    else:
        want = min(int(num_devices), len(devices))
    if _mesh is None or _mesh.devices.size != want:
        _mesh = Mesh(np.array(devices[:want]), ('data',))
    return _mesh


def batch_sharding(mesh=None):
    mesh = mesh or get_data_mesh()
    return NamedSharding(mesh, P('data'))


def replicate_sharding(mesh=None):
    mesh = mesh or get_data_mesh()
    return NamedSharding(mesh, P())


def put_sharded(x, sharding):
    """Place one host-local batch array onto a (possibly multi-host)
    sharding.

    Single-process: plain ``jax.device_put`` (async H2D, overlaps with
    compute). Multi-process: each host contributes its process-local
    rows via ``jax.make_array_from_process_local_data`` — the TPU-native
    equivalent of DDP's per-rank batches (each reference rank feeds its
    own sampler shard, reference data_sampler.py:39); a plain
    ``device_put`` would require every host to hold the *global* batch
    and raises when the per-host values differ.
    """
    if x is None:
        return None
    if jax.process_count() > 1:
        return jax.make_array_from_process_local_data(
            sharding, np.asarray(x))
    return jax.device_put(x, sharding)


def shard_batch(batch, mesh=None):
    """Place a pytree of host arrays with the batch axis sharded over the
    mesh; non-array leaves pass through."""
    sharding = batch_sharding(mesh)

    def put(x):
        if hasattr(x, 'shape') and getattr(x, 'ndim', 0) >= 1:
            return put_sharded(x, sharding)
        return x

    return jax.tree_util.tree_map(put, batch)


def replicate(tree, mesh=None):
    """Replicate a pytree (params/opt state) across the mesh."""
    sharding = replicate_sharding(mesh)
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sharding) if hasattr(x, 'shape')
        else x, tree)
