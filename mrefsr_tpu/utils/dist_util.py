"""Multi-host/process helpers on top of jax.distributed.

TPU-native replacement for the reference's torch.distributed/NCCL layer
(reference: basicsr/utils/dist_util.py). There is no explicit backend or
process-group: ``jax.distributed.initialize()`` wires the hosts, chips talk
over ICI via XLA collectives inside jitted computations, and host-side
rank logic uses ``jax.process_index()``.
"""
import functools
import os

_initialized = False


def init_dist(launcher=None, backend=None, **kwargs):
    """Initialize the multi-host JAX runtime (idempotent).

    ``launcher``/``backend`` args are accepted for YAML compatibility with
    the reference (`--launcher pytorch|slurm`, `dist_params.backend: nccl`)
    but only influence whether initialization is attempted: ``none`` skips.
    """
    global _initialized
    if _initialized or launcher in (None, 'none'):
        return
    import jax
    # check the env var BEFORE touching any jax API: jax.process_count()
    # initializes the backend, after which jax.distributed.initialize()
    # raises and every host would silently fall back to rank 0
    if os.environ.get('JAX_COORDINATOR_ADDRESS'):
        # env-rank launch contract (the analog of the reference's
        # _init_dist_pytorch reading RANK/WORLD_SIZE set by
        # torch.distributed.launch, reference dist_util.py:21-25):
        # jax reads JAX_COORDINATOR_ADDRESS itself but leaves process
        # topology to cluster auto-detection, which generic launchers
        # don't provide — honor the matching env vars here.
        for key, env in (('num_processes', 'JAX_NUM_PROCESSES'),
                         ('process_id', 'JAX_PROCESS_ID')):
            if key not in kwargs and os.environ.get(env):
                kwargs[key] = int(os.environ[env])
        jax.distributed.initialize(**kwargs)
    elif jax.process_count() > 1:
        try:
            jax.distributed.initialize(**kwargs)
        except (RuntimeError, ValueError):
            pass  # already initialized (e.g. by the TPU runtime)
    _initialized = True


def get_dist_info():
    """Return (rank, world_size) at host-process granularity."""
    try:
        import jax
        return jax.process_index(), jax.process_count()
    except Exception:
        return 0, 1


def get_rank():
    return get_dist_info()[0]


def get_world_size():
    return get_dist_info()[1]


def master_only(func):
    """Run the wrapped function only on host process 0."""

    @functools.wraps(func)
    def wrapper(*args, **kwargs):
        rank, _ = get_dist_info()
        if rank == 0:
            return func(*args, **kwargs)

    return wrapper
