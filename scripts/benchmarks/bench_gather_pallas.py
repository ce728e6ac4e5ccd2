"""Can a Pallas kernel beat XLA's row-gather rate at the DCN shapes?

Experiment at the relu1_1 slab scale: table (161*161, 32) bf16 resident
in VMEM, 230400 row indices per (item, group) slab. Variants:
  A: XLA jnp.take per slab under scan (the current ops/dcn.py form)
  B: pallas kernel, grid over index chunks, jnp.take inside (Mosaic
     dynamic_gather)
If B does not clearly exceed A, XLA's gather is already at the
hardware row rate and a custom DCN kernel is not worth the complexity.

Usage: PYTHONPATH=/root/.axon_site:. python scripts/benchmarks/bench_gather_pallas.py
"""
import sys
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, 'scripts/benchmarks')
from tpu_timer import dep_carry, scan_time  # noqa: E402

P = 161 * 161          # table rows per slab
W = 32                 # row width (4*cg at relu1_1)
M = 160 * 160 * 9      # gathered rows per slab (taps folded in)
SLABS = 8              # (item, group) slabs scanned (subset of 4*8)
CHUNK = 28800          # index rows per pallas grid step


def xla_take(idx, tables):
    def body(_, xs):
        tab, ix = xs
        return None, jnp.take(tab, ix, axis=0)
    _, out = jax.lax.scan(body, None, (tables, idx))
    return out


def gather_kernel(idx_ref, tab_ref, out_ref):
    out_ref[:] = jnp.take(tab_ref[:], idx_ref[:], axis=0)


@jax.jit
def pallas_take(idx, tables):
    grid = (SLABS, M // CHUNK)
    return pl.pallas_call(
        gather_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, CHUNK), lambda s, c: (s, c),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, P, W), lambda s, c: (s, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, CHUNK, W), lambda s, c: (s, c, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((SLABS, M, W), tables.dtype),
    )(idx, tables)


def gather_kernel_flat(idx_ref, tab_ref, out_ref):
    out_ref[:] = jnp.take(tab_ref[:], idx_ref[0], axis=0)


@jax.jit
def pallas_take_flat(idx, tables):
    """2-D refs inside the kernel (drop the leading slab dim)."""
    grid = (SLABS, M // CHUNK)
    return pl.pallas_call(
        gather_kernel_flat,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, CHUNK), lambda s, c: (s, c),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((P, W), lambda s, c: (s * P, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((CHUNK, W), lambda s, c: (s * M + c * CHUNK,
                                                         0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((SLABS * M, W), tables.dtype),
    )(idx, tables.reshape(SLABS * P, W))


def bench(name, fn, idx, tables):
    def step(ix, tab):
        out = fn(ix, tab)
        return dep_carry(out, ix), out[..., :1]

    dt = scan_time(step, idx, tables, n=6)
    rows = SLABS * M
    print(f'{name:28s} {dt*1e3:8.2f} ms  {rows/dt/1e6:7.1f} Mrow/s',
          flush=True)


def main():
    rng = np.random.RandomState(0)
    tables = jnp.asarray(rng.rand(SLABS, P, W), jnp.bfloat16)
    idx = jnp.asarray(rng.randint(0, P, (SLABS, M)), jnp.int32)

    bench('A xla take per slab (scan)', jax.jit(xla_take), idx, tables)
    for name, fn in [('B pallas take 3d', pallas_take),
                     ('C pallas take flat', pallas_take_flat)]:
        try:
            bench(name, fn, idx, tables)
        except Exception as e:  # noqa: BLE001 — experiment harness
            print(f'{name:28s} FAILED: {type(e).__name__}: '
                  f'{str(e).splitlines()[0][:120]}', flush=True)


if __name__ == '__main__':
    main()
